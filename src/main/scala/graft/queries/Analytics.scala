package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's BI semantic layer (FormulaePowerBI.txt:1-47, SURVEY.md
  * §2.5 A9-A12) and validation suite (§3.3 A13) re-expressed on the
  * testdata star schema: customer ↔ employee, orders ↔ activities,
  * c_acctbal ↔ salary. */
object Analytics {

  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)
  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)

  /** A9: DAX SUMMARIZE — per (customer, segment) order counts. */
  val summarize: GQuery = GQuery(
    "x1_dax_summarize",
    (s, d) =>
      ord(s, d)
        .join(broadcast(cust(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("TotalLineCount"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_mktsegment, count(*) AS TotalLineCount
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey"""))

  /** A10+A11: per-entity scalar (CALCULATE SUM) + qualification flags. */
  val qualification: GQuery = GQuery(
    "x2_dax_qualification",
    (s, d) =>
      ord(s, d)
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          Exact.moneySum(col("o_totalprice")).as("spent"))
        .join(broadcast(cust(s, d)), Seq("c_custkey"))
        .withColumn("QualifyVolume", col("n_orders") > 5)
        .withColumn("QualifySegment",
          lower(trim(col("c_mktsegment"))).isin("automobile", "machinery"))
        .select(col("c_custkey"), col("n_orders"), col("spent"),
          col("QualifyVolume"), col("QualifySegment"))
        .orderBy(col("c_custkey")),
    Some(s"""SELECT t.c_custkey, t.n_orders, t.spent,
              t.n_orders > 5 AS QualifyVolume,
              lower(trim(c_mktsegment)) IN ('automobile', 'machinery')
                AS QualifySegment
            FROM (SELECT o_custkey AS c_custkey, count(*) AS n_orders,
                    ${Exact.moneySumSql("o_totalprice")} AS spent
                  FROM orders GROUP BY o_custkey) t
            JOIN customer ON t.c_custkey = customer.c_custkey
            ORDER BY t.c_custkey"""))

  /** A12: the three SUMX measures over the qualification table
    * (constant-per-qualifier, balance-proportional, percentage bonus). */
  val sumxMeasures: GQuery = GQuery(
    "x3_dax_sumx_measures",
    (s, d) => {
      val q = ord(s, d)
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .join(broadcast(cust(s, d)), Seq("c_custkey"))
        .withColumn("qv", col("n_orders") > 5)
        .withColumn("qs",
          lower(trim(col("c_mktsegment"))).isin("automobile", "machinery"))
        .withColumn("acct_cents", Exact.cents(col("c_acctbal")))
      // integer-cents hardening (round-1 x3 hash fail was exactly this
      // boundary class): equiv = Σ acct·5/251 → exact rational p/25100
      // dollars; bonus = Σ acct·0.05 → p/10000. Sum exact BIGINT
      // numerators, round once with integer arithmetic at the end.
      q.agg(
        sum(when(col("qv"), lit(5L)).otherwise(0L)).as("total_points"),
        sum(when(col("qv"), col("acct_cents") * 5).otherwise(0L)).as("equiv_p"),
        sum(when(col("qs"), col("acct_cents") * 5).otherwise(0L)).as("bonus_p"))
        .select(
          col("total_points"),
          (Exact.roundDiv(col("equiv_p"), lit(251L)) / 100.0).as("total_equiv"),
          (Exact.roundDiv(col("bonus_p"), lit(100L)) / 100.0).as("total_bonus"))
    },
    Some(s"""WITH q AS (
              SELECT t.c_custkey, t.n_orders > 5 AS qv,
                lower(trim(c_mktsegment)) IN ('automobile','machinery') AS qs,
                ${Exact.centsSql("c_acctbal")} AS acct_cents
              FROM (SELECT o_custkey AS c_custkey, count(*) AS n_orders
                    FROM orders GROUP BY o_custkey) t
              JOIN customer ON t.c_custkey = customer.c_custkey),
            s AS (SELECT
              CAST(sum(CASE WHEN qv THEN 5 ELSE 0 END) AS BIGINT) AS total_points,
              CAST(sum(CASE WHEN qv THEN acct_cents * 5 ELSE 0 END) AS BIGINT) AS equiv_p,
              CAST(sum(CASE WHEN qs THEN acct_cents * 5 ELSE 0 END) AS BIGINT) AS bonus_p
              FROM q)
            SELECT total_points,
              ${Exact.roundDivSql("equiv_p", "251")} / 100.0 AS total_equiv,
              ${Exact.roundDivSql("bonus_p", "100")} / 100.0 AS total_bonus
            FROM s"""))

  /** A13: validation report — one pass, three rules, offending ids
    * (exploded to (rule, id) rows for stable comparison). Rules mirror
    * sport_benefits.py: future date / negative quantity-ish / per-type
    * range violation. */
  val validationReport: GQuery = GQuery(
    "x4_validation_report",
    (s, d) => {
      // union of pushdown-able filters: each branch's predicate reaches
      // the parquet scan (vs explode-over-flags, which reads every row)
      def rule(pred: org.apache.spark.sql.Column, name: String) =
        li(s, d).filter(pred).select(col("l_orderkey"), col("l_linenumber"),
          lit(name).as("rule"))
      rule(col("l_shipdate") > lit("1998-10-01").cast("timestamp"),
        "future_dates")
        .unionByName(rule(
          col("l_discount") > 0.08 && col("l_quantity") < 3,
          "suspect_discount"))
        .unionByName(rule(
          col("l_returnflag") === "R" && col("l_quantity") > 45,
          "range_violation"))
        .orderBy(col("rule"), col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_orderkey, l_linenumber, rule FROM (
              SELECT l_orderkey, l_linenumber, 'future_dates' AS rule
              FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-10-01 00:00:00'
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'suspect_discount'
              FROM lineitem WHERE l_discount > 0.08 AND l_quantity < 3
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'range_violation'
              FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 45)
            ORDER BY rule, l_orderkey, l_linenumber"""))

  val all: Seq[GQuery] = Seq(summarize, qualification, sumxMeasures,
    validationReport)
}
