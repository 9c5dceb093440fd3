package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining classic TPC-H plan shapes, adapted to the testdata
  * schema (no partsupp table → Q2/Q9/Q11/Q16/Q20 substitute the
  * observed lineitem (part, supplier) relation for partsupp; lineitem
  * carries no commit/receipt dates or shipmode → Q4/Q12/Q21 run
  * adapted predicates, noted per query). Together with q1/q3/q5/
  * q10/q12/q14/q18 in [[Relational]] this closes ALL 22 decision-
  * support shapes: EXISTS semi-joins, disjunctive pushdown, correlated
  * scalar subqueries, outer-join histograms, market-share ratios,
  * per-group argmin against a restricted subrelation, share-of-total
  * HAVING, nested-aggregate dominance semi-joins.
  *
  * All money arithmetic is integer cents ([[Exact]]) so the DuckDB
  * oracle hash-compares bit-identically; every output carries an
  * ORDER BY on a unique key.
  */
object TpcH {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)
  private def supp(s: SparkSession, d: String) = Tables.supplier(s, d)
  private def part(s: SparkSession, d: String) = Tables.part(s, d)
  private def nat(s: SparkSession, d: String) = Tables.nation(s, d)

  /** rq = price_cents · (100 − discount_pct): exact revenue in 10^-4
    * dollar units (the q14 convention). */
  private def rq: org.apache.spark.sql.Column =
    Exact.cents(col("l_extendedprice")) *
      (lit(100L) - Exact.cents(col("l_discount")))
  private val rqSql: String =
    s"${Exact.centsSql("l_extendedprice")} * " +
      s"(100 - ${Exact.centsSql("l_discount")})"

  /** TPC-H Q4 (adapted: no commit/receipt dates, so "late line" means
    * shipped ≥ 30 days after the order date): priority counts of
    * quarter orders having at least one late line — the EXISTS
    * semi-join reporting shape. The semi join carries a non-equi
    * residual on top of the orderkey equi-key, so it still hash-joins
    * on the key at scale. */
  val q4OrderPriority: GQuery = GQuery(
    "q4_priority_exists",
    (s, d) => {
      val o = ord(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      o.join(li(s, d).select(col("l_orderkey"), col("l_shipdate")),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
              AND EXISTS (SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate >= o_orderdate + INTERVAL 30 DAY)
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H Q6 (forecast revenue change): the canonical full-pushdown
    * scan — every predicate reaches the parquet reader, no join, one
    * global agg. revenue = Σ price·discount, exact in 10^-4 dollars. */
  val q6Forecast: GQuery = GQuery(
    "q6_forecast_revenue",
    (s, d) =>
      li(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          Exact.cents(col("l_discount")).between(5L, 7L) &&
          col("l_quantity") < 24)
        .agg(sum(Exact.cents(col("l_extendedprice")) *
          Exact.cents(col("l_discount"))).as("rev_q"))
        .select((Exact.roundDiv(col("rev_q"), lit(100L)) / 100.0)
          .as("revenue")),
    Some(s"""SELECT ${Exact.roundDivSqlPos(
        s"sum(${Exact.centsSql("l_extendedprice")} * " +
          s"${Exact.centsSql("l_discount")})", "100")} / 100.0 AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND ${Exact.centsSql("l_discount")} BETWEEN 5 AND 7
              AND l_quantity < 24"""))

  /** TPC-H Q7 (volume shipping between two nations): the two-sided
    * dimension-restricted fact join — supplier nation × customer
    * nation in both directions, yearly revenue. Both nation legs are
    * broadcast; the lineitem⋈orders spine is the one fact shuffle. */
  val q7NationVolume: GQuery = GQuery(
    "q7_nation_volume",
    (s, d) => {
      val n1 = nat(s, d).select(col("n_nationkey").as("sk"),
        col("n_name").as("supp_nation"))
      val n2 = nat(s, d).select(col("n_nationkey").as("ck"),
        col("n_name").as("cust_nation"))
      li(s, d)
        .join(ord(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .filter((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(rq).as("rev_q"))
        .select(col("supp_nation"), col("cust_nation"), col("l_year"),
          (Exact.roundDiv(col("rev_q"), lit(100L)) / 100.0).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              CAST(year(l_shipdate) AS BIGINT) AS l_year,
              ${Exact.roundDivSqlPos(s"sum($rqSql)", "100")} / 100.0
                AS revenue
            FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** TPC-H Q8 (national market share): of the PROMO-part revenue sold
    * into ASIA customers, the per-mille share supplied from NATION_2,
    * by order year — conditional-numerator-over-total as an exact
    * integer ratio (the q14 device on a 5-table star). */
  val q8MarketShare: GQuery = GQuery(
    "q8_market_share",
    (s, d) => {
      val asiaNations = nat(s, d)
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      li(s, d)
        .join(broadcast(part(s, d).filter(col("p_type") === "PROMO")
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(ord(s, d).select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(asiaNations),
          col("c_nationkey") === col("n_nationkey"), "left_semi")
        .join(broadcast(supp(s, d)
          .select(col("s_suppkey"), col("s_nationkey").as("s_nk"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("s_nk") === 2, rq).otherwise(0L)).as("nation_q"),
          sum(rq).as("total_q"))
        .select(col("o_year"),
          Exact.roundDiv(col("nation_q") * 1000, col("total_q"))
            .as("share_permille"))
        .orderBy(col("o_year"))
    },
    Some(s"""WITH t AS (SELECT year(o_orderdate) AS o_year,
              s_nationkey, $rqSql AS rv
              FROM lineitem
                JOIN part ON l_partkey = p_partkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                JOIN supplier ON l_suppkey = s_suppkey
              WHERE p_type = 'PROMO' AND r_name = 'ASIA')
            SELECT CAST(o_year AS BIGINT) AS o_year,
              CAST(${Exact.roundDivSqlPos(
                "sum(CASE WHEN s_nationkey = 2 THEN rv ELSE 0 END) * 1000",
                "sum(rv)")} AS BIGINT) AS share_permille
            FROM t GROUP BY o_year ORDER BY o_year"""))

  /** TPC-H Q13 (customer order distribution): LEFT join so zero-order
    * customers survive with count 0, then the count-of-counts
    * histogram — the classic two-level aggregation over an outer
    * join. */
  val q13OrderDist: GQuery = GQuery(
    "q13_order_distribution",
    (s, d) =>
      cust(s, d).select(col("c_custkey"))
        .join(ord(s, d).select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
    Some("""SELECT c_count, count(*) AS custdist
            FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey) cc
            GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""))

  /** TPC-H Q15 (top supplier): quarterly per-supplier revenue, keep the
    * max-revenue supplier(s) via a broadcast scalar subquery. The max
    * compares RAW integer revenue (rounding only at output) so ties
    * and ordering are engine-exact. */
  val q15TopSupplier: GQuery = GQuery(
    "q15_top_supplier",
    (s, d) => {
      val rev = li(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(rq).as("rev_q"))
      val top = rev.agg(max(col("rev_q")).as("max_q"))
      rev.crossJoin(broadcast(top))
        .filter(col("rev_q") === col("max_q"))
        .join(broadcast(supp(s, d).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (Exact.roundDiv(col("rev_q"), lit(100L)) / 100.0)
            .as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    Some(s"""WITH rev AS (SELECT l_suppkey, sum($rqSql) AS rev_q
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
              GROUP BY l_suppkey)
            SELECT s_suppkey, s_name,
              ${Exact.roundDivSqlPos("rev_q", "100")} / 100.0
                AS total_revenue
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE rev_q = (SELECT max(rev_q) FROM rev)
            ORDER BY s_suppkey"""))

  /** TPC-H Q17 (small-quantity-order revenue, adapted: p_size < 15
    * stands in for the missing container column): lineitems under 20%
    * of their part's average quantity. The correlated AVG subquery
    * decorrelates to a per-part aggregate joined back to the fact; the
    * 20%-of-average predicate is the integer cross-multiplication
    * 5·qty·n < Σqty (no float division anywhere). */
  val q17SmallQty: GQuery = GQuery(
    "q17_small_quantity",
    (s, d) => {
      val brandParts = part(s, d)
        .filter(col("p_brand") === "Brand#23" && col("p_size") < 15)
        .select(col("p_partkey"))
      val fact = li(s, d)
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          Exact.cents(col("l_quantity")).as("qty_c"),
          Exact.cents(col("l_extendedprice")).as("price_c"))
      val perPart = fact.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("qty_c")).as("sum_qty_c"), count(lit(1)).as("n"))
      fact.join(broadcast(perPart), col("l_partkey") === col("pk"))
        .filter(col("qty_c") * 5 * col("n") < col("sum_qty_c"))
        .agg(count(lit(1)).as("n_lines"), sum(col("price_c")).as("price_q"))
        .select(col("n_lines"),
          (Exact.roundDiv(col("price_q"), lit(7L)) / 100.0)
            .as("avg_yearly"))
    },
    Some(s"""WITH f AS (SELECT l_partkey,
              ${Exact.centsSql("l_quantity")} AS qty_c,
              ${Exact.centsSql("l_extendedprice")} AS price_c
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_brand = 'Brand#23' AND p_size < 15),
            pp AS (SELECT l_partkey AS pk, sum(qty_c) AS sum_qty_c,
              count(*) AS n FROM f GROUP BY l_partkey)
            SELECT count(*) AS n_lines,
              ${Exact.roundDivSqlPos("sum(price_c)", "7")} / 100.0
                AS avg_yearly
            FROM f JOIN pp ON l_partkey = pk
            WHERE qty_c * 5 * n < sum_qty_c"""))

  /** TPC-H Q19 (discounted revenue, adapted: the shipmode/shipinstruct
    * legs don't exist, keeping the three (brand, size, quantity)
    * disjuncts): the disjunctive-predicate join — Catalyst must push
    * the OR of conjunctions into the scan and still broadcast the dim
    * side. */
  val q19Disjunctive: GQuery = GQuery(
    "q19_disjunctive",
    (s, d) =>
      li(s, d)
        .join(broadcast(part(s, d)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(count(lit(1)).as("n_lines"), sum(rq).as("rev_q"))
        .select(col("n_lines"),
          (Exact.roundDiv(col("rev_q"), lit(100L)) / 100.0).as("revenue")),
    Some(s"""SELECT count(*) AS n_lines,
              ${Exact.roundDivSqlPos(s"sum($rqSql)", "100")} / 100.0
                AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20 AND 30)"""))

  /** TPC-H Q22 (global sales opportunity, adapted: every synthetic
    * customer has SOME order, so "lapsed" means no order since
    * 2000-01-01; nation stands in for the phone country code):
    * above-average-balance customers with no recent orders, by nation.
    * The average is a broadcast scalar; the comparison cross-multiplies
    * integers (bal_c·n > Σbal_c) so no float average exists; the
    * recent-order check is a broadcast anti join. */
  val q22Opportunity: GQuery = GQuery(
    "q22_sales_opportunity",
    (s, d) => {
      val c = cust(s, d).select(col("c_custkey"), col("c_nationkey"),
        Exact.cents(col("c_acctbal")).as("bal_c"))
      val posAvg = c.filter(col("bal_c") > 0L)
        .agg(sum(col("bal_c")).as("sum_c"), count(lit(1)).as("n_pos"))
      val recent = ord(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      c.crossJoin(broadcast(posAvg))
        .filter(col("bal_c") * col("n_pos") > col("sum_c"))
        .join(broadcast(recent), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .join(broadcast(nat(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"),
          (sum(col("bal_c")) / 100.0).as("totacctbal"))
        .orderBy(col("n_name"))
    },
    Some("""WITH c AS (SELECT c_custkey, c_nationkey,
              CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
              FROM customer),
            pa AS (SELECT sum(bal_c) AS sum_c, count(*) AS n_pos
              FROM c WHERE bal_c > 0)
            SELECT n_name, count(*) AS numcust,
              sum(bal_c) / 100.0 AS totacctbal
            FROM c CROSS JOIN pa
              JOIN nation ON c_nationkey = n_nationkey
            WHERE bal_c * n_pos > sum_c
              AND NOT EXISTS (SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
            GROUP BY n_name ORDER BY n_name"""))

  /** TPC-H Q16 (adapted: supplier "complaints" stand-in is a negative
    * account balance; partsupp replaced by the lineitem supplier
    * relation): distinct-supplier counts per (brand, type, size) slice
    * with a NOT-IN exclusion — the anti-join + multi-key
    * count-distinct reporting shape. */
  val q16SupplierCount: GQuery = GQuery(
    "q16_supplier_count",
    (s, d) =>
      li(s, d).select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(part(s, d)
          .filter(col("p_brand") =!= "Brand#45" &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp(s, d).filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size")),
    Some("""SELECT p_brand, p_type, p_size,
              count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#45'
              AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
              AND l_suppkey NOT IN
                (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))

  /** TPC-H Q21 (adapted: no commit/receipt dates, so "the supplier
    * everyone waited for" is the STRICTLY-latest shipper of a
    * multi-supplier order): per supplier, the count of multi-supplier
    * orders where that supplier's last ship date is strictly after
    * every other supplier's — the double-correlated EXISTS/NOT-EXISTS
    * shape, decorrelated into keyed aggregates (per-(order, supplier)
    * max → per-order max + supplier count → unique-argmax filter), so
    * every join/agg shuffles on the order key and nothing is
    * re-scanned per supplier. */
  val q21WaitingSupplier: GQuery = GQuery(
    "q21_waiting_supplier",
    (s, d) => {
      // one lineitem pass, one wide shuffle: repartition by orderkey
      // up front — hash(l_orderkey) satisfies the (l_orderkey,
      // l_suppkey) grouping AND every per-order window below, so the
      // per-order max / supplier count / at-max count all evaluate in
      // place instead of re-shuffling (the two-aggregate + self-join
      // formulation scanned lineitem twice and shuffled five times)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey"))
      val win = li(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate")).as("smax"))
        .withColumn("omax", max(col("smax")).over(w))
        .withColumn("nsupp", count(lit(1)).over(w))
        .filter(col("smax") === col("omax") && col("nsupp") >= 2)
      win.withColumn("n_at_max", count(lit(1)).over(w))
        .filter(col("n_at_max") === 1)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(supp(s, d).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(20)
    },
    Some("""WITH po AS (SELECT l_orderkey, l_suppkey,
              max(l_shipdate) AS smax
              FROM lineitem GROUP BY l_orderkey, l_suppkey),
            om AS (SELECT l_orderkey, max(smax) AS omax,
              count(*) AS nsupp FROM po GROUP BY l_orderkey),
            win AS (SELECT p.l_orderkey, p.l_suppkey
              FROM po p JOIN om USING (l_orderkey)
              WHERE p.smax = om.omax AND om.nsupp >= 2),
            strict AS (SELECT l_orderkey FROM win
              GROUP BY l_orderkey HAVING count(*) = 1)
            SELECT s_suppkey, s_name, count(*) AS numwait
            FROM win JOIN strict USING (l_orderkey)
              JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_suppkey, s_name
            ORDER BY numwait DESC, s_suppkey LIMIT 20"""))

  /** TPC-H Q2 (min-cost supplier, adapted: partsupp is the observed
    * lineitem (part, supplier) relation and "supply cost" is the
    * cheapest line a supplier ever shipped for the part, exact in
    * cents): for size-15 parts, the EUROPE supplier(s) achieving the
    * per-part minimum cost — the correlated-min-subquery shape,
    * decorrelated into a per-part min joined back on (part, cost).
    * Both the part slice and the region-restricted supplier dim
    * broadcast; the one fact pass aggregates (part, supplier) minima
    * map-side before the keyed shuffle. */
  val q2MinCostSupplier: GQuery = GQuery(
    "q2_min_cost_supplier",
    (s, d) => {
      val euSupp = supp(s, d)
        .join(broadcast(nat(s, d)
          .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "EUROPE").select(col("r_regionkey"))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))
      val sizeParts = part(s, d).filter(col("p_size") === 15)
        .select(col("p_partkey"), col("p_name"))
      val cand = li(s, d)
        .join(broadcast(sizeParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(euSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"),
          col("s_name"), col("s_acctbal"), col("n_name"))
        .agg(min(Exact.cents(col("l_extendedprice"))).as("cost_c"))
      val mn = cand.groupBy(col("p_partkey").as("pk"))
        .agg(min(col("cost_c")).as("min_c"))
      cand.join(broadcast(mn),
          col("p_partkey") === col("pk") && col("cost_c") === col("min_c"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"),
          (col("cost_c") / 100.0).as("supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },
    Some(s"""WITH eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE'),
            cand AS (SELECT p_partkey, p_name, l_suppkey, s_name,
                s_acctbal, n_name,
                min(${Exact.centsSql("l_extendedprice")}) AS cost_c
              FROM lineitem JOIN part ON l_partkey = p_partkey
                JOIN eu ON l_suppkey = s_suppkey
              WHERE p_size = 15
              GROUP BY 1, 2, 3, 4, 5, 6),
            mn AS (SELECT p_partkey AS pk, min(cost_c) AS min_c
              FROM cand GROUP BY 1)
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
              cost_c / 100.0 AS supplycost
            FROM cand JOIN mn ON p_partkey = pk AND cost_c = min_c
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            LIMIT 100"""))

  /** TPC-H Q9 (product-type profit, adapted: 'green' parts → the
    * 'red '-prefixed name slice; no supplycost leg, so profit is
    * discounted revenue): per (supplier nation, order year) profit over
    * a 5-table star — the multi-dim fact join with a year() derived
    * grouping key. Part/supplier/nation broadcast; lineitem⋈orders is
    * the one fact shuffle. */
  val q9ProductProfit: GQuery = GQuery(
    "q9_product_profit",
    (s, d) =>
      li(s, d)
        .join(broadcast(part(s, d).filter(col("p_name").startsWith("red"))
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(ord(s, d).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(rq).as("profit_q"))
        .select(col("nation"), col("o_year"),
          (Exact.roundDiv(col("profit_q"), lit(100L)) / 100.0)
            .as("profit"))
        .orderBy(col("nation"), col("o_year").desc),
    Some(s"""SELECT n_name AS nation,
              CAST(year(o_orderdate) AS BIGINT) AS o_year,
              ${Exact.roundDivSqlPos(s"sum($rqSql)", "100")} / 100.0
                AS profit
            FROM lineitem JOIN part ON l_partkey = p_partkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE 'red%'
            GROUP BY 1, 2 ORDER BY 1, 2 DESC"""))

  /** TPC-H Q11 (important stock, adapted: "stock value" is discounted
    * revenue supplied from NATION_1): parts whose value exceeds 2× the
    * per-part average — the share-of-total HAVING shape. TPC-H scales
    * its 0.0001 fraction by 1/SF because any fixed share empties as the
    * part count grows; comparing against the average (val·n > 2·total,
    * raw integers cross-multiplied — no float fraction exists) is the
    * scale-invariant equivalent. The total is a broadcast scalar over
    * the already-aggregated per-part frame. */
  val q11ImportantStock: GQuery = GQuery(
    "q11_important_stock",
    (s, d) => {
      val natSupp = supp(s, d)
        .join(broadcast(nat(s, d).filter(col("n_name") === "NATION_1")
          .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val v = li(s, d)
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(rq).as("val_q"))
      val tot = v.agg(sum(col("val_q")).as("tot_q"), count(lit(1)).as("n"))
      v.crossJoin(broadcast(tot))
        .filter(col("val_q") * col("n") > col("tot_q") * 2)
        .select(col("l_partkey"),
          (Exact.roundDiv(col("val_q"), lit(100L)) / 100.0).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },
    Some(s"""WITH v AS (SELECT l_partkey, sum($rqSql) AS val_q
              FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_1'
              GROUP BY 1),
            tot AS (SELECT sum(val_q) AS tot_q, count(*) AS n FROM v)
            SELECT l_partkey,
              ${Exact.roundDivSqlPos("val_q", "100")} / 100.0 AS value
            FROM v CROSS JOIN tot
            WHERE val_q * n > tot_q * 2
            ORDER BY value DESC, l_partkey"""))

  /** TPC-H Q20 (potential part promotion, adapted: "excess stock" is
    * supplying MORE THAN HALF of a part's 1996 shipped quantity):
    * NATION_3 suppliers dominating at least one 'red '-part — the
    * nested-aggregate dominance semi-join (per-(part,supplier) qty vs
    * per-part total, integer-doubled, distinct suppliers, dim-filtered
    * output). The part slice broadcasts before the fact aggregation,
    * so only the red-part lineitems ever shuffle. */
  val q20PartPromotion: GQuery = GQuery(
    "q20_part_promotion",
    (s, d) => {
      val pq = li(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(broadcast(part(s, d).filter(col("p_name").startsWith("red"))
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(Exact.cents(col("l_quantity"))).as("qty_c"))
      val tot = pq.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("qty_c")).as("tot_c"))
      val dominant = pq.join(broadcast(tot), col("l_partkey") === col("pk"))
        .filter(col("qty_c") * 2 > col("tot_c"))
        .select(col("l_suppkey")).distinct()
      supp(s, d)
        .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(nat(s, d).filter(col("n_name") === "NATION_3")
          .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    },
    Some(s"""WITH pq AS (SELECT l_partkey, l_suppkey,
              sum(${Exact.centsSql("l_quantity")}) AS qty_c
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_name LIKE 'red%'
                AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              GROUP BY 1, 2),
            tot AS (SELECT l_partkey AS pk, sum(qty_c) AS tot_c
              FROM pq GROUP BY 1),
            dom AS (SELECT DISTINCT l_suppkey FROM pq
              JOIN tot ON l_partkey = pk WHERE qty_c * 2 > tot_c)
            SELECT s_suppkey, s_name
            FROM supplier JOIN dom ON s_suppkey = l_suppkey
              JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
            ORDER BY s_suppkey"""))

  val all: Seq[GQuery] = Seq(q2MinCostSupplier, q4OrderPriority, q6Forecast,
    q7NationVolume, q8MarketShare, q9ProductProfit, q11ImportantStock,
    q13OrderDist, q15TopSupplier, q16SupplierCount, q17SmallQty,
    q19Disjunctive, q20PartPromotion, q21WaitingSupplier, q22Opportunity)
}
