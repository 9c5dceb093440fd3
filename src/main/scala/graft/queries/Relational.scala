package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator surface (SURVEY.md §2.1–2.3, §2.5–2.6) exercised
  * on the driver's TPC-H-ish testdata. Every query output is fully
  * deterministic (explicit ORDER BY on a unique key; doubles rounded) so the
  * DuckDB oracle hash-compare is stable.
  *
  * Reference capabilities covered here: A1 global count
  * (grafana/queries.yaml:1-7), A2/A3 distinct (bronze/readSampleDelta.py:67-71),
  * A4 high-watermark max (gold/bronzeToGold2.py:38-50), A5 null counts
  * (gold/bronzeToGold.py:216-223), A6 duplicate check (test_real_data.py:17),
  * A7 grouped multi-agg with pct (gold/2test1.py:186-200), J1/J2 left
  * equi-joins (gold/bronzeToGold.py:132-163), J5 scalar-subquery join
  * (FormulaePowerBI.txt:9-19), P8 watermark filter (gold/bronzeToGold2.py:103-110),
  * P9/P10 semi/anti membership (find_unique_employee.ipynb), P14 first-seen
  * dedup (bronze/redPandaToDeltaLake.py:134), W1 top-N (README.md:68-78),
  * W2 ordered export, U1 union, U2 set difference/intersection.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  /** TPC-H Q1-shaped pricing summary: grouped multi-agg with arithmetic
    * (A7 analog). Broad shuffle-side test: map-side partial agg + 2-key
    * groupBy; at 100 TB this is a classic partial-agg-then-exchange plan. */
  val q1Agg: GQuery = GQuery(
    "q1_agg",
    (s, d) =>
      li(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        // integer-cents on every money column: qty/price are exact
        // 2-decimal doubles; disc_price is an exact rational in 10^-4
        // dollar units (price_cents · (100 − disc_pct)); avg_disc an
        // exact rational pct_sum/(100·n) rounded to 4 decimals.
        .withColumn("qty_c", Exact.cents(col("l_quantity")))
        .withColumn("price_c", Exact.cents(col("l_extendedprice")))
        .withColumn("disc_p", Exact.cents(col("l_discount")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (sum(col("qty_c")) / 100.0).as("sum_qty"),
          (sum(col("price_c")) / 100.0).as("sum_base_price"),
          sum(col("price_c") * (lit(100L) - col("disc_p"))).as("disc_q"),
          sum(col("disc_p")).as("disc_sum"),
          count(lit(1)).as("count_order"))
        .select(
          col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("sum_base_price"),
          (Exact.roundDiv(col("disc_q"), lit(100L)) / 100.0).as("sum_disc_price"),
          (Exact.roundDiv(col("disc_sum") * 100, col("count_order")) / 10000.0)
            .as("avg_disc"),
          col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some(s"""WITH t AS (SELECT l_returnflag, l_linestatus,
              ${Exact.centsSql("l_quantity")} AS qty_c,
              ${Exact.centsSql("l_extendedprice")} AS price_c,
              ${Exact.centsSql("l_discount")} AS disc_p
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
            SELECT l_returnflag, l_linestatus,
            sum(qty_c) / 100.0 AS sum_qty,
            sum(price_c) / 100.0 AS sum_base_price,
            ${Exact.roundDivSqlPos("sum(price_c * (100 - disc_p))", "100")}
              / 100.0 AS sum_disc_price,
            ${Exact.roundDivSqlPos("sum(disc_p) * 100", "count(*)")}
              / 10000.0 AS avg_disc,
            count(*) AS count_order
            FROM t
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""")
  )

  /** TPC-H Q3 (shipping priority, adapted to the testdata schema:
    * o_orderpriority stands in for o_shippriority): segment-filtered
    * customers semi-join orders (broadcast), fact joins on the order
    * key, exact-cents revenue, top-10. The classic
    * filter→broadcast-dim→fact-join→agg→topN OLAP shape. */
  val q3Shipping: GQuery = GQuery(
    "q3_shipping_priority",
    (s, d) => {
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"),
          "left_semi")
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
      li(s, d)
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("price_c", Exact.cents(col("l_extendedprice")))
        .withColumn("disc_p", Exact.cents(col("l_discount")))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum(col("price_c") * (lit(100L) - col("disc_p"))).as("rq"))
        .select(col("l_orderkey"),
          (Exact.roundDiv(col("rq"), lit(100L)) / 100.0).as("revenue"),
          col("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },
    Some(s"""WITH l AS (SELECT l_orderkey,
              ${Exact.centsSql("l_extendedprice")} AS price_c,
              ${Exact.centsSql("l_discount")} AS disc_p
              FROM lineitem
              WHERE l_shipdate > TIMESTAMP '1995-03-15 00:00:00')
            SELECT l_orderkey,
              ${Exact.roundDivSqlPos("sum(price_c * (100 - disc_p))", "100")}
                / 100.0 AS revenue,
              o_orderdate, o_orderpriority
            FROM l JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"""))

  /** TPC-H Q5 (local supplier volume): the 6-table star join — two
    * large facts shuffle ONCE on the order key; every dim rides in as
    * a broadcast; the local-supplier condition (customer and supplier
    * in the same nation) applies post-join as the classic non-key
    * predicate. */
  val q5LocalSupplier: GQuery = GQuery(
    "q5_local_supplier_volume",
    (s, d) => {
      val nr = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"), "left_semi")
        .select(col("n_nationkey"), col("n_name"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      li(s, d)
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
        .withColumn("price_c", Exact.cents(col("l_extendedprice")))
        .withColumn("disc_p", Exact.cents(col("l_discount")))
        .groupBy(col("n_name"))
        .agg(sum(col("price_c") * (lit(100L) - col("disc_p"))).as("rq"))
        .select(col("n_name"),
          (Exact.roundDiv(col("rq"), lit(100L)) / 100.0).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some(s"""SELECT n_name,
              ${Exact.roundDivSqlPos(
                s"sum(${Exact.centsSql("l_extendedprice")} * " +
                  s"(100 - ${Exact.centsSql("l_discount")}))", "100")}
                / 100.0 AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  /** TPC-H Q10 (returned items, adapted to the testdata's customer
    * columns): quarter of orders × returned lineitems, revenue per
    * customer, top-20 — fact shuffles once on the order key, customer
    * and nation broadcast. */
  val q10Returned: GQuery = GQuery(
    "q10_returned_items",
    (s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val cn = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
      li(s, d)
        .filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
        .withColumn("price_c", Exact.cents(col("l_extendedprice")))
        .withColumn("disc_p", Exact.cents(col("l_discount")))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(sum(col("price_c") * (lit(100L) - col("disc_p"))).as("rq"))
        .select(col("c_custkey"), col("c_name"),
          (Exact.roundDiv(col("rq"), lit(100L)) / 100.0).as("revenue"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name,
              ${Exact.roundDivSqlPos(
                s"sum(${Exact.centsSql("l_extendedprice")} * " +
                  s"(100 - ${Exact.centsSql("l_discount")}))", "100")}
                / 100.0 AS revenue,
              round(c_acctbal, 2) AS c_acctbal, n_name
            FROM customer, orders, lineitem, nation
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_returnflag = 'R' AND c_nationkey = n_nationkey
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** A1: global COUNT(*) — the reference's one monitoring metric. */
  val qCount: GQuery = GQuery(
    "a1_count_star",
    (s, d) => li(s, d).agg(count(lit(1)).as("n")),
    Some("SELECT count(*) AS n FROM lineitem"))

  /** A2b: approximate distinct via HLL sketch (the 100 TB path for A2 —
    * one pass, bounded memory, mergeable partials). The raw estimate is
    * engine-specific, so the oracle contract is: exact counts must
    * match AND the HLL estimate (rsd=0.02) must land within 5% of
    * exact, emitted as booleans the oracle expects to be true. */
  val qApproxDistinct: GQuery = GQuery(
    "a2b_approx_distinct",
    (s, d) =>
      li(s, d).agg(
        countDistinct(col("l_partkey")).as("n_part"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("asup"))
        .select(col("n_part"), col("n_supp"),
          (abs(col("ap") - col("n_part")) * 100 <= col("n_part") * 5)
            .as("part_within_5pct"),
          (abs(col("asup") - col("n_supp")) * 100 <= col("n_supp") * 5)
            .as("supp_within_5pct")),
    Some("""SELECT count(DISTINCT l_partkey) AS n_part,
            count(DISTINCT l_suppkey) AS n_supp,
            true AS part_within_5pct, true AS supp_within_5pct
            FROM lineitem"""))

  /** A2c: bottom-k (KMV) distinct sketch — custom
    * TypedImperativeAggregate with a deterministic hash, so the ENTIRE
    * sketch (not just its estimate) is oracle-checkable: per group we
    * compare hash count, min/max/sum of the kept hashes, and the
    * (k−1)·p/h_k estimate. */
  val qBottomKSketch: GQuery = GQuery(
    "a2c_bottomk_sketch",
    (s, d) => {
      val sk = graft.expressions.BottomKSketch
        .bottomk_sketch(col("l_partkey"), 16).as("sk")
      li(s, d)
        .groupBy(col("l_returnflag")).agg(sk)
        .select(
          col("l_returnflag"),
          size(col("sk.hashes")).as("n_hashes"),
          array_min(col("sk.hashes")).as("h_min"),
          array_max(col("sk.hashes")).as("h_max"),
          aggregate(col("sk.hashes"), lit(0L), (a, b) => a + b).as("h_sum"),
          col("sk.estimate").as("estimate"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH h AS (
              SELECT DISTINCT l_returnflag,
                (654435747 * l_partkey + (CAST(40503 AS BIGINT) * 69069) % 1000000007)
                  % 1000000007 AS hv
              FROM lineitem),
            r AS (SELECT l_returnflag, hv,
              row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn
              FROM h)
            SELECT l_returnflag, count(*) AS n_hashes,
              min(hv) AS h_min, max(hv) AS h_max,
              CAST(sum(hv) AS BIGINT) AS h_sum,
              CASE WHEN count(*) < 16 THEN CAST(count(*) AS DOUBLE)
                   ELSE 15.0 * 1000000007 / max(hv) END AS estimate
            FROM r WHERE rn <= 16
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Corpus-overlap estimation from sketches alone (SURVEY §2.9 scale
    * ops): how much do the part sets of two selective order slices
    * overlap? Each side aggregates a 256-hash bottom-k sketch in one
    * pass; Jaccard / intersection / union estimates come out of the
    * two arrays — the raw sets are never rescanned or shuffled. The
    * deterministic affine hash makes every output column (not just an
    * error band) replayable in SQL — the oracle rebuilds both sketches
    * and the combined bottom-k relationally. */
  val qSketchSetOps: GQuery = GQuery(
    "a19_sketch_set_ops",
    (s, d) => {
      val a = li(s, d)
        .filter(col("l_returnflag") === "R" && col("l_quantity") <= 5)
        .select(col("l_partkey"))
      val b = li(s, d)
        .filter(col("l_returnflag") === "A" && col("l_quantity") >= 46)
        .select(col("l_partkey"))
      graft.expressions.SketchSetOps.estimate(a, "l_partkey",
        b, "l_partkey", k = 256)
    },
    Some("""WITH ha AS (SELECT DISTINCT
              (654435747 * l_partkey +
                (CAST(40503 AS BIGINT) * 69069) % 1000000007) % 1000000007 AS h
              FROM lineitem WHERE l_returnflag = 'R' AND l_quantity <= 5
              ORDER BY h LIMIT 256),
            hb AS (SELECT DISTINCT
              (654435747 * l_partkey +
                (CAST(40503 AS BIGINT) * 69069) % 1000000007) % 1000000007 AS h
              FROM lineitem WHERE l_returnflag = 'A' AND l_quantity >= 46
              ORDER BY h LIMIT 256),
            u AS (SELECT h FROM
              (SELECT h FROM ha UNION SELECT h FROM hb) t
              ORDER BY h LIMIT 256),
            s AS (SELECT count(*) AS m, coalesce(max(h), 0) AS kth FROM u),
            x AS (SELECT count(*) AS x_common FROM u
              WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)),
            e AS (SELECT m, kth, x_common,
              CASE WHEN m < 256 THEN m
                ELSE (255 * CAST(1000000007 AS BIGINT)) // kth END AS union_est
              FROM s, x)
            SELECT m, kth, x_common, union_est,
              CASE WHEN m < 256 THEN x_common
                ELSE (x_common * union_est) // 256 END AS inter_est,
              CASE WHEN m = 0 THEN 0 ELSE
                (2 * x_common * 1000 + (CASE WHEN m < 256 THEN m ELSE 256 END))
                // (2 * (CASE WHEN m < 256 THEN m ELSE 256 END)) END
                AS jacc_permille
            FROM e"""))

  /** A14: Count-Min frequency sketch — custom TypedImperativeAggregate
    * with the deterministic affine hash family, so the ENTIRE cell
    * grid is oracle-checkable: DuckDB re-addresses every (depth, cell)
    * bucket with the same arithmetic and must agree on every non-zero
    * count. The estimate path (min over rows) is spec-checked for the
    * CMS overestimate property in OperatorsSpec. */
  val qCmsSketch: GQuery = GQuery(
    "a14_cms_sketch",
    (s, d) => {
      val sk = graft.expressions.CountMinSketch
        .cms_sketch(col("l_partkey"), 4, 32).as("sk")
      li(s, d)
        .groupBy(col("l_returnflag")).agg(sk)
        .select(col("l_returnflag"), posexplode(col("sk.cells")))
        .select(col("l_returnflag"),
          (col("pos") / 32).cast("long").as("d"),
          pmod(col("pos"), lit(32)).cast("long").as("w"),
          col("col").as("cnt"))
        .filter(col("cnt") > 0)
        .orderBy(col("l_returnflag"), col("d"), col("w"))
    },
    Some("""WITH dep AS (SELECT unnest(range(4)) AS d),
            cell AS (SELECT l_returnflag, d,
              ((((2654435761 * (d+1)) % 1000000007) * l_partkey
                 + (40503 * (d+1) * 69069) % 1000000007)
                % 1000000007) % 32 AS w,
              count(*) AS cnt
              FROM lineitem CROSS JOIN dep
              GROUP BY l_returnflag, d, w)
            SELECT l_returnflag, d, w, CAST(cnt AS BIGINT) AS cnt
            FROM cell ORDER BY l_returnflag, d, w"""))

  /** A2: exact distinct counts (ID.nunique analog). */
  val qDistinctCount: GQuery = GQuery(
    "a2_distinct_count",
    (s, d) =>
      li(s, d).agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        countDistinct(col("l_orderkey")).as("n_ord")),
    Some("""SELECT count(DISTINCT l_suppkey) AS n_supp,
            count(DISTINCT l_partkey) AS n_part,
            count(DISTINCT l_orderkey) AS n_ord FROM lineitem"""))

  /** A3: distinct values of a low-cardinality column. */
  val qDistinctVals: GQuery = GQuery(
    "a3_distinct_values",
    (s, d) =>
      ev(s, d).select(col("event_type")).distinct().orderBy(col("event_type")),
    Some("SELECT DISTINCT event_type FROM events ORDER BY event_type"))

  /** A4: high-watermark max over the stream table (incremental gold load). */
  val qWatermarkMax: GQuery = GQuery(
    "a4_watermark_max",
    (s, d) =>
      ev(s, d).agg(
        max(col("event_id")).as("max_id"),
        max(expr("ts_ns div 1000000")).as("max_ts_ms")),
    Some("""SELECT max(event_id) AS max_id,
            max(epoch_ms(ts)) AS max_ts_ms FROM events"""))

  /** A5: per-column null counts (join-miss detection shape). */
  val qNullCounts: GQuery = GQuery(
    "a5_null_counts",
    (s, d) =>
      ord(s, d).agg(
        count(when(col("o_custkey").isNull, 1)).as("null_cust"),
        count(when(col("o_totalprice").isNull, 1)).as("null_price"),
        count(when(col("o_orderdate").isNull, 1)).as("null_date")),
    Some("""SELECT count(CASE WHEN o_custkey IS NULL THEN 1 END) AS null_cust,
            count(CASE WHEN o_totalprice IS NULL THEN 1 END) AS null_price,
            count(CASE WHEN o_orderdate IS NULL THEN 1 END) AS null_date
            FROM orders"""))

  /** A6: duplicate-key check — keys occurring more than once. */
  val qDupCheck: GQuery = GQuery(
    "a6_dup_check",
    (s, d) =>
      li(s, d)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy(col("l_orderkey")),
    Some("""SELECT l_orderkey, count(*) AS n FROM lineitem
            GROUP BY l_orderkey HAVING count(*) > 1 ORDER BY l_orderkey"""))

  /** A7: grouped multi-agg + derived percentage columns
    * (gold/2test1.py:186-200 shape on the events table). */
  val qGroupedPct: GQuery = GQuery(
    "a7_grouped_pct",
    (s, d) => {
      val g = ev(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), Exact.moneySum(col("value")).as("total_value"))
      // pct as exact rational n·100/total rounded to 1 decimal in
      // integer arithmetic (n·1000/total, half-up) — immune to the
      // double-division boundary class. Total folded in via a broadcast
      // cross join of the 1-row agg, not a global window (a
      // single-partition WindowExec over the grouped result).
      val total = g.agg(sum(col("n")).as("total_n"))
      g.crossJoin(broadcast(total))
        .select(col("event_type"), col("n"), col("total_value"),
          (Exact.roundDiv(col("n") * 1000, col("total_n")) / 10.0).as("pct"))
        .orderBy(col("event_type"))
    },
    Some(s"""SELECT event_type, count(*) AS n,
            ${Exact.moneySumSql("value")} AS total_value,
            ${Exact.roundDivSqlPos("count(*) * 1000", "sum(count(*)) OVER ()")}
              / 10.0 AS pct
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** J1+J2 gold-enrich shape: fact left-joins two-dim chain; dims are small
    * → Catalyst broadcast-hash-joins both (at 100 TB: no shuffle of the
    * fact side, only the dim broadcast). */
  val qJoinEnrich: GQuery = GQuery(
    "j1_join_enrich",
    (s, d) => {
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      ord(s, d)
        .join(broadcast(cust(s, d)), col("o_custkey") === col("c_custkey"), "left")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
        .select(
          col("o_orderkey"),
          col("o_totalprice"),
          col("c_name"),
          col("n_name"),
          col("r_name"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_totalprice, c_name, n_name, r_name
            FROM orders
            LEFT JOIN customer ON o_custkey = c_custkey
            LEFT JOIN nation ON c_nationkey = n_nationkey
            LEFT JOIN region ON n_regionkey = r_regionkey
            ORDER BY o_orderkey"""))

  /** J5/A10: scalar-subquery join decorrelated to join-with-aggregate —
    * per-customer order totals (the DAX CALCULATE pattern). */
  val qScalarSubquery: GQuery = GQuery(
    "j5_scalar_subquery",
    (s, d) => {
      val perCust = ord(s, d)
        .groupBy(col("o_custkey"))
        .agg(Exact.moneySum(col("o_totalprice")).as("total_spent"),
          count(lit(1)).as("n_orders"))
      cust(s, d)
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(
          col("c_custkey"),
          col("c_name"),
          coalesce(col("total_spent"), lit(0.0)).as("total_spent"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("c_custkey"))
    },
    Some(s"""SELECT c_custkey, c_name,
            coalesce(t.total_spent, 0.0) AS total_spent,
            coalesce(t.n_orders, 0) AS n_orders
            FROM customer
            LEFT JOIN (
              SELECT o_custkey, ${Exact.moneySumSql("o_totalprice")} AS total_spent,
                     count(*) AS n_orders
              FROM orders GROUP BY o_custkey) t ON c_custkey = t.o_custkey
            ORDER BY c_custkey"""))

  /** P9: membership filter as LEFT SEMI join (customers having orders). */
  val qSemi: GQuery = GQuery(
    "p9_semi_join",
    (s, d) =>
      cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey"""))

  /** P10: anti-membership as LEFT ANTI join — customers with no
    * high-value order (non-degenerate at every sf). */
  val qAnti: GQuery = GQuery(
    "p10_anti_join",
    (s, d) =>
      cust(s, d)
        .join(
          ord(s, d).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
            ORDER BY c_custkey"""))

  /** P8: high-watermark incremental filter — rows newer than a literal
    * watermark (pushed down to the parquet scan). */
  val qWatermarkFilter: GQuery = GQuery(
    "p8_watermark_filter",
    (s, d) =>
      ev(s, d)
        // watermark literal as epoch-ns so the compare is exact at the
        // source's ns precision (matches DuckDB's TIMESTAMP '...' compare)
        .filter(col("ts_ns") >
          lit(java.time.Instant.parse("2024-01-15T00:00:00Z").getEpochSecond * 1000000000L))
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id, user_id, event_type FROM events
            WHERE ts > TIMESTAMP '2024-01-15 00:00:00' ORDER BY event_id"""))

  /** P14: first-seen dedup by key, made deterministic with row_number
    * (the reference's processed_ids set keeps the first occurrence). */
  val qDedupFirstSeen: GQuery = GQuery(
    "p14_dedup_first_seen",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
      ev(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, event_id, event_type FROM (
              SELECT user_id, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events) WHERE rn = 1 ORDER BY user_id"""))

  /** W1: top-N by key desc ("delete last 7 entries" selection shape). */
  val qTopN: GQuery = GQuery(
    "w1_top_n",
    (s, d) =>
      ord(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice")),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** W4: last-K per partition replay buffer (row_number over desc order). */
  val qLastKPerKey: GQuery = GQuery(
    "w4_last_k_per_key",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)
      ev(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("rn"))
        .orderBy(col("user_id"), col("rn"))
    },
    Some("""SELECT user_id, event_id, rn FROM (
              SELECT user_id, event_id,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn <= 3 ORDER BY user_id, rn"""))

  /** W5: per-key top-N cap (the CommonCrawl per-domain document cap,
    * generalizing W4's last-K-per-key, slack_notifier.py:206-244)
    * through the hot-key-safe two-phase operator
    * (operators/Ranking.topNPerKey) on the same deliberately 90%-hot
    * key fixture as j8. The operator's result is shard-invariant, so
    * the oracle is the plain single-window SQL. */
  val qTopNPerKey: GQuery = GQuery(
    "w5_topn_per_key",
    (s, d) => {
      val e = ev(s, d).withColumn("skew_key",
        when(col("user_id") % 10 < 9, 1L)
          .otherwise(col("user_id") % 100 + 1))
      graft.operators.Ranking.topNPerKey(e, col("skew_key"),
          Seq(col("ts_ns").desc, col("event_id")), n = 5,
          shardBy = col("event_id"), shards = 32)
        .select(col("skew_key"), col("rank"), col("event_id"))
        .orderBy(col("skew_key"), col("rank"))
    },
    Some("""SELECT skew_key, rank, event_id FROM (
              SELECT skew_key, event_id,
                     row_number() OVER (PARTITION BY skew_key
                       ORDER BY ts DESC, event_id) AS rank
              FROM (SELECT CASE WHEN user_id % 10 < 9 THEN 1
                                ELSE user_id % 100 + 1 END AS skew_key,
                           event_id, ts
                    FROM events))
            WHERE rank <= 5 ORDER BY skew_key, rank"""))

  /** U1: union of homogeneous scans (pd.concat analog). */
  val qUnion: GQuery = GQuery(
    "u1_union",
    (s, d) => {
      val a = ev(s, d).filter(col("event_type") === "click")
      val b = ev(s, d).filter(col("event_type") === "view")
      a.unionByName(b)
        .select(col("event_id"), col("event_type"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, event_type FROM (
              SELECT event_id, event_type FROM events WHERE event_type = 'click'
              UNION ALL
              SELECT event_id, event_type FROM events WHERE event_type = 'view')
            ORDER BY event_id"""))

  /** U2: set difference + intersection on key sets (set(a)-set(b) analog):
    * users who clicked but never purchased. */
  val qSetDiff: GQuery = GQuery(
    "u2_set_difference",
    (s, d) => {
      def byDay(t: String) = ev(s, d).filter(col("event_type") === t)
        .select(col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
      byDay("click").except(byDay("purchase"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""SELECT * FROM (
              SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
              FROM events WHERE event_type = 'click'
              EXCEPT
              SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
              FROM events WHERE event_type = 'purchase')
            ORDER BY user_id, day"""))

  /** P13: row lookup by multi-predicate (the (Nom, Prénom) filter shape,
    * google_map/gmap_commute.py:332-337). */
  val qRowLookup: GQuery = GQuery(
    "p13_row_lookup",
    (s, d) =>
      cust(s, d)
        .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
            WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000
            ORDER BY c_custkey"""))

  /** W3: head/limit display slice (deterministic order). */
  val qHead: GQuery = GQuery(
    "w3_head",
    (s, d) =>
      ord(s, d).orderBy(col("o_orderkey")).limit(10)
        .select(col("o_orderkey"), col("o_orderstatus")),
    Some("""SELECT o_orderkey, o_orderstatus FROM orders
            ORDER BY o_orderkey LIMIT 10"""))

  /** W2: globally ordered export (ORDER BY key) with projection pruning —
    * the scan should read only 3 of 6 event columns. */
  val qOrderedExport: GQuery = GQuery(
    "w2_ordered_export",
    (s, d) =>
      ev(s, d)
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id, user_id, value FROM events ORDER BY event_id"""))

  /** As-of join (beyond the reference): for each purchase, the latest
    * click by the same user at-or-before it — graft.operators.AsOfJoin
    * (union + one window = one shuffle) vs DuckDB's native ASOF JOIN. */
  val qAsof: GQuery = GQuery(
    "j6_asof_join",
    (s, d) => {
      // µs timestamps on both sides: DuckDB floors parquet ns → µs on
      // read, so the as-of comparison and output use the same precision
      val e = ev(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      graft.operators.AsOfJoin
        .asofJoin(purchases, clicks, key = "user_id", ts = "ts_us",
          rightTiebreak = "event_id", rightCols = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          // -1 sentinel for no-match: a nullable int64 turns into
          // lossy float64 in pandas-style comparators
          coalesce(col("asof_ts"), lit(-1L)).as("click_ts_us"),
          coalesce(col("asof_event_id"), lit(-1L)).as("click_event_id"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT p.event_id, p.user_id,
              coalesce(epoch_us(c.ts), -1) AS click_ts_us,
              coalesce(c.event_id, -1) AS click_event_id
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY p.event_id"""))

  /** A15: the mergeable-sketch LIFECYCLE a2b's one-shot estimate
    * doesn't exercise — per-group Datasketches HLL sketches built
    * independently (in production: one per day/partition, persisted as
    * binary), then hll_union_agg merges them WITHOUT rescanning rows
    * and the estimate comes off the merged sketch. At 100 TB this is
    * how "distinct users this quarter" is answered from 90 stored
    * daily sketches in milliseconds. Estimate values are
    * engine-specific, so the oracle contract is a2b's: exact count
    * matches AND the merged-sketch estimate lands within 5%. */
  val qHllUnion: GQuery = GQuery(
    "a15_hll_union",
    (s, d) => {
      val perGroup = li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(hll_sketch_agg(col("l_partkey"), lit(12)).as("sk"))
      val merged = perGroup
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val exact = li(s, d)
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      exact.crossJoin(broadcast(merged))
        .select(col("n_exact"),
          (abs(col("est") - col("n_exact")) * 100 <= col("n_exact") * 5)
            .as("within_5pct"))
    },
    Some("""SELECT count(DISTINCT l_partkey) AS n_exact,
            true AS within_5pct FROM lineitem"""))

  /** TPC-H Q12 (adapted: the testdata lineitem has no shipmode/commit
    * dates, so the CASE-sum join shape runs over order priorities per
    * return flag): fact join + conditional integer counts — the
    * canonical join-then-pivot-by-CASE reporting query. */
  val q12Priority: GQuery = GQuery(
    "q12_priority_counts",
    (s, d) =>
      li(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(ord(s, d).select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_count"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** TPC-H Q14 (promo revenue share): fact ⋈ broadcast part dim, a
    * conditional revenue numerator over the total, expressed as an
    * exact integer per-mille (the classic promo-effect metric without
    * the float-division nondeterminism of the official 100·x form). */
  val q14Promo: GQuery = GQuery(
    "q14_promo_share",
    (s, d) =>
      li(s, d)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .withColumn("rq",
          Exact.cents(col("l_extendedprice")) *
            (lit(100L) - Exact.cents(col("l_discount"))))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rq")).otherwise(0L))
            .as("promo_q"),
          sum(col("rq")).as("total_q"))
        .select(
          (Exact.roundDiv(col("promo_q"), lit(100L)) / 100.0)
            .as("promo_revenue"),
          (Exact.roundDiv(col("total_q"), lit(100L)) / 100.0)
            .as("total_revenue"),
          Exact.roundDiv(col("promo_q") * 1000, col("total_q"))
            .as("promo_permille")),
    Some(s"""WITH t AS (SELECT p_type,
              ${Exact.centsSql("l_extendedprice")} *
                (100 - ${Exact.centsSql("l_discount")}) AS rq
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00')
            SELECT
              ${Exact.roundDivSqlPos(
                "sum(CASE WHEN p_type = 'PROMO' THEN rq ELSE 0 END)", "100")}
                / 100.0 AS promo_revenue,
              ${Exact.roundDivSqlPos("sum(rq)", "100")}
                / 100.0 AS total_revenue,
              CAST(${Exact.roundDivSqlPos(
                "sum(CASE WHEN p_type = 'PROMO' THEN rq ELSE 0 END) * 1000",
                "sum(rq)")} AS BIGINT) AS promo_permille
            FROM t"""))

  /** A17: exact per-group MODE (most frequent value, deterministic
    * lowest-value tiebreak) — count-then-rank, two shuffles both keyed
    * and map-side-combinable; the exact form of the frequency question
    * a14's Count-Min answers approximately. */
  val qMode: GQuery = GQuery(
    "a17_group_mode",
    (s, d) => {
      val counted = ord(s, d)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("n").desc, col("o_orderpriority"))
      counted.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderstatus"),
          col("o_orderpriority").as("mode_priority"), col("n"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, mode_priority, n FROM (
              SELECT o_orderstatus, o_orderpriority AS mode_priority,
                count(*) AS n,
                row_number() OVER (PARTITION BY o_orderstatus
                  ORDER BY count(*) DESC, o_orderpriority) AS rn
              FROM orders GROUP BY o_orderstatus, o_orderpriority) z
            WHERE rn = 1 ORDER BY o_orderstatus"""))

  /** A18: exact heavy hitters WITHOUT shuffling the key domain —
    * per-partition Misra-Gries candidates (sound superset by weighted
    * pigeonhole), broadcast-semi-join recount ([[operators
    * .HeavyHitters]]). The oracle is the plain HAVING form; the gate
    * proves the sketch-then-recount path returns the identical exact
    * answer. Threshold 20 = 2× the scale-invariant mean orders per
    * customer, so the output is non-empty at every sf tier. */
  val qHeavyHitters: GQuery = GQuery(
    "a18_heavy_hitters",
    (s, d) => graft.operators.HeavyHitters.heavyHitters(
      ord(s, d).select(col("o_custkey")), "o_custkey", 20L)
      .select(col("o_custkey"), col("freq")),
    Some("""SELECT o_custkey, count(*) AS freq
            FROM orders GROUP BY o_custkey HAVING count(*) > 20
            ORDER BY o_custkey"""))

  /** TPC-H Q18 (large-volume customers): HAVING over a fact aggregate
    * feeding a semi-join back into the enriched join — the
    * find-the-outliers-then-detail reporting shape. Threshold tuned to
    * the synthetic quantity distribution. */
  val q18LargeVolume: GQuery = GQuery(
    "q18_large_volume",
    (s, d) => {
      val big = li(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_quantity") * 100).cast("long")).as("qty_c"))
        .filter(col("qty_c") > 30000L) // > 300 units
      ord(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(cust(s, d).select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), (col("qty_c") / 100.0).as("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(50)
    },
    Some("""SELECT c_custkey, c_name, o_orderkey, o_orderdate,
              total_qty
            FROM (SELECT l_orderkey,
                sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0
                  AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 30000) b
            JOIN orders ON o_orderkey = b.l_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY total_qty DESC, o_orderkey LIMIT 50"""))

  /** A16: one-pass column profiler — the data-quality summary every
    * ingestion pipeline publishes (per column: nulls, exact distinct,
    * min/max as display strings). ONE aggregate pass over the table
    * (grouping-set expansion handles the multi-distinct), unpivoted
    * with stack() into the (column, stats) report shape. */
  val qColumnProfile: GQuery = GQuery(
    "a16_column_profile",
    (s, d) =>
      ord(s, d).agg(
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("nn_ck"),
        countDistinct(col("o_custkey")).as("nd_ck"),
        min(col("o_custkey")).cast("string").as("mn_ck"),
        max(col("o_custkey")).cast("string").as("mx_ck"),
        sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("nn_st"),
        countDistinct(col("o_orderstatus")).as("nd_st"),
        min(col("o_orderstatus")).as("mn_st"),
        max(col("o_orderstatus")).as("mx_st"),
        sum(when(col("o_orderpriority").isNull, 1L).otherwise(0L)).as("nn_pr"),
        countDistinct(col("o_orderpriority")).as("nd_pr"),
        min(col("o_orderpriority")).as("mn_pr"),
        max(col("o_orderpriority")).as("mx_pr"))
        .select(expr(
          """stack(3,
             'o_custkey', nn_ck, nd_ck, mn_ck, mx_ck,
             'o_orderpriority', nn_pr, nd_pr, mn_pr, mx_pr,
             'o_orderstatus', nn_st, nd_st, mn_st, mx_st)
             AS (column_name, n_nulls, n_distinct, min_v, max_v)"""))
        .orderBy(col("column_name")),
    Some("""SELECT 'o_custkey' AS column_name,
              count(*) - count(o_custkey) AS n_nulls,
              count(DISTINCT o_custkey) AS n_distinct,
              CAST(min(o_custkey) AS VARCHAR) AS min_v,
              CAST(max(o_custkey) AS VARCHAR) AS max_v FROM orders
            UNION ALL
            SELECT 'o_orderpriority',
              count(*) - count(o_orderpriority),
              count(DISTINCT o_orderpriority),
              min(o_orderpriority), max(o_orderpriority) FROM orders
            UNION ALL
            SELECT 'o_orderstatus',
              count(*) - count(o_orderstatus),
              count(DISTINCT o_orderstatus),
              min(o_orderstatus), max(o_orderstatus) FROM orders
            ORDER BY column_name"""))

  /** Point-in-time enrichment: 2000+ orders pick up the customer's
    * standing order-priority AS OF the order date from an SCD2 dimension
    * built over the pre-2000 feed (operators/Scd.scala + AsOfJoin — the
    * single-shuffle alternative to a fact×dim interval join, which at
    * 100 TB would materialize the fact-to-every-historical-version pair
    * space before filtering). Oracle: run-collapse in SQL, then a
    * correlated LATERAL top-1 per fact. */
  val qPitJoin: GQuery = GQuery(
    "j11_pit_join",
    (s, d) => {
      val o = ord(s, d)
      val cut = lit("2000-01-01").cast("timestamp")
      val dim = graft.operators.Scd.scd2(
        o.filter(col("o_orderdate") < cut).select(
          col("o_custkey").as("custkey"),
          col("o_orderpriority").as("priority"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("ts"),
          col("o_orderkey").as("oid")),
        keyCols = Seq("custkey"), attrCols = Seq("priority"),
        tsCol = "ts", idCol = "oid")
        .select(col("custkey"), col("priority"),
          col("valid_from").as("ts"), col("change_id"))
      val facts = o.filter(col("o_orderdate") >= cut).select(
        col("o_orderkey"), col("o_custkey").as("custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ts"))
      graft.operators.AsOfJoin
        .asofJoin(facts, dim, key = "custkey", ts = "ts",
          rightTiebreak = "change_id", rightCols = Seq("priority"))
        .select(col("o_orderkey"), col("custkey"),
          col("ts").as("order_ts_us"),
          // -1/'NONE' sentinels: nullable int64 degrades to float64 in
          // pandas-style comparators (j6 house rule)
          coalesce(col("asof_ts"), lit(-1L)).as("prio_since_us"),
          coalesce(col("asof_priority"), lit("NONE")).as("prio_asof"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH c AS (SELECT o_custkey AS custkey,
              o_orderpriority AS priority, epoch_us(o_orderdate) AS ts,
              o_orderkey AS oid FROM orders
              WHERE o_orderdate < TIMESTAMP '2000-01-01'),
            l AS (SELECT *, lag(priority) OVER
                (PARTITION BY custkey ORDER BY ts, oid) AS prev FROM c),
            ch AS (SELECT custkey, priority, ts, oid FROM l
              WHERE prev IS DISTINCT FROM priority),
            f AS (SELECT o_orderkey, o_custkey AS custkey,
                epoch_us(o_orderdate) AS ts FROM orders
              WHERE o_orderdate >= TIMESTAMP '2000-01-01')
            SELECT f.o_orderkey, f.custkey, f.ts AS order_ts_us,
              coalesce(p.ts, -1) AS prio_since_us,
              coalesce(p.priority, 'NONE') AS prio_asof
            FROM f LEFT JOIN LATERAL (
              SELECT ts, priority FROM ch
              WHERE ch.custkey = f.custkey AND ch.ts <= f.ts
              ORDER BY ts DESC, oid DESC LIMIT 1) p ON true
            ORDER BY f.o_orderkey"""))

  val all: Seq[GQuery] = Seq(
    q1Agg, q3Shipping, q5LocalSupplier, q10Returned, q12Priority, q14Promo,
    q18LargeVolume, qMode, qColumnProfile, qHeavyHitters,
    qCount, qDistinctCount, qDistinctVals, qWatermarkMax, qNullCounts,
    qDupCheck, qGroupedPct, qJoinEnrich, qScalarSubquery, qSemi, qAnti,
    qWatermarkFilter, qDedupFirstSeen, qTopN, qLastKPerKey, qTopNPerKey,
    qUnion, qSetDiff,
    qOrderedExport, qAsof, qApproxDistinct, qBottomKSketch, qSketchSetOps,
    qCmsSketch, qRowLookup, qHead, qHllUnion, qPitJoin)
}
