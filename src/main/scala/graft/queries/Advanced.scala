package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operators beyond the reference that a complete analytics engine (and
  * a training-data pipeline's reporting layer) needs: sessionization,
  * exact percentiles, rollup, pivot, range join. All oracle-checked. */
object Advanced {

  private def ev(s: SparkSession, d: String) =
    Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))

  /** Event sessionization: gap > 30 min starts a new session; per
    * (user, session) counts and bounds. lag + running sum — one shuffle. */
  val sessionize: GQuery = GQuery(
    "w6_sessionize",
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val gapUs = 30L * 60 * 1000000
      ev(s, d)
        .withColumn("new_session",
          when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) > gapUs ||
            lag(col("ts_us"), 1).over(byUser).isNull, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""WITH g AS (
              SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > 30 * 60 * 1000000
                     OR lag(epoch_us(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
            sid AS (SELECT user_id, ts_us,
              CAST(sum(new_session) OVER (PARTITION BY user_id
                ORDER BY ts_us, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM g)
            SELECT user_id, session_id, count(*) AS n_events,
              min(ts_us) AS start_us, max(ts_us) AS end_us
            FROM sid GROUP BY user_id, session_id
            ORDER BY user_id, session_id"""))

  /** Exact interpolated percentiles (type-7 quantiles) per group,
    * computed over integer cents: quarter-fraction interpolation
    * between integers is fp-exact under either a+(b−a)f or
    * a(1−f)+bf, so both engines produce the identical double (the
    * double-valued variant flipped a cent at a round boundary).
    *
    * Runs on [[graft.operators.Percentiles.exactByGroup]] — the
    * builtin `percentile` agg funnels each group's full value-counts
    * map through one reducer (3 groups = the whole table on 3 tasks);
    * the histogram-offset decomposition keeps exactness with bounded
    * per-task work (differential-tested against the builtin). */
  val percentiles: GQuery = GQuery(
    "a8_percentiles",
    (s, d) => {
      val cents = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      graft.operators.Percentiles
        .exactByGroup(cents, "l_returnflag", "cents", Seq(0.25, 0.5, 0.75))
        .groupBy(col("l_returnflag"))
        .agg(
          (max(when(col("fraction") === 0.25, col("value"))) / 100.0).as("p25"),
          (max(when(col("fraction") === 0.5, col("value"))) / 100.0).as("p50"),
          (max(when(col("fraction") === 0.75, col("value"))) / 100.0).as("p75"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
              quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25)
                / 100.0 AS p25,
              quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5)
                / 100.0 AS p50,
              quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75)
                / 100.0 AS p75
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** A8 scale path: approx_percentile (GK sketch — one pass, bounded
    * memory, mergeable partials; the 100 TB replacement for the exact
    * sort-based percentile). The sketch value is engine- and
    * merge-order-specific, so the oracle contract mirrors a2b: exact
    * per-group percentiles (cross-engine-exact over integer cents) plus
    * booleans asserting the sketch landed within 1% of exact. */
  val approxPercentiles: GQuery = GQuery(
    "a8b_approx_percentiles",
    (s, d) => {
      val base = Tables.lineitem(s, d)
        .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
        .groupBy(col("l_returnflag"))
        // array form: one exact buffer + one GK sketch per group (the
        // same single-buffer rationale as a8)
        .agg(
          expr("percentile(cents, array(0.25D, 0.75D))").as("_ps"),
          expr("approx_percentile(cents, array(0.25D, 0.75D), 10000)")
            .as("_as"))
        .select(col("l_returnflag"),
          (element_at(col("_ps"), 1) / 100.0).as("p25"),
          (element_at(col("_ps"), 2) / 100.0).as("p75"),
          (element_at(col("_as"), 1) / 100.0).as("a25"),
          (element_at(col("_as"), 2) / 100.0).as("a75"))
      base.select(col("l_returnflag"), col("p25"), col("p75"),
          (abs(col("a25") - col("p25")) * 100 <= col("p25")).as("p25_within_1pct"),
          (abs(col("a75") - col("p75")) * 100 <= col("p75")).as("p75_within_1pct"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
              quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25)
                / 100.0 AS p25,
              quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75)
                / 100.0 AS p75,
              true AS p25_within_1pct, true AS p75_within_1pct
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Rollup: subtotals + grand total over (status, priority). */
  val rollupQ: GQuery = GQuery(
    "a9_rollup",
    (s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          Exact.moneySum(col("o_totalprice")).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("revenue"))
        .orderBy(col("status"), col("priority")),
    Some(s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS priority,
              count(*) AS n, ${Exact.moneySumSql("o_totalprice")} AS revenue
            FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
            ORDER BY status, priority"""))

  /** Cube: all 2^2 grouping sets over (status, priority), completing the
    * multi-dimensional agg family beside a9's rollup. grouping_id
    * disambiguates aggregation NULLs from data NULLs (same bit encoding
    * in Spark and DuckDB: first listed column = MSB). */
  val cubeQ: GQuery = GQuery(
    "a11_cube",
    (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          Exact.moneySum(col("o_totalprice")).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("gid"), col("n"), col("revenue"))
        .orderBy(col("gid"), col("status"), col("priority")),
    Some(s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS priority,
              CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
              count(*) AS n, ${Exact.moneySumSql("o_totalprice")} AS revenue
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
            ORDER BY gid, status, priority"""))

  /** Pivot: per-user event-type counts as columns. */
  val pivot: GQuery = GQuery(
    "a10_pivot",
    (s, d) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val p = ev(s, d).groupBy(col("user_id"))
        .pivot("event_type", types).count()
      types.foldLeft(p) { (df, t) =>
        df.withColumn(t, coalesce(col(t), lit(0L)))
      }.orderBy(col("user_id"))
    },
    // CAST AS BIGINT: DuckDB integer sum() is HUGEINT, which the
    // driver's pandas hasher materializes as float64 vs Spark's int64
    Some("""SELECT user_id,
              CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
              CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
              CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
              CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
            FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Range join: clicks within the hour before each purchase, counted
    * per purchase — bucketed equi-join (operators/RangeJoin), not a
    * quadratic per-key filter. */
  val rangeJoin: GQuery = GQuery(
    "j7_range_join",
    (s, d) => {
      val e = ev(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("c_ts"),
          col("event_id").as("c_id"))
      val matched = graft.operators.RangeJoin
        .bucketedRangeJoin(purchases, clicks, key = "user_id",
          leftTs = "ts_us", rightTs = "c_ts", window = 3600L * 1000000,
          rightCols = Seq("c_id"))
        .groupBy(col("event_id")).agg(count(lit(1)).as("n_clicks"))
      purchases.join(matched, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT p.event_id, p.user_id,
              count(c.event_id) AS n_clicks
            FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                  FROM events WHERE event_type = 'purchase') p
            LEFT JOIN (SELECT user_id, event_id, epoch_us(ts) AS ts_us
                  FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id
              AND c.ts_us >= p.ts_us - CAST(3600 AS BIGINT) * 1000000
              AND c.ts_us <= p.ts_us
            GROUP BY p.event_id, p.user_id
            ORDER BY p.event_id"""))

  /** J10: interval-OVERLAP join (both sides intervals — the
    * generalization j7's point-in-range is a special case of):
    * page-view visibility windows [ts, ts+30min] overlapped with click
    * attribution windows [ts, ts+10min] per user. Bucketed equi-join
    * with the keep-once-at-overlap-start rule (no distinct, no second
    * shuffle); the oracle is the plain overlap-predicate join. Overlap
    * length is exact µs integer arithmetic. */
  val intervalOverlap: GQuery = GQuery(
    "j10_interval_overlap",
    (s, d) => {
      val e = ev(s, d)
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("l_id"),
          col("ts_us").as("ls"),
          (col("ts_us") + 1800L * 1000000).as("le"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("r_id"),
          col("ts_us").as("rs"),
          (col("ts_us") + 600L * 1000000).as("re"))
      graft.operators.RangeJoin.intervalOverlapJoin(
        views, clicks, key = "user_id", lStart = "ls", lEnd = "le",
        rStart = "rs", rEnd = "re", bucket = 600L * 1000000,
        rightCols = Seq("r_id"))
        .select(col("user_id"), col("l_id"), col("r_id"),
          (least(col("le"), col("re")) -
            greatest(col("ls"), col("rs"))).as("overlap_us"))
        .orderBy(col("user_id"), col("l_id"), col("r_id"))
    },
    Some("""WITH pv AS (SELECT user_id, event_id AS l_id,
              epoch_us(ts) AS ls,
              epoch_us(ts) + CAST(1800 AS BIGINT) * 1000000 AS le
              FROM events WHERE event_type = 'view'),
            ck AS (SELECT user_id, event_id AS r_id,
              epoch_us(ts) AS rs,
              epoch_us(ts) + CAST(600 AS BIGINT) * 1000000 AS re
              FROM events WHERE event_type = 'click')
            SELECT p.user_id AS user_id, l_id, r_id,
              least(le, re) - greatest(ls, rs) AS overlap_us
            FROM pv p JOIN ck c
              ON p.user_id = c.user_id AND ls <= re AND rs <= le
            ORDER BY p.user_id, l_id, r_id"""))

  /** Salted skew join (operators/SkewJoin) under the oracle gate: a
    * deliberately 90%-hot key (9 of 10 events land on key 1) joined to
    * the customer dim through (key, salt) so the hot key's rows spread
    * across 8 partitions instead of one straggler task. The grouped
    * result is salt-invariant, so the oracle is the plain SQL join. */
  val skewJoin: GQuery = GQuery(
    "j8_skew_join",
    (s, d) => {
      val e = Tables.events(s, d)
        .withColumn("skew_key",
          when(col("user_id") % 10 < 9, 1L)
            .otherwise(col("user_id") % 100 + 1))
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").cast("long").as("skew_key"), col("c_name"))
      graft.operators.SkewJoin.saltedJoin(e, dim, "skew_key", salts = 8)
        .groupBy(col("skew_key"), col("c_name"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
        .orderBy(col("skew_key"))
    },
    Some("""SELECT skew_key, c_name, count(*) AS n,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                AS value_cents
            FROM (SELECT CASE WHEN user_id % 10 < 9 THEN 1
                              ELSE user_id % 100 + 1 END AS skew_key, value
                  FROM events) e
            JOIN customer ON skew_key = c_custkey
            GROUP BY skew_key, c_name ORDER BY skew_key"""))

  /** Grouping sets: the general multi-dimensional agg a9's ROLLUP and
    * a11's CUBE are special cases of — an arbitrary set list
    * ((status, priority), (status), ()), disambiguated by grouping_id
    * (same bit encoding both engines: first listed column = MSB). */
  val groupingSetsQ: GQuery = GQuery(
    "a13_grouping_sets",
    (s, d) =>
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          Exact.moneySum(col("o_totalprice")).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("gid"), col("n"), col("revenue"))
        .orderBy(col("gid"), col("status"), col("priority")),
    Some(s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS priority,
              CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
                AS gid,
              count(*) AS n, ${Exact.moneySumSql("o_totalprice")} AS revenue
            FROM orders
            GROUP BY GROUPING SETS
              ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
            ORDER BY gid, status, priority"""))

  /** Window frames: running total (UNBOUNDED PRECEDING), sliding
    * 3-row sum (2 PRECEDING), and a value-RANGE frame over the order
    * key — the three frame kinds, partitioned per customer (distributed
    * windows; cent-integer sums stay cross-engine exact). */
  val windowFrames: GQuery = GQuery(
    "w7_window_frames",
    (s, d) => {
      val base = Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        Exact.cents(col("o_totalprice")).as("cents"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      base.select(col("o_custkey"), col("o_orderkey"),
        sum(col("cents"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("run_cents"),
        sum(col("cents")).over(w.rowsBetween(-2, 0)).as("slide_cents"),
        sum(col("cents")).over(w.rangeBetween(-1000L, 0L)).as("range_cents"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some(s"""WITH b AS (SELECT o_custkey, o_orderkey,
              ${Exact.centsSql("o_totalprice")} AS cents FROM orders)
            SELECT o_custkey, o_orderkey,
              CAST(sum(cents) OVER (PARTITION BY o_custkey
                ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS BIGINT) AS run_cents,
              CAST(sum(cents) OVER (PARTITION BY o_custkey
                ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING
                AND CURRENT ROW) AS BIGINT) AS slide_cents,
              CAST(sum(cents) OVER (PARTITION BY o_custkey
                ORDER BY o_orderkey RANGE BETWEEN 1000 PRECEDING
                AND CURRENT ROW) AS BIGINT) AS range_cents
            FROM b ORDER BY o_custkey, o_orderkey"""))

  /** J9: dynamic partition pruning — the fact is hive-partitioned on
    * the join column; the dim's selective filter is only known at run
    * time, so static partition pruning can't apply. Catalyst's DPP rule
    * turns the dim's broadcast into a runtime partition filter on the
    * fact scan (PlanSpec asserts `dynamicpruning` in the scan's
    * partition filters), so non-matching partitions are never read. At
    * 100 TB star-schema scale this is the difference between scanning
    * one date/status slice and scanning the whole fact table. Results
    * are pruning-invariant, so the oracle is the plain join. */
  val dppJoin: GQuery = GQuery(
    "j9_dpp_join",
    (s, d) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft_j9_tbl").toString
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .write.mode("overwrite").partitionBy("o_orderstatus")
        .parquet(s"$base/orders_p")
      import s.implicits._
      // the dim predicate must be a literal comparison: Catalyst's DPP
      // rule gates on isLikelySelective, which recognizes `ord = 1` but
      // NOT a bare boolean attribute (BooleanSimplification strips
      // `wanted = true` down to one)
      Seq(("F", 1), ("O", 2), ("P", 3))
        .toDF("status", "ord")
        .write.mode("overwrite").parquet(s"$base/dim_p")
      val fact = s.read.parquet(s"$base/orders_p")
      val dim = s.read.parquet(s"$base/dim_p").filter(col("ord") === 1)
      fact.join(dim, fact("o_orderstatus") === dim("status"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus").cast("string").as("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
            JOIN (SELECT * FROM (VALUES ('F', 1), ('O', 2),
                  ('P', 3)) AS t(status, ord) WHERE ord = 1) dim
              ON o_orderstatus = dim.status
            ORDER BY o_orderkey"""))

  /** Ordered conversion funnel (view → click-after-view →
    * purchase-after-click, each within 7 days of the user's first
    * view): the product-analytics shape where each stage's timestamp
    * must follow the previous stage's. Decorrelates into three keyed
    * aggregates chained by broadcast-friendly user joins — every
    * shuffle is on user_id and carries one timestamp, never event
    * payloads; no window function, no per-user collect. */
  val funnel: GQuery = GQuery(
    "w8_funnel",
    (s, d) => {
      val e = ev(s, d).select(col("user_id"), col("event_type"),
        col("ts_us"))
      val weekUs = 7L * 86400L * 1000000L
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("v_us"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts_us") > col("v_us") &&
          col("ts_us") <= col("v_us") + weekUs)
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("c_us"),
          min(col("v_us")).as("v_us2"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts_us") > col("c_us") &&
          col("ts_us") <= col("v_us2") + weekUs)
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("p_us"))
      v.agg(count(lit(1)).as("n")).select(lit("1_view").as("stage"), col("n"))
        .unionAll(c.agg(count(lit(1)).as("n"))
          .select(lit("2_click").as("stage"), col("n")))
        .unionAll(p.agg(count(lit(1)).as("n"))
          .select(lit("3_purchase").as("stage"), col("n")))
        .orderBy(col("stage"))
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
              FROM events),
            v AS (SELECT user_id, min(ts_us) AS v_us FROM e
              WHERE event_type = 'view' GROUP BY 1),
            c AS (SELECT e.user_id, min(e.ts_us) AS c_us,
                min(v.v_us) AS v_us2
              FROM e JOIN v USING (user_id)
              WHERE event_type = 'click' AND e.ts_us > v.v_us
                AND e.ts_us <= v.v_us + 604800000000
              GROUP BY 1),
            p AS (SELECT e.user_id, min(e.ts_us) AS p_us
              FROM e JOIN c USING (user_id)
              WHERE event_type = 'purchase' AND e.ts_us > c.c_us
                AND e.ts_us <= c.v_us2 + 604800000000
              GROUP BY 1)
            SELECT '1_view' AS stage, count(*) AS n FROM v
            UNION ALL SELECT '2_click', count(*) FROM c
            UNION ALL SELECT '3_purchase', count(*) FROM p
            ORDER BY stage"""))

  /** Time-series downsampling to OHLC bars (the metrics-pipeline
    * resample): one hour × event_type buckets, open/close = value at
    * the lowest/highest event_id in the bucket (arrival order — ids
    * are unique, so the bars are fully deterministic with no
    * composite-key tiebreak needed in either engine), high/low/count,
    * and an exact-cents volume sum. ONE aggregation: min_by/max_by are
    * codegen'd catalyst aggregates, so the plan is a single partial →
    * final hash aggregate on (event_type, hour) — no window sort, one
    * shuffle, map-side combinable at any scale. */
  val timeResample: GQuery = GQuery(
    "w10_time_resample",
    (s, d) => Tables.events(s, d)
      .withColumn("bucket_us",
        unix_micros(date_trunc("hour", col("ts"))))
      .withColumn("v_c", Exact.cents(col("value")))
      .groupBy(col("event_type"), col("bucket_us"))
      .agg(
        count(lit(1)).as("n_events"),
        min_by(col("value"), col("event_id")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("event_id")).as("close"),
        (sum(col("v_c")) / 100.0).as("sum_value"))
      .orderBy(col("event_type"), col("bucket_us")),
    Some(s"""SELECT event_type,
              epoch_us(date_trunc('hour', ts)) AS bucket_us,
              count(*) AS n_events,
              arg_min(value, event_id) AS open,
              max(value) AS high, min(value) AS low,
              arg_max(value, event_id) AS close,
              sum(${Exact.centsSql("value")}) / 100.0 AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Cohort retention matrix: users grouped by first-activity day,
    * counted as retained in each subsequent week they reappear.
    * Calendar-free integer bucketing (epoch-day cohort, integer-divide
    * week offset) keeps both engines bit-identical — date_trunc week
    * conventions never enter. Two keyed shuffles: first-seen per user,
    * then distinct (cohort, offset, user) counting. */
  val retention: GQuery = GQuery(
    "w9_retention",
    (s, d) => {
      val e = ev(s, d).select(col("user_id"),
        expr("ts_us div 86400000000").as("day"))
      val first = e.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      e.join(first, "user_id")
        .select(col("user_id"), col("cohort_day"),
          expr("(day - cohort_day) div 7").as("week_offset"))
        .distinct()
        .groupBy(col("cohort_day"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_day"), col("week_offset"))
    },
    Some("""WITH e AS (SELECT user_id,
              epoch_us(ts) // 86400000000 AS day FROM events),
            f AS (SELECT user_id, min(day) AS cohort_day FROM e
              GROUP BY 1),
            a AS (SELECT DISTINCT e.user_id, f.cohort_day,
                (e.day - f.cohort_day) // 7 AS week_offset
              FROM e JOIN f USING (user_id))
            SELECT cohort_day, week_offset, count(*) AS n_users
            FROM a GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Deterministic integer fixed-point PageRank over the observed
    * customer→supplier trade graph (suppliers offset by 10^6 to keep
    * the id spaces disjoint) — the link-authority prior a web-corpus
    * curation pipeline computes, here with BIGINT micro-unit ranks so
    * fp summation order never enters and the oracle replays the exact
    * recurrence as unrolled CTE generations. Suppliers have no
    * out-edges, so the dangling-mass redistribution path is exercised
    * by construction. */
  val pageRankQ: GQuery = GQuery(
    "g1_pagerank",
    (s, d) => {
      val edges = Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
      graft.operators.PageRank.pageRank(edges, "src", "dst", iters = 3)
    }, {
      val step = (i: Int, prev: String) =>
        s"""d$i AS (SELECT coalesce(sum(rank_micro), 0) AS dang
              FROM $prev LEFT JOIN deg USING (node) WHERE outdeg IS NULL),
            s$i AS (SELECT ed.dst AS node,
                sum(r.rank_micro // deg.outdeg) AS in_sum
              FROM ed JOIN $prev r ON ed.src = r.node
                JOIN deg ON deg.node = ed.src
              GROUP BY ed.dst),
            r$i AS (SELECT n2.node,
                150000 + (850 * (coalesce(s$i.in_sum, 0) +
                  (SELECT dang FROM d$i) // (SELECT n FROM nn))) // 1000
                  AS rank_micro
              FROM nodes n2 LEFT JOIN s$i USING (node))"""
      // ed/nodes/deg are MATERIALIZED: each unrolled iteration names
      // them again, and DuckDB's default CTE inlining re-runs the
      // 60M-row fact join per reference at sf10 (observed: a >70 GB
      // temp spill); pinning them computes the edge set once (~1 GB)
      Some(s"""WITH ed AS MATERIALIZED (SELECT DISTINCT o_custkey AS src,
                l_suppkey + 1000000 AS dst
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            nodes AS MATERIALIZED (SELECT src AS node FROM ed
              UNION SELECT dst FROM ed),
            deg AS MATERIALIZED (SELECT src AS node, count(*) AS outdeg
              FROM ed GROUP BY 1),
            nn AS (SELECT count(*) AS n FROM nodes),
            r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro
              FROM nodes),
            ${step(1, "r0")},
            ${step(2, "r1")},
            ${step(3, "r2")}
            SELECT node, CAST(rank_micro AS BIGINT) AS rank_micro
            FROM r3 ORDER BY node""")
    })

  /** A20: ranking-function trio — ntile quartiles, percent_rank and
    * cume_dist per market segment ordered by (acctbal, custkey). The
    * two ratio functions are IEEE divisions of identical exact integer
    * operands in both engines, scaled ×10⁶ and floored to BIGINT so the
    * hash compare never touches float formatting. One shuffle on the
    * partition key serves all three. */
  val rankingTrio: GQuery = GQuery(
    "a20_ranking_trio",
    (s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank_ppm",
          floor(percent_rank().over(w) * 1000000L).cast("long"))
        .withColumn("cume_ppm",
          floor(cume_dist().over(w) * 1000000L).cast("long"))
        .orderBy(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
    },
    Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
              CAST(ntile(4) OVER w AS BIGINT) AS quartile,
              CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT)
                AS pct_rank_ppm,
              CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT)
                AS cume_ppm
            FROM customer
            WINDOW w AS (PARTITION BY c_mktsegment
              ORDER BY c_acctbal, c_custkey)
            ORDER BY c_mktsegment, c_acctbal, c_custkey"""))

  /** J12: FULL OUTER join with key coalescing — early-era vs late-era
    * per-customer order counts, keys surviving from EITHER side (the
    * one join shape no other gate exercises; Spark's Seq-key join form
    * coalesces the key columns exactly as the oracle's USING does).
    * -1 sentinels keep the nullable int64 columns exact. */
  val fullOuter: GQuery = GQuery(
    "j12_full_outer",
    (s, d) => {
      val o = Tables.orders(s, d)
      val early = o.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("early_cnt"))
      val late = o.filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("late_cnt"))
      early.join(late, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("early_cnt"), lit(-1L)).as("early_cnt"),
          coalesce(col("late_cnt"), lit(-1L)).as("late_cnt"))
        .orderBy(col("o_custkey"))
    },
    Some("""WITH e AS (SELECT o_custkey, count(*) AS early_cnt FROM orders
              WHERE o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1),
            l AS (SELECT o_custkey, count(*) AS late_cnt FROM orders
              WHERE o_orderdate >= TIMESTAMP '2000-01-01' GROUP BY 1)
            SELECT o_custkey,
              coalesce(early_cnt, -1) AS early_cnt,
              coalesce(late_cnt, -1) AS late_cnt
            FROM e FULL OUTER JOIN l USING (o_custkey)
            ORDER BY o_custkey"""))

  val all: Seq[GQuery] = Seq(sessionize, percentiles, approxPercentiles,
    rollupQ, cubeQ, pivot, rangeJoin, skewJoin, groupingSetsQ, windowFrames,
    dppJoin, intervalOverlap, funnel, retention, pageRankQ, timeResample,
    rankingTrio, fullOuter)
}
