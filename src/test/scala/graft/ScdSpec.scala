package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.Scd

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def dim(rows: Seq[(Long, String, Long, Long)]) =
    Scd.scd2(rows.toDF("k", "attr", "ts", "id"),
      Seq("k"), Seq("attr"), "ts", "id")

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k", "valid_from", "change_id")
      .collect().map { r: Row =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5))
      }.toSeq

  test("scd2 collapses runs and assigns half-open validity intervals") {
    val out = asTuples(dim(Seq(
      (1L, "A", 10L, 100L), (1L, "A", 20L, 101L), // collapsed dup
      (1L, "B", 30L, 102L), (1L, "A", 40L, 103L), // A reopens: new run
      (2L, "X", 5L, 104L))))
    assert(out == Seq(
      (1L, "A", 100L, 10L, Some(30L), false),
      (1L, "B", 102L, 30L, Some(40L), false),
      (1L, "A", 103L, 40L, None, true),
      (2L, "X", 104L, 5L, None, true)))
  }

  test("equal-ts changes order by id; first gets a zero-length interval") {
    val out = asTuples(dim(Seq(
      (1L, "A", 10L, 100L), (1L, "B", 10L, 101L))))
    assert(out == Seq(
      (1L, "A", 100L, 10L, Some(10L), false),
      (1L, "B", 101L, 10L, None, true)))
  }

  test("null attribute values compare null-safely across runs") {
    val rows = Seq[(Long, Option[String], Long, Long)](
      (1L, None, 10L, 100L), (1L, None, 20L, 101L), // null==null: one run
      (1L, Some("A"), 30L, 102L), (1L, None, 40L, 103L))
    val out = Scd.scd2(rows.toDF("k", "attr", "ts", "id"),
      Seq("k"), Seq("attr"), "ts", "id")
      .orderBy("valid_from").select("attr", "valid_from").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toSeq
    assert(out == Seq((None, 10L), (Some("A"), 30L), (None, 40L)))
  }

  test("applyDelta over an appended feed equals a full rebuild") {
    // orders split by date: first 4 years are the standing dimension,
    // the rest arrive as a CDC batch — every key's delta rows are
    // at-or-after its last change point (the documented contract)
    val feed = Tables.orders(spark, sf).select(
      col("o_custkey").as("k"), col("o_orderpriority").as("attr"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("ts"),
      col("o_orderkey").as("id"))
    val cut = lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")
      .toInstant.getEpochSecond * 1000000L)
    val early = feed.where(col("ts") < cut)
    val late = feed.where(col("ts") >= cut)
    assert(late.count() > 0 && early.count() > 0)
    val full = Scd.scd2(feed, Seq("k"), Seq("attr"), "ts", "id")
    val incr = Scd.applyDelta(
      Scd.scd2(early, Seq("k"), Seq("attr"), "ts", "id"),
      late, Seq("k"), Seq("attr"), "ts", "id")
    assert(incr.except(full).isEmpty && full.except(incr).isEmpty)
    // untouched keys must not re-enter a window: their rows pass through
    val touched = late.select("k").distinct().collect().map(_.getLong(0)).toSet
    val untouchedCur = incr.where(!col("k").isin(touched.toSeq: _*))
    val untouchedFull = full.where(!col("k").isin(touched.toSeq: _*))
    assert(untouchedCur.except(untouchedFull).isEmpty)
  }

  test("snapshotAt returns exactly the rows valid at the instant") {
    val d = dim(Seq((1L, "A", 10L, 100L), (1L, "B", 30L, 101L)))
    def at(ts: Long) = Scd.snapshotAt(d, lit(ts))
      .select("attr").collect().map(_.getString(0)).toSeq
    assert(at(9L) == Seq.empty)
    assert(at(10L) == Seq("A"))
    assert(at(29L) == Seq("A"))
    assert(at(30L) == Seq("B"))
    assert(at(1000L) == Seq("B"))
  }

  test("plan: scd2 is a single shuffle — the second window pass reuses " +
    "the first's hash partitioning") {
    val feed = Tables.orders(spark, sf).select(
      col("o_custkey").as("k"), col("o_orderpriority").as("attr"),
      col("o_orderdate").as("ts"), col("o_orderkey").as("id"))
    // AQE off for the assertion: EnsureRequirements-inserted exchanges
    // are only visible in a non-adaptive executedPlan
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try Scd.scd2(feed, Seq("k"), Seq("attr"), "ts", "id")
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1,
      s"expected one exchange, got ${shuffles.size}:\n$plan")
    val sorts = plan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }
    assert(sorts.size == 1, // the filter preserves the first pass's order
      s"expected one sort, got ${sorts.size}:\n$plan")
  }
}
