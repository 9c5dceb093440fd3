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

  test("lateRows flags exactly the closed-history violations; Fail aborts, " +
      "applyDeltaFromRaw heals") {
    // stored history for k=1: A@[10,30) B@[30,∞); the batch carries one
    // row inside the CLOSED interval (ts=20), one on the open run
    // (ts=40), one for a fresh key
    val cur = dim(Seq((1L, "A", 10L, 100L), (1L, "B", 30L, 101L)))
    val delta = Seq((1L, "C", 20L, 200L), (1L, "C", 40L, 201L),
      (2L, "X", 5L, 202L)).toDF("k", "attr", "ts", "id")
    val late = Scd.lateRows(cur, delta, Seq("k"), "ts")
      .select("id").as[Long].collect().toSeq
    assert(late == Seq(200L), s"exactly the ts=20 row is late: $late")
    val e = intercept[IllegalArgumentException] {
      Scd.applyDelta(cur, delta, Seq("k"), Seq("attr"), "ts", "id",
        onLate = Scd.LatePolicy.Fail).count()
    }
    assert(e.getMessage.contains("closed SCD2 history"), e.getMessage)
    // the raw-feed path folds the same batch exactly
    val raw = Seq((1L, "A", 10L, 100L), (1L, "B", 30L, 101L))
      .toDF("k", "attr", "ts", "id")
    val healed = Scd.applyDeltaFromRaw(cur, delta, raw,
      Seq("k"), Seq("attr"), "ts", "id")
    val want = Scd.scd2(raw.unionByName(delta),
      Seq("k"), Seq("attr"), "ts", "id")
    assert(healed.except(want).isEmpty && want.except(healed).isEmpty)
    // a NULL ts sorts FIRST under scd2's orderBy(ts, id) — the very
    // start of closed history, the exact class Fail exists to catch —
    // so it must be flagged, not sail through a null-unsafe compare
    val nullTs = Seq((1L, "Z", null.asInstanceOf[java.lang.Long], 300L))
      .toDF("k", "attr", "ts", "id")
    val lateNull = Scd.lateRows(cur, nullTs, Seq("k"), "ts")
      .select("id").as[Long].collect().toSeq
    assert(lateNull == Seq(300L), s"null ts must be flagged late: $lateNull")
  }

  test("late row inside a COLLAPSED run: the change-point fast path is " +
      "provably wrong there and the raw path is exact — why both exist") {
    // raw history for k=1: A@10, A@20 (collapses into A's run), so the
    // stored dimension is just A@[10,∞). A late B@15 must split it into
    // A@[10,15) B@[15,20) A@[20,∞) — the collapsed A@20 observation has
    // to REOPEN, which only the raw feed still witnesses
    val raw = Seq((1L, "A", 10L, 100L), (1L, "A", 20L, 101L))
      .toDF("k", "attr", "ts", "id")
    val cur = Scd.scd2(raw, Seq("k"), Seq("attr"), "ts", "id")
    val delta = Seq((1L, "B", 15L, 200L)).toDF("k", "attr", "ts", "id")
    val want = asTuples(Scd.scd2(raw.unionByName(delta),
      Seq("k"), Seq("attr"), "ts", "id"))
    assert(want.map(t => (t._2, t._4)) == Seq(("A", 10L), ("B", 15L), ("A", 20L)))
    val fromRaw = asTuples(Scd.applyDeltaFromRaw(cur, delta, raw,
      Seq("k"), Seq("attr"), "ts", "id"))
    assert(fromRaw == want)
    val fast = asTuples(Scd.applyDelta(cur, delta,
      Seq("k"), Seq("attr"), "ts", "id"))
    assert(fast != want, "if the fast path ever heals this, lateRows and " +
      "the raw path are dead weight — revisit the contract")
  }

  test("randomized out-of-order differential: applyDeltaFromRaw folds == " +
      "scd2 over the full feed, any delivery order") {
    for (seed <- 0 until 6) {
      val rnd = new scala.util.Random(seed)
      // feed: 12 keys × ~25 observations, 3 attr values (collapse-heavy),
      // ts collisions on purpose (ties broken by unique id)
      val feed = (0 until 300).map { i =>
        (rnd.nextInt(12).toLong, s"v${rnd.nextInt(3)}",
          rnd.nextInt(40).toLong, i.toLong)
      }
      val full = Scd.scd2(feed.toDF("k", "attr", "ts", "id"),
        Seq("k"), Seq("attr"), "ts", "id")
      // deliver in a SHUFFLED order, split into random batches
      val shuffled = rnd.shuffle(feed)
      val batches = {
        var rest = shuffled
        val out = Seq.newBuilder[Seq[(Long, String, Long, Long)]]
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(80)
          out += rest.take(n); rest = rest.drop(n)
        }
        out.result()
      }
      assert(batches.size > 1)
      var cur = Scd.scd2(batches.head.toDF("k", "attr", "ts", "id"),
        Seq("k"), Seq("attr"), "ts", "id")
      var delivered = batches.head
      for (b <- batches.tail) {
        cur = Scd.applyDeltaFromRaw(cur, b.toDF("k", "attr", "ts", "id"),
          delivered.toDF("k", "attr", "ts", "id"),
          Seq("k"), Seq("attr"), "ts", "id")
        delivered = delivered ++ b
      }
      assert(asTuples(cur) == asTuples(full),
        s"seed=$seed: out-of-order fold diverged from the full rebuild")
    }
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
