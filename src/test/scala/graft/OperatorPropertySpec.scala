package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Scd
import graft.text.InvertedIndex

/** Randomized differentials for the round-10 operators: SCD2 against a
  * driver-side reference fold, applyDelta against full rebuilds on
  * random split points, and phrase search against brute-force sliding
  * windows over random small-alphabet documents. ScalaCheck generators
  * driven directly with fixed seeds (PropertySpec's house pattern), a
  * handful of LARGE samples rather than hundreds of tiny Spark jobs. */
class OperatorPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long, size: Int = 90): A = {
    var s = Seed(seed)
    var out: Option[A] = None
    while (out.isEmpty) { // retry-on-discard, deterministic walk
      out = gen.apply(Gen.Parameters.default.withSize(size), s)
      s = s.next
    }
    out.get
  }

  // (key, attr, ts, id) with duplicate (key, ts) pairs possible — ids
  // unique so ordering stays total
  private val feedGen: Gen[List[(Long, String, Long)]] =
    Gen.listOfN(1500, Gen.zip(
      Gen.chooseNum(1L, 40L), Gen.oneOf("A", "B", "C"),
      Gen.chooseNum(0L, 60L)))

  /** Driver-side SCD2 reference: sort per key, drop rows equal to their
    * immediate predecessor's attr, interval-chain the survivors. */
  private def refScd2(rows: Seq[(Long, String, Long, Long)])
      : Set[(Long, String, Long, Long, Option[Long], Boolean)] =
    rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._4))
      val kept = sorted.zip(None +: sorted.map(Some(_)))
        .collect { case (r, prev) if !prev.exists(_._2 == r._2) => r }
      kept.zipWithIndex.map { case ((_, a, ts, id), i) =>
        val vt = if (i + 1 < kept.length) Some(kept(i + 1)._3) else None
        (k, a, id, ts, vt, vt.isEmpty)
      }
    }.toSet

  private def runScd2(rows: Seq[(Long, String, Long, Long)]) =
    Scd.scd2(rows.toDF("k", "attr", "ts", "id"),
      Seq("k"), Seq("attr"), "ts", "id")

  private def collectDim(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5))
    }.toSet

  test("random feeds: scd2 == driver reference fold (5 seeds × 1500 rows)") {
    for (seed <- 1L to 5L) {
      val rows = sample(feedGen, seed).zipWithIndex
        .map { case ((k, a, ts), i) => (k, a, ts, 1000L + i) }
      val got = collectDim(runScd2(rows))
      val want = refScd2(rows)
      assert(got == want, s"seed $seed: ${got.diff(want).take(3)} vs " +
        s"${want.diff(got).take(3)}")
      // structural invariants: per key, intervals chain and exactly one
      // current row
      got.groupBy(_._1).foreach { case (k, g) =>
        val sorted = g.toSeq.sortBy(r => (r._4, r._3))
        sorted.sliding(2).foreach {
          case Seq(a, b) =>
            assert(a._5.contains(b._4), s"seed $seed key $k: gap/overlap")
            assert(a._2 != b._2 || a._4 == b._4, // equal-ts runs may tie
              s"seed $seed key $k: adjacent equal runs not collapsed")
          case _ =>
        }
        assert(g.count(_._6) == 1, s"seed $seed key $k: current != 1")
        assert(g.filter(_._6).head._5.isEmpty)
      }
    }
  }

  test("random monotone splits: applyDelta == full rebuild (5 seeds)") {
    for (seed <- 11L to 15L) {
      val rows = sample(feedGen, seed).zipWithIndex
        .map { case ((k, a, ts), i) => (k, a, ts, 1000L + i) }
      val cut = sample(Gen.chooseNum(10L, 50L), seed * 7)
      // monotone contract: the delta holds every row with ts >= cut —
      // per key all delta rows are at-or-after the standing history
      val (early, late) = rows.partition(_._3 < cut)
      if (early.nonEmpty && late.nonEmpty) {
        val full = collectDim(runScd2(rows))
        val incr = collectDim(Scd.applyDelta(
          runScd2(early), late.toDF("k", "attr", "ts", "id"),
          Seq("k"), Seq("attr"), "ts", "id"))
        assert(incr == full, s"seed $seed cut $cut diverged")
      }
    }
  }

  test("random instants: snapshotAt == driver point-in-time lookup (3 seeds)") {
    for (seed <- 31L to 33L) {
      val rows = sample(feedGen, seed).zipWithIndex
        .map { case ((k, a, ts), i) => (k, a, ts, 1000L + i) }
      val dim = runScd2(rows)
      val ref = refScd2(rows)
      for (t <- Seq(-1L, 0L, 7L, 30L, 60L, 99L)) {
        val got = Scd.snapshotAt(dim, lit(t))
          .select("k", "attr").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
        val want = ref.filter(r =>
          r._4 <= t && r._5.forall(_ > t)).map(r => (r._1, r._2))
        assert(got == want, s"seed $seed asOf $t diverged")
      }
    }
  }

  test("random docs: phrase + multi-phrase == brute-force windows") {
    val docGen = Gen.listOfN(300,
      Gen.chooseNum(0, 12).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))
    val phraseGen = Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
    for (seed <- 21L to 23L) {
      val docs = sample(docGen, seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val phrases = (1 to 4).map(i => sample(phraseGen, seed * 31 + i))
        .distinct
      val idx = InvertedIndex.postings(
        docs.toDF("doc_id", "text"), "text", "doc_id")
      val got = InvertedIndex.multiPhraseSearch(idx, phrases)
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = phrases.zipWithIndex.flatMap { case (p, pid) =>
        val toks = InvertedIndex.queryTokens(p)
        docs.flatMap { case (id, text) =>
          val ts = text.split("\\s+").filter(_.nonEmpty)
          val anchors = (0 to ts.length - toks.length)
            .filter(a => toks.indices.forall(j => ts(a + j) == toks(j)))
          if (anchors.isEmpty) None
          else Some((id, pid.toLong, anchors.size.toLong,
            anchors.min.toLong))
        }
      }.toSet
      assert(got == want, s"seed $seed phrases $phrases: " +
        s"${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
      assert(want.nonEmpty, s"seed $seed produced no matches at all")
    }
  }
}
