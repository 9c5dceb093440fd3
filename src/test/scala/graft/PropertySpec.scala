package graft

import graft.functions.{RefUdfs, ScalarFunctions => F}
import graft.expressions.TextKernels
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5 plan): totality and invariants of the
  * scalar/text kernels — driver-side where the function is pure JVM,
  * one vectorized Spark pass for the Column forms. ScalaCheck
  * generators driven directly (no scalatestplus bridge in the offline
  * cache) with a fixed seed for reproducibility. */
class PropertySpec extends AnyFunSuite {

  /** 300 deterministic samples of a generator. */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (1 to 300).foreach { i =>
      gen.apply(Gen.Parameters.default.withSize(i % 100), seed)
        .foreach(f)
      seed = seed.next
    }
  }
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb)) { case (a, b) => f(a, b) }
  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  test("py3g/%.3g formatting is total and 3-significant") {
    forAll(Gen.chooseNum(0.001, 9.99e6)) { (v: Double) =>
      val s = RefUdfs.py3g(v)
      assert(s.nonEmpty)
      val digits = s.takeWhile(_ != 'e').filter(_.isDigit).dropWhile(_ == '0')
      assert(digits.length <= 3) // never more than 3 significant digits
    }
    assert(RefUdfs.formatDistance(Some(0.0)) == "0 m")
  }

  test("french duration is total and uses plural only above 1") {
    forAll(Gen.chooseNum(0L, 10_000_000L)) { (s: Long) =>
      val out = RefUdfs.frenchDuration(s)
      assert(out.nonEmpty)
      if (s < 60) assert(out == "quelques secondes")
      else assert(
        !"(?<!\\d)1 (jours|heures|minutes)".r.unanchored.matches(out),
        s"bare '1' with plural unit in: $out")
    }
  }

  test("tokenize kernel: no empties, lowercase, order-preserving") {
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(" "),
      Gen.const("\t"), Gen.const("\n"))).map(_.mkString)) { (s: String) =>
      val toks = TextKernels.tokenize(UTF8String.fromString(s))
      assert(toks.forall(t => t.nonEmpty && t == t.toLowerCase))
      // idempotent on its own output
      val re = TextKernels.tokenize(UTF8String.fromString(toks.mkString(" ")))
      assert(re.sameElements(toks))
    }
  }

  test("polynomial hash: deterministic, in range, order-sensitive") {
    val mod = 1000000007L
    def h(s: String) = {
      var acc = 0L
      s.codePoints().forEach(cp => acc = (acc * 31 + cp) % mod)
      acc
    }
    forAll2(Gen.alphaNumStr, Gen.alphaNumStr) { (a: String, b: String) =>
      assert(h(a) >= 0 && h(a) < mod)
      assert(h(a) == h(a))
      whenever(a != b && a.length == b.length && a.nonEmpty) {
        // (not a theorem, but collisions at these lengths would signal
        // a broken fold; alphaNum strings ≤ ~30 chars)
        assert(h(a + b) != h(b + a) || (a + b) == (b + a))
      }
    }
  }

  test("commuteLong flag is monotone in distance") {
    lazy val spark = SparkSpec.session
    import spark.implicits._
    val dists = (0 to 60 by 5).map(_.toDouble)
    val rows = for (m <- Seq("Marche/running", "Vélo/Trottinette/Autres",
      "Voiture/Moto"); d <- dists) yield (m, d)
    val got = rows.toDF("mode", "dist")
      .select($"mode", $"dist", F.commuteLong($"mode", $"dist").as("f"))
      .as[(String, Double, Boolean)].collect()
    got.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2).map(_._3)
      // once true, stays true as distance grows
      assert(!sorted.zip(sorted.tail).exists { case (a, b) => a && !b })
    }
  }

  test("approx_count_distinct within 5% of exact on lineitem") {
    lazy val spark = SparkSpec.session
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val r = li.agg(
      approx_count_distinct(col("l_partkey")).as("a"),
      countDistinct(col("l_partkey")).as("e")).head
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05)
  }

  test("moneySum is exact on planted half-cent boundary values") {
    // the round-1 x3 failure class: fp summation order flips the cent at
    // a .xx5 boundary. 0.05 and 0.15 are not representable doubles, and
    // sums of many of them land within one ulp of a half-cent — the
    // exact case where round(sum(double),2) is engine-dependent.
    lazy val spark = SparkSpec.session
    import spark.implicits._
    val planted = Seq.fill(1000)(Seq(0.05, 0.15, 0.25, 1.005 - 0.005))
      .flatten ++ Seq(0.01, 0.02, 0.04) // break the symmetry
    val df = planted.toDF("v").repartition(7) // force partial-agg merges
    val got = df.agg(queries.Exact.moneySum($"v").as("s")).head.getDouble(0)
    val wantCents = planted.map(v => math.round(v * 100)).sum
    assert(got == wantCents / 100.0) // exact double equality
  }

  test("moneySum == BigDecimal ground truth on random 2-decimal values") {
    lazy val spark = SparkSpec.session
    import spark.implicits._
    val gen = Gen.chooseNum(-999999L, 999999L) // cents, ±$10k
    val cents = scala.collection.mutable.ArrayBuffer.empty[Long]
    forAll(gen)(c => cents += c)
    val vals = cents.map(c => c.toDouble / 100.0).toSeq
    val df = vals.toDF("v").repartition(5)
    val got = df.agg(queries.Exact.moneySum($"v").as("s")).head.getDouble(0)
    val want = (BigDecimal(cents.sum) / 100).toDouble
    assert(got == want)
  }

  test("roundDiv matches BigDecimal HALF_UP on random rationals, any sign") {
    lazy val spark = SparkSpec.session
    import spark.implicits._
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    forAll2(Gen.chooseNum(-1000000000L, 1000000000L),
      Gen.chooseNum(1L, 100000L))((p, q) => pairs += ((p, q)))
    // include exact half-way points of both signs
    pairs ++= Seq((5L, 10L), (-5L, 10L), (15L, 10L), (-15L, 10L),
      (251L, 502L), (-251L, 502L), (Long.MaxValue / 4, 3L))
    val df = pairs.toSeq.toDF("p", "q")
    val got = df.select($"p", $"q",
      queries.Exact.roundDiv($"p", $"q").as("r")).as[(Long, Long, Long)]
      .collect()
    got.foreach { case (p, q, r) =>
      val want = BigDecimal(p)
        .bigDecimal.divide(java.math.BigDecimal.valueOf(q), 0,
          java.math.RoundingMode.HALF_UP).longValueExact()
      assert(r == want, s"roundDiv($p, $q) = $r, want $want")
    }
  }
}
