package graft

import graft.similarity.VectorFunctions._
import org.apache.spark.sql.functions._

/** ANN semantics: brute force is the gold ranking; LSH and IVF are
  * approximations whose results must be internally consistent and
  * bounded by it. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val e = Tables.embeddings(spark, sf)
  lazy val queries = e.filter(col("vec_id") < 5)

  test("brute-force top-k: ranks are dense and sims non-increasing") {
    val got = bruteForceTopK(e, queries, k = 10)
      .select($"query_id", $"rank", $"sim").as[(Long, Int, Double)]
      .collect().groupBy(_._1)
    assert(got.size == 5)
    got.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1 to 10))
      assert(sorted.sliding(2).forall(p => p(0)._3 >= p(1)._3))
    }
  }

  test("IVF results are a subset-ranking bounded by brute force") {
    val brute = bruteForceTopK(e, queries, k = 10)
      .groupBy($"query_id").agg(max($"sim").as("best"))
      .as[(Long, Double)].collect().toMap
    val ivf = ivfTopK(e, queries, e.filter(col("vec_id") < 16),
      k = 5, nprobe = 2)
      .select($"query_id", $"rank", $"sim").as[(Long, Int, Double)].collect()
    assert(ivf.nonEmpty)
    // approximate search can never beat the exact best
    ivf.foreach { case (q, _, sim) => assert(sim <= brute(q)) }
    // every probed centroid's own assignment is itself (self-similarity 1)
    val asg = ivfAssign(e, e.filter(col("vec_id") < 16))
      .filter($"vec_id" < 16)
      .select($"vec_id", $"centroid_id").as[(Long, Long)].collect()
    assert(asg.forall { case (v, c) => v == c })
  }

  test("LSH bucket join candidates all share the exact code") {
    val withCode = e.select($"vec_id",
      lshCode($"embedding", 8, 64).as("b")).as[(Long, Long)].collect()
    assert(withCode.map(_._2).distinct.length > 1) // codes spread
    assert(withCode.forall { case (_, b) => b >= 0 && b < 256 })
  }

  test("quantizedTopK: dense ranks, sims non-increasing, exact re-rank wins") {
    val out = quantizedTopK(e, e.filter($"vec_id" < 2), kCand = 10, k = 4)
      .select($"query_id", $"rank", $"neighbor_id", $"sim")
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(out.keySet == Set(0L, 1L))
    out.values.foreach { rows =>
      assert(rows.map(_._2).toSeq == Seq(1, 2, 3, 4)) // dense ranks
      assert(rows.map(_._4).toSeq == rows.map(_._4).sortBy(-_).toSeq)
      assert(rows.forall(r => r._3 != r._1)) // self excluded
    }
  }

  test("shard invariance: every search path gives identical results for any shard count") {
    // the two-phase shard-bounded ranking must be a pure implementation
    // detail: shards=1 (the naive single window) and any other count
    // produce the same rows in the same rank order
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"rank", $"neighbor_id", $"sim")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(rows(bruteForceTopK(e, queries, k = 7, shards = 1)) ==
      rows(bruteForceTopK(e, queries, k = 7, shards = 13)))
    assert(rows(lshTopK(e, queries, k = 5, 8, 64, shards = 1)) ==
      rows(lshTopK(e, queries, k = 5, 8, 64, shards = 13)))
    val cents = e.filter(col("vec_id") < 16)
    assert(rows(ivfTopK(e, queries, cents, k = 5, nprobe = 2, shards = 1)) ==
      rows(ivfTopK(e, queries, cents, k = 5, nprobe = 2, shards = 13)))
    val cbs = pqTrain(e, m = 4, ksub = 16, iters = 0, dim = 64)
    val codes = pqEncode(e, cbs, m = 4, ksub = 16, dim = 64)
    assert(rows(pqAdcTopK(codes, queries, cbs, 4, 16, 64, k = 5,
        shards = 1)) ==
      rows(pqAdcTopK(codes, queries, cbs, 4, 16, 64, k = 5, shards = 13)))
    assert(rows(ivfPqTopK(e, queries, cents, cbs, 4, 16, 64, k = 5,
        nprobe = 2, shards = 1)) ==
      rows(ivfPqTopK(e, queries, cents, cbs, 4, 16, 64, k = 5,
        nprobe = 2, shards = 13)))
  }

  test("storedQuantizedTopK: identical results to the inline quantized search") {
    // the persisted index is a storage optimization only — searching
    // codes written to disk must reproduce the inline pipeline exactly
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_idx_spec").toString
    val index = new graft.io.ManagedParquetTable(spark, idxDir)
    index.overwrite(buildQuantizedIndex(e))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"rank", $"neighbor_id", $"sim", $"code_dot")
        .as[(Long, Int, Long, Double, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    val stored = rows(storedQuantizedTopK(index.read(), e,
      e.filter($"vec_id" < 2), kCand = 10, k = 4))
    val inline = rows(quantizedTopK(e, e.filter($"vec_id" < 2),
      kCand = 10, k = 4))
    assert(stored == inline && stored.nonEmpty)
  }

  test("quantizeU8 round-trip: codes in range, error <= scale/2, constants") {
    val vecs = Seq(
      (1L, Array(0.0f, 0.5f, 1.0f, -1.0f)),
      (2L, Array(0.25f, 0.25f, 0.25f, 0.25f)), // constant → all-zero codes
      (3L, Array(-0.1f, 0.9f, 0.3f, 0.0f))).toDF("vec_id", "embedding")
    val q = quantizeU8($"embedding")
    val rows = vecs.select($"vec_id", q.as("q"),
      dequantizeU8(q).as("r"),
      transform($"embedding", x => x.cast("double")).as("dv"))
      .select($"vec_id", $"q.codes", $"q.vmin", $"q.vmax", $"r", $"dv")
      .as[(Long, Seq[Int], Double, Double, Seq[Double], Seq[Double])]
      .collect().sortBy(_._1)
    val (_, c1, mn1, mx1, r1, dv1) = rows(0)
    assert(c1 == Seq(128, 191, 255, 0) && mn1 == -1.0 && mx1 == 1.0)
    val scale1 = (mx1 - mn1) / 255.0
    assert(r1.zip(dv1).forall { case (r, x) => math.abs(r - x) <= scale1 / 2 + 1e-12 })
    val (_, c2, _, _, r2, _) = rows(1)
    assert(c2 == Seq(0, 0, 0, 0) && r2.forall(_ == 0.25f.toDouble))
    val (_, c3, _, _, r3, dv3) = rows(2)
    assert(c3.forall(c => c >= 0 && c <= 255) && c3.max == 255 && c3.min == 0)
    val scale3 = 1.0 / 255.0
    assert(r3.zip(dv3).forall { case (r, x) => math.abs(r - x) <= scale3 / 2 + 1e-9 })
  }

  test("kmeansFit recovers planted clusters; empty centroid keeps its seat") {
    // two tight clusters around orthogonal axes (cosine-separable)
    val rows = (0 until 20).map { i =>
      val v = if (i % 2 == 0) Seq(1.0f, 0.02f * i, 0f, 0f)
      else Seq(0f, 0f, 1.0f, 0.02f * i)
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val fit = kmeansFit(df, k = 2, iters = 3)
      .select("centroid_id", "centroid")
      .as[(Long, Seq[Double])].collect().toMap
    assert(fit.keySet == Set(0L, 1L)) // init ids = two lowest vec_ids
    // each centroid should be dominated by its cluster's axis
    val c0 = fit(0L); val c1 = fit(1L)
    assert(c0(0) > 0.9 && c0(2) < 0.1, s"c0=$c0")
    assert(c1(2) > 0.9 && c1(0) < 0.1, s"c1=$c1")
    // k=3 over the same 2-cluster data: the orphaned centroid must
    // keep its initial position, not vanish or go to NaN
    val fit3 = kmeansFit(df, k = 3, iters = 2)
      .select("centroid_id", "centroid")
      .as[(Long, Seq[Double])].collect().toMap
    assert(fit3.size == 3)
    assert(fit3.values.forall(_.forall(x => !x.isNaN)))
    // zero iterations = the init itself
    val fit0 = kmeansFit(df, k = 2, iters = 0)
      .select("centroid_id", "centroid")
      .as[(Long, Seq[Double])].collect().toMap
    assert(fit0(0L) == rows(0)._2.map(_.toDouble))
  }

  test("semanticDedup drops within-cluster near-dups, keeps min id") {
    val corpus = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0.99f, 0.1f, 0f, 0f)),  // ~cos 0.995 with 0 → dropped
      (2L, Seq(0f, 0f, 1f, 0f)),
      (3L, Seq(0f, 0f, 0.9f, 0.1f)),   // ~cos 0.993 with 2 → dropped
      (4L, Seq(0.7f, 0f, 0.7f, 0f))    // cos 0.707 to both axes → kept
    ).toDF("vec_id", "embedding")
    val cents = Seq(
      (100L, Seq(1f, 0f, 0f, 0f)),
      (101L, Seq(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val kept = semanticDedup(corpus, cents, threshold = 0.98)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(0L, 2L, 4L)))
    // threshold above every pair sim → nothing dropped
    assert(semanticDedup(corpus, cents, threshold = 0.999).count() == 5)
  }

  test("PQ: codes index the codebook; ADC ranks codebook-exact vectors exactly") {
    // dim 8, m=2 subspaces of 4; iters=0 → codebook = sub-vectors of the
    // two lowest-id vectors; subspace-orthogonal construction
    val corpus = Seq(
      (0L, Seq(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f, 0f, 1f, 0f, 0f, 0f)),
      (2L, Seq(2f, 0f, 0f, 0f, 0f, 2f, 0f, 0f)), // codes [0,0] (clone dir of 0)
      (3L, Seq(0f, 2f, 0f, 0f, 2f, 0f, 0f, 0f)), // codes [1,1]
      (4L, Seq(1f, 0.1f, 0f, 0f, 0.1f, 1f, 0f, 0f)), // ≈0 → [0,0]
      (5L, Seq(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f))  // sub0→0, sub1→1
    ).toDF("vec_id", "embedding")
    val cbs = pqTrain(corpus, m = 2, ksub = 2, iters = 0, dim = 8)
    val cb = cbs.select("sub", "code", "centroid")
      .as[(Int, Int, Seq[Double])].collect()
    assert(cb.length == 4 && cb.forall(c => c._2 == 0 || c._2 == 1))
    // code c of subspace s is the sub-vector of init vector c
    assert(cb.toSeq.sortBy(c => (c._1, c._2)).map(_._3) == Seq(
      Seq(1.0, 0, 0, 0), Seq(0.0, 1, 0, 0),   // sub 0: vec0, vec1
      Seq(0.0, 1, 0, 0), Seq(1.0, 0, 0, 0)))  // sub 1: vec0, vec1
    val codes = pqEncode(corpus, cbs, m = 2, ksub = 2, dim = 8)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(codes(0L) == Seq(0, 0) && codes(1L) == Seq(1, 1))
    assert(codes(2L) == Seq(0, 0) && codes(3L) == Seq(1, 1))
    assert(codes(4L) == Seq(0, 0) && codes(5L) == Seq(0, 1))
    // ADC scores for query 0: codes [0,0] → 2.0, [0,1] → 1.0, [1,1] → 0.0
    val top = pqAdcTopK(
      pqEncode(corpus, cbs, 2, 2, 8), corpus.filter($"vec_id" === 0),
      cbs, m = 2, ksub = 2, dim = 8, k = 5)
      .select("rank", "neighbor_id", "sim")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(top.map(_._2).take(3).sameElements(Array(2L, 4L, 5L)))
    assert(top.head._3 == 2.0 && top(2)._3 == 1.0)
  }

  test("quantized index lifecycle: incremental append equals full rebuild") {
    import graft.io.ManagedParquetTable
    val dir = java.nio.file.Files
      .createTempDirectory("graft_qidx").toString + "/idx"
    val first = e.filter($"vec_id" < 300)
    val delta = e.filter($"vec_id" >= 300 && $"vec_id" < 400)
    val both = e.filter($"vec_id" < 400)
    val t = new ManagedParquetTable(spark, dir)
    t.overwrite(buildQuantizedIndex(first))
    // daily ingest: quantize ONLY the new vectors, append to the index
    t.append(buildQuantizedIndex(delta))
    val queries = e.filter($"vec_id" < 3)
    def rows(idx: org.apache.spark.sql.DataFrame) =
      storedQuantizedTopK(idx, both, queries, kCand = 20, k = 5)
        .select($"query_id", $"rank", $"neighbor_id", $"sim")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
        .toSeq
    assert(rows(t.read()) == rows(buildQuantizedIndex(both)),
      "incrementally-maintained index must search identically to a rebuild")
  }

  test("IncrementalVectorIndex: change-feed maintenance is exactly rebuild-equivalent") {
    import graft.io.ManagedParquetTable
    import graft.similarity.IncrementalVectorIndex
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivi").toString
    val src = new ManagedParquetTable(spark, s"$root/t")
    val idx = new IncrementalVectorIndex(spark, s"$root/t", s"$root/idx")
    src.append(e.filter($"vec_id" % 2 === 0))
    idx.refresh()
    assert(idx.lastRefresh == "full")
    src.append(e.filter($"vec_id" % 2 === 1))
    idx.refresh()
    assert(idx.lastRefresh == "incremental")
    idx.refresh()
    assert(idx.lastRefresh == "noop")
    // dv delete and a scattered rewriting delete both maintain
    src.deleteWhereDV($"vec_id" % 5 === 0)
    idx.refresh()
    assert(idx.lastRefresh == "incremental")
    src.deleteWhere($"vec_id" % 7 === 1)
    idx.refresh()
    assert(idx.lastRefresh == "incremental")
    // content identity vs a from-scratch rebuild of the live set —
    // not merely search-equivalence: (id, codes, vmin, vmax) rows match
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getSeq[Int](1).toList,
        r.getDouble(2), r.getDouble(3))
    val maintained = idx.read()
      .select($"vec_id", $"codes", $"vmin", $"vmax")
      .collect().map(key).toSet
    val rebuilt = buildQuantizedIndex(src.read())
      .select($"vec_id", $"codes", $"vmin", $"vmax")
      .collect().map(key).toSet
    assert(maintained == rebuilt,
      s"maintained ${maintained.size} vs rebuilt ${rebuilt.size}")
    // and the index search over the maintained table equals the rebuild
    val live = src.read()
    val qs = live.filter($"vec_id" < 12)
    def rows(i: org.apache.spark.sql.DataFrame) =
      storedQuantizedTopK(i, live, qs, kCand = 20, k = 5)
        .select($"query_id", $"rank", $"neighbor_id", $"sim")
        .as[(Long, Int, Long, Double)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    assert(rows(idx.read()) == rows(buildQuantizedIndex(live)))
  }

  test("IVF-PQ with every list probed equals full ADC; fewer probes give a subset") {
    val corpus = Seq(
      (0L, Seq(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f, 0f, 1f, 0f, 0f, 0f)),
      (2L, Seq(2f, 0f, 0f, 0f, 0f, 2f, 0f, 0f)),
      (3L, Seq(0f, 2f, 0f, 0f, 2f, 0f, 0f, 0f)),
      (4L, Seq(1f, 0.1f, 0f, 0f, 0.1f, 1f, 0f, 0f)),
      (5L, Seq(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val cents = corpus.filter($"vec_id" < 2)
    val cbs = pqTrain(corpus, m = 2, ksub = 2, iters = 0, dim = 8)
    val q = corpus.filter($"vec_id" === 0)
    val full = pqAdcTopK(pqEncode(corpus, cbs, 2, 2, 8), q, cbs,
      m = 2, ksub = 2, dim = 8, k = 5)
      .select("rank", "neighbor_id", "sim")
      .as[(Int, Long, Double)].collect().toSet
    // nprobe = nlist: every inverted list scanned → identical to full ADC
    val all2 = ivfPqTopK(corpus, q, cents, cbs,
      m = 2, ksub = 2, dim = 8, k = 5, nprobe = 2)
      .select("rank", "neighbor_id", "sim")
      .as[(Int, Long, Double)].collect().toSet
    assert(all2 == full, s"nprobe=nlist diverged:\n$all2\nvs\n$full")
    // nprobe=1: only query 0's own list scores — a (re-ranked) subset
    val one = ivfPqTopK(corpus, q, cents, cbs,
      m = 2, ksub = 2, dim = 8, k = 5, nprobe = 1)
      .select("neighbor_id").as[Long].collect().toSet
    assert(one.nonEmpty && one.subsetOf(full.map(_._2)))
  }

  test("residual IVF-PQ: recall@10 beats plain IVF-PQ at equal code " +
    "bytes and equal nprobe") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 8)
    val truth = bruteForceTopK(e, q, k = 10)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def recall(ann: org.apache.spark.sql.DataFrame): Int = {
      val got = ann.select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      truth.map { case (qid, t) =>
        (got.getOrElse(qid, Set.empty[Long]) intersect t).size }.sum
    }
    // "current": v12's shipping configuration (raw lowest-id coarse
    // centroids, untrained cosine codebook) — m=4 x ksub=16 = 4-bit
    // codes, 16 bytes/vector either way
    val plain = recall(ivfPqTopK(e, q, e.filter(col("vec_id") < 16),
      pqTrain(e, m = 4, ksub = 16, iters = 0, dim = 64),
      m = 4, ksub = 16, dim = 64, k = 10, nprobe = 2))
    // residual variant brings its trained quantizers (training is part
    // of the method): Lloyd's coarse centroids, L2 residual codebook
    val cents = kmeansFit(e, k = 16, iters = 5)
      .select(col("centroid_id").as("vec_id"),
        col("centroid").as("embedding"))
    val resid = recall(ivfPqResidualTopK(e, q, cents,
      pqTrainResidual(e, cents, m = 4, ksub = 16, iters = 0, dim = 64),
      m = 4, ksub = 16, dim = 64, k = 10, nprobe = 2))
    val total = truth.values.map(_.size).sum
    info(s"recall@10: plain=$plain residual=$resid of $total")
    assert(resid >= plain,
      s"residual IVF-PQ recall ($resid/$total) must be >= plain " +
        s"($plain/$total) at equal code bytes")
    // and on this corpus it strictly improves
    assert(resid > plain)
  }

  test("multi-probe LSH: candidate superset of exact-bucket, recall never lower") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 5)
    def hits(ann: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
      val exact = bruteForceTopK(e, q, k = 5)
        .select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      ann.select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
        .map { case (qid, s) => qid -> (s intersect exact.getOrElse(qid, Set())) }
    }
    val single = hits(lshTopK(e, q, k = 5, planes = 8, dim = 64))
    val multi = hits(lshMultiProbeTopK(e, q, k = 5, planes = 8, dim = 64))
    // Hamming-1 probing widens the candidate pool, so per-query recall
    // can only improve (k is unchanged and scoring is identical)
    for (qid <- single.keys ++ multi.keys) {
      val s = single.getOrElse(qid, Set()).size
      val m = multi.getOrElse(qid, Set()).size
      assert(m >= s, s"query $qid: multi-probe recall $m < single $s")
    }
    // and on this fixture it strictly improves in aggregate
    assert(multi.values.map(_.size).sum > single.values.map(_.size).sum)
  }
}
