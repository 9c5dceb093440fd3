package graft

import graft.operators.{AsOfJoin, SkewJoin}
import org.apache.spark.sql.functions._

/** Operator-level specs: as-of join semantics, salted skew join
  * equivalence, bucketed co-located join (shuffle elimination proof). */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join: latest right row at-or-before each left row") {
    val trades = Seq((1L, "A", 100L), (2L, "A", 205L), (3L, "B", 50L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (10L, "A", 90L), (11L, "A", 100L), (12L, "A", 210L),
      (13L, "B", 60L)).toDF("quote_id", "sym", "t")
    val got = AsOfJoin.asofJoin(trades, quotes, "sym", "t",
      rightTiebreak = "quote_id", rightCols = Seq("quote_id"))
      .select($"trade_id", $"asof_quote_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L).contains(11L)) // equal ts matches (<=)
    assert(got(2L).contains(11L)) // 210 > 205 excluded
    assert(got(3L).isEmpty) // only future quote for B
  }

  test("as-of tie on right ts: highest tiebreak wins deterministically") {
    val l = Seq((1L, "A", 100L)).toDF("lid", "k", "t")
    val r = Seq((7L, "A", 90L), (9L, "A", 90L), (8L, "A", 90L))
      .toDF("rid", "k", "t")
    val got = AsOfJoin.asofJoin(l, r, "k", "t", "rid", Seq("rid"))
      .select($"asof_rid").as[Long].head()
    assert(got == 9L)
  }

  test("bottom-k sketch: partition-invariant, exact under k, sane over k") {
    import graft.expressions.BottomKSketch.bottomk_sketch
    val df = spark.range(10000).select(($"id" % 437).as("v"))
    def run(d: org.apache.spark.sql.DataFrame) =
      d.agg(bottomk_sketch($"v", 16).as("sk"))
        .select($"sk.estimate", $"sk.hashes").head
    val a = run(df.repartition(1))
    val b = run(df.repartition(13)) // different merge tree
    assert(a.getDouble(0) == b.getDouble(0))
    assert(a.getSeq[Long](1) == b.getSeq[Long](1))
    // 437 distinct values, k=16 → estimate within 35% (KMV std err ~1/√(k−2))
    assert(math.abs(a.getDouble(0) - 437) / 437 < 0.35)
    // under k: sketch is exact
    val small = spark.range(9).select(($"id" % 7).as("v"))
    assert(run(small).getDouble(0) == 7.0)
  }

  test("count-min sketch: partition-invariant, overestimates, exact sums") {
    import graft.expressions.CountMinSketch._
    val depth = 4; val width = 32
    val df = spark.range(10000).select(($"id" % 437).as("v"))
    def run(d: org.apache.spark.sql.DataFrame) =
      d.agg(cms_sketch($"v", depth, width).as("sk"))
        .select($"sk.cells").head.getSeq[Long](0)
    val a = run(df.repartition(1))
    val b = run(df.repartition(13)) // different merge tree
    assert(a == b)
    // every depth row accounts for every input exactly once
    (0 until depth).foreach { d =>
      assert(a.slice(d * width, (d + 1) * width).sum == 10000L, s"row $d")
    }
    // estimate: upper bound on the true count for every value, and
    // tight for a value that dominates its cells
    val sk = df.agg(cms_sketch($"v", depth, width).as("sk"))
    val est = sk.select(
        cms_estimate($"sk.cells", lit(0L), depth, width).as("e0"),
        cms_estimate($"sk.cells", lit(436L), depth, width).as("e436"))
      .head
    // v=0 occurs ceil(10000/437)=23 times; v=436 occurs 22 times
    assert(est.getLong(0) >= 23L && est.getLong(1) >= 22L)
    // an absent value estimates only collision noise: < eps*N with
    // generous slack (e/32 * 10000 ~ 850)
    val absent = sk.select(
      cms_estimate($"sk.cells", lit(100000L), depth, width)).head.getLong(0)
    assert(absent < 2000L, s"absent-value estimate $absent")
  }

  test("bucketed range join == naive range predicate") {
    val left = spark.range(200).select(($"id" % 5).as("k"),
      ($"id" * 37 % 1000).as("lt"), $"id".as("lid"))
    val right = spark.range(300).select(($"id" % 5).as("k"),
      ($"id" * 53 % 1000).as("rt"), $"id".as("rid"))
    val w = 100L
    val bucketed = graft.operators.RangeJoin
      .bucketedRangeJoin(left, right, "k", "lt", "rt", w, Seq("rid"))
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    val naive = left.join(right, Seq("k"))
      .filter($"rt" >= $"lt" - w && $"rt" <= $"lt")
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    assert(bucketed == naive && naive.nonEmpty)
  }

  test("interval overlap join == naive overlap predicate, for any bucket width") {
    val left = spark.range(150).select(($"id" % 4).as("k"),
      ($"id" * 37 % 900).as("ls"), ($"id" * 37 % 900 + 120).as("le"),
      $"id".as("lid"))
    val right = spark.range(200).select(($"id" % 4).as("k"),
      ($"id" * 53 % 900).as("rs"), ($"id" * 53 % 900 + 45).as("re"),
      $"id".as("rid"))
    val naive = left.join(right, Seq("k"))
      .filter($"ls" <= $"re" && $"rs" <= $"le")
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)
    // bucket width is a pure tuning knob: tiny, matched, and huge
    // widths all give the identical pair set, each pair exactly once
    for (w <- Seq(7L, 120L, 5000L)) {
      val got = graft.operators.RangeJoin.intervalOverlapJoin(
        left, right, "k", "ls", "le", "rs", "re", w, Seq("rid"))
        .select($"lid", $"rid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at w=$w")
      assert(got.toSet == naive, s"pair set mismatch at w=$w")
    }
  }

  test("salted join == plain join on skewed data") {
    // 90% of rows share one key (the skew case)
    val fact = spark.range(10000).select(
      when($"id" % 10 === 0, $"id" % 7).otherwise(lit(42L)).as("k"),
      $"id".as("v"))
    val dim = spark.range(50).select($"id".as("k"), ($"id" * 2).as("w"))
    val plain = fact.join(dim, "k").agg(sum($"v" + $"w")).head.getLong(0)
    val salted = SkewJoin.saltedJoin(fact, dim, "k", salts = 8)
      .agg(sum($"v" + $"w")).head.getLong(0)
    assert(plain == salted)
    assert(SkewJoin.saltedCount(fact, "k", 8)
      .agg(sum("n")).head.getLong(0) == 10000L)
  }

  test("bucketed tables join without an exchange (co-located join)") {
    // default warehouse dir (spark-warehouse/, gitignored); tables
    // dropped in finally
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")
    Tables.orders(spark, sf).write.bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("b_orders")
    Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_cust")
    // disable auto-broadcast so the join would otherwise shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == Tables.orders(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }

  test("chunk/pack invariants on a seeded random corpus") {
    import graft.text.TextFunctions
    import graft.operators.Packing
    val rnd = new scala.util.Random(20260812L)
    val corpus = (1L to 200L).map { id =>
      val n = rnd.nextInt(90) // 0..89 tokens
      (id, (1 to n).map(i => s"t${rnd.nextInt(50)}_$i").mkString(" "))
    }.toDF("doc_id", "text")
    val chunked = TextFunctions.chunkDocuments(corpus, "text", 24, 6)
    val rows = chunked
      .select("doc_id", "chunk_idx", "chunk_text", "n_chunk_tokens")
      .as[(Long, Int, String, Int)].collect().sortBy(r => (r._1, r._2))
    val toksByDoc = corpus.as[(Long, String)].collect().toMap
      .map { case (k, v) => k -> v.split("\\s+").filter(_.nonEmpty).toSeq }
    // every chunk is exactly the stride-window slice; concatenating the
    // non-overlapped tails reconstructs the document
    rows.groupBy(_._1).foreach { case (id, ch) =>
      val toks = toksByDoc(id)
      ch.foreach { case (_, idx, text, n) =>
        val want = toks.slice(idx * 18, idx * 18 + 24)
        assert(text.split(" ").filter(_.nonEmpty).toSeq == want && n == want.size)
      }
      val rebuilt = ch.sortBy(_._2).zipWithIndex.flatMap { case ((_, _, t, _), i) =>
        val ts = t.split(" ").filter(_.nonEmpty).toSeq
        if (i == 0) ts else ts.drop(6)
      }
      assert(rebuilt.toSeq == toks)
    }
    // packing invariants: offset in [0, cap); recomputed cumulative sum
    // equals seq_id*cap + seq_offset at every chunk
    val packed = Packing.packSequences(
      chunked.withColumn("shard", col("doc_id") % 4), "n_chunk_tokens",
      col("shard"), Seq(col("doc_id"), col("chunk_idx")), 32)
      .select("shard", "doc_id", "chunk_idx", "n_chunk_tokens", "seq_id",
        "seq_offset")
      .as[(Long, Long, Int, Int, Long, Long)].collect()
      .sortBy(r => (r._1, r._2, r._3))
    packed.groupBy(_._1).foreach { case (_, ch) =>
      var cum = 0L
      ch.foreach { case (_, _, _, n, seqId, off) =>
        assert(off >= 0 && off < 32)
        assert(cum == seqId * 32 + off)
        cum += n
      }
    }
  }

  test("quantizeU8 bounds on random vectors") {
    import graft.similarity.VectorFunctions._
    val rnd = new scala.util.Random(7L)
    val vecs = (1L to 300L).map { id =>
      (id, Array.fill(16)((rnd.nextFloat() - 0.5f) * rnd.nextInt(100)))
    }.toDF("vec_id", "embedding")
    val q = quantizeU8($"embedding")
    val rows = vecs.select(q.getField("codes").as("c"),
      q.getField("vmin").as("mn"), q.getField("vmax").as("mx"),
      dequantizeU8(q).as("r"),
      transform($"embedding", x => x.cast("double")).as("dv"))
      .as[(Seq[Int], Double, Double, Seq[Double], Seq[Double])].collect()
    rows.foreach { case (codes, mn, mx, rec, dv) =>
      assert(codes.forall(c => c >= 0 && c <= 255))
      val scale = (mx - mn) / 255.0
      rec.zip(dv).foreach { case (r, x) =>
        assert(math.abs(r - x) <= scale / 2 + 1e-9)
      }
    }
  }

  test("globalRankByCoarseKey == naive global row_number; buckets balanced") {
    import graft.operators.Ranking
    import org.apache.spark.sql.expressions.Window
    // skewed coarse key (many ties) + unique fine key
    val df = (1L to 997L).toDF("id")
      .withColumn("score", pmod(col("id") * col("id"), lit(17)))
    val got = Ranking.globalRankByCoarseKey(df, "score", "id")
      .select("id", "global_rank").as[(Long, Long)].collect().toMap
    val want = df.withColumn("r",
      row_number().over(Window.orderBy(col("score"), col("id"))).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(got == want)
    val buckets = Ranking.curriculumBuckets(df, "score", "id", 10)
      .groupBy("bucket").count().as[(Long, Long)].collect().toMap
    assert(buckets.keySet == (1L to 10L).toSet)
    assert(buckets.values.forall(c => c == 99L || c == 100L)) // 997/10
    // NULL coarse keys must rank (nulls first), not silently vanish
    val withNulls = df.withColumn("score",
      when(col("id") <= 5, lit(null)).otherwise(col("score")))
    val gotN = Ranking.globalRankByCoarseKey(withNulls, "score", "id")
      .select("id", "global_rank").as[(Long, Long)].collect().toMap
    val wantN = withNulls.withColumn("r",
      row_number().over(Window.orderBy(col("score"), col("id"))).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(gotN.size == 997 && gotN == wantN)
    // prefix sum decomposition == naive global running sum
    val dfv = df.withColumn("v", pmod(col("id") * 7, lit(23)))
    val gotSum = Ranking.globalPrefixSum(dfv, "score", "id", "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val wantSum = dfv.withColumn("cum",
      sum(col("v")).over(Window.orderBy(col("score"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(gotSum == wantSum)
  }

  test("topNPerKey == naive single-window top-n on a 90%-hot key") {
    import graft.operators.Ranking
    import org.apache.spark.sql.expressions.Window
    // ~90% of rows on key 1 (the j8 skew fixture shape), non-monotonic
    // order column, plus a key with fewer than n rows
    val df = (1L to 800L).toDF("id")
      .withColumn("key", when(col("id") % 10 < 9, 1L).otherwise(col("id")))
      .withColumn("score", pmod(col("id") * 37, lit(101)))
    val got = Ranking.topNPerKey(df, col("key"),
        Seq(col("score").desc, col("id")), n = 7,
        shardBy = col("id"), shards = 8)
      .select("key", "rank", "id").as[(Long, Int, Long)].collect().toSet
    val naive = df.withColumn("rank", row_number().over(
        Window.partitionBy(col("key"))
          .orderBy(col("score").desc, col("id"))))
      .filter(col("rank") <= 7)
      .select("key", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(got == naive)
    // hot-key safety is structural: the window over the FULL input must
    // partition by (key, shard), never by key alone
    val plan = Ranking.topNPerKey(df, col("key"),
      Seq(col("score").desc, col("id")), 7, col("id"), 8)
    val windows = plan.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size == 2)
    // collect is top-down: the LAST window is the bottom-most (full
    // input); it must carry both partition expressions
    assert(windows.last.partitionSpec.size == 2)
    assert(windows.head.partitionSpec.size == 1)
    // collision guard
    intercept[IllegalArgumentException] {
      Ranking.topNPerKey(df.withColumn("rank", lit(1)), col("key"),
        Seq(col("id")), 1, col("id"))
    }
  }

  test("rrfFuse: hand-computed fusion, single-list ids, integer ties") {
    import graft.operators.Ranking
    // list A ranks 10,20,30; list B ranks 20,40 — 20 is in both,
    // 10/30/40 in exactly one. scale=1000, kConst=60:
    //   20: 1000/62 + 1000/61 = 16 + 16 = 32
    //   10: 1000/61 = 16   (single-list, best rank)
    //   40: 1000/62 = 16   (TIE with 10 on integer score → id order)
    //   30: 1000/63 = 15
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val got = Ranking.rrfFuse(Seq(a, b), "doc_id", "rank", k = 10,
        kConst = 60L, scale = 1000L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 20L, 32L, 2L), (2L, 10L, 16L, 1L),
      (3L, 40L, 16L, 1L), (4L, 30L, 15L, 1L)))
    // k truncates the FUSED order, not the inputs
    val top2 = Ranking.rrfFuse(Seq(a, b), "doc_id", "rank", k = 2,
        kConst = 60L, scale = 1000L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(top2 === got.take(2))
    // a 0-based ranked list fails LOUDLY: with kConst=0 the rank-0 row
    // would divide by zero, which integer `div` turns into NULL — sum()
    // would then silently drop the list's best document's contribution
    val zeroBased = Seq((10L, 0L), (20L, 1L)).toDF("doc_id", "rank")
    val e = intercept[Exception] {
      Ranking.rrfFuse(Seq(zeroBased), "doc_id", "rank", k = 5,
        kConst = 0L, scale = 1000L).collect()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(chain.contains("must be >= 1"), chain)
  }

  test("t20 recall floor: the LSH-dense hybrid keeps >= 500 permille of " +
      "the exact fusion; rrfFuse resolves awkward rank-column names") {
    import graft.operators.Ranking
    // the floor lives HERE, not in the hash oracle: a testdata regen
    // that collapses LSH recall must fail loudly, not re-hash green
    val row = SparkEntry.queries("t20_hybrid_recall")(spark, sf)
      .collect().head
    val (nTrue, nHit, permille) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nTrue == 20L, s"exact fused top-20 must be full, got $nTrue")
    assert(nHit >= 1L && nHit <= nTrue)
    assert(permille >= 500L,
      s"hybrid fusion recall collapsed: $nHit/$nTrue = $permille permille")
    // the probe-fanout dial (t20b): the SAME corpus and probe with the
    // full Hamming-<=2 multi-probe shell must clear a HIGHER floor —
    // this is the knob a deployment turns when single-probe recall is
    // not enough, and the two floors together pin the dial's effect.
    // Asserted at the CORRECTNESS-GATE fixture (sf0.01 — measured
    // 850 permille there and at sf0.1): the sf0.001 smoke corpus is
    // too thin (~50 vectors over 256 codes) for a stable 800 floor.
    val sf01 = "/root/testdata/sf0.01"
    val mp = SparkEntry.queries("t20b_hybrid_recall_mp")(spark, sf01)
      .collect().head
    val (mpTrue, mpHit, mpPermille) =
      (mp.getLong(0), mp.getLong(1), mp.getLong(2))
    assert(mpTrue == 20L)
    assert(mpPermille >= 800L,
      s"multi-probe hybrid recall below floor: $mpHit/$mpTrue = " +
        s"$mpPermille permille")
    val sp01 = SparkEntry.queries("t20_hybrid_recall")(spark, sf01)
      .collect().head.getLong(2)
    assert(mpPermille >= sp01,
      "widening the probe fanout must never lose fused recall: " +
        s"single-probe $sp01 vs multi-probe $mpPermille")
    // rank columns that would break string-spliced SQL (spaces, dots)
    // must resolve like any identifier — the fusion is Column-API-built
    val a = Seq((10L, 1L), (20L, 2L)).toDF("doc_id", "the rank.col")
    val got = Ranking.rrfFuse(Seq(a), "doc_id", "the rank.col", k = 5,
        kConst = 60L, scale = 1000L)
      .select($"doc_id", $"rrf_score").as[(Long, Long)].collect().toSeq
    assert(got === Seq((10L, 16L), (20L, 16L)))
  }

  test("packSequences: straddle assignment, per-shard independence, stats") {
    import graft.operators.Packing
    // one shard; chunk token counts 30,30,30 with capacity 64:
    // cum_excl 0,30,60 → seqs 0,0,0(offset 60, straddles into seq 1)
    val chunks = Seq(
      (0L, 0L, 30L), (0L, 1L, 30L), (0L, 2L, 30L), (0L, 3L, 30L),
      (1L, 0L, 100L), (1L, 1L, 10L)) // shard 1: big chunk spans seqs 0-1
      .toDF("doc_id", "chunk_idx", "n")
      .withColumn("shard", col("doc_id") % 8)
    val packed = Packing.packSequences(chunks, "n", col("shard"),
      Seq(col("doc_id"), col("chunk_idx")), 64)
      .select("doc_id", "chunk_idx", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(packed == Seq(
      (0L, 0L, 0L, 0L), (0L, 1L, 0L, 30L), (0L, 2L, 0L, 60L),
      (0L, 3L, 1L, 26L),
      (1L, 0L, 0L, 0L), (1L, 1L, 1L, 36L))) // shards pack independently
    val stats = Packing.sequenceStats(
      Packing.packSequences(chunks, "n", col("shard"),
        Seq(col("doc_id"), col("chunk_idx")), 64), "n", col("shard"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(stats == Seq((0L, 0L, 3L, 90L), (0L, 1L, 1L, 30L),
      (1L, 0L, 1L, 100L), (1L, 1L, 1L, 10L)))
  }

  test("stratified sample: deterministic, partition-invariant, rate-monotone") {
    import graft.operators.Sampling
    val df = (1L to 2000L).toDF("id")
      .withColumn("stratum", when(col("id") % 2 === 0, "a").otherwise("b"))
      .withColumn("h", pmod(col("id") * 2654435761L, lit(1000000007L)))
    def ids(rates: Map[String, Int], parts: Int): Seq[Long] =
      Sampling.stratifiedSample(df.repartition(parts), col("stratum"),
        col("h"), rates, defaultRate = 0)
        .select("id").as[Long].collect().sorted.toSeq
    val r1 = ids(Map("a" -> 100, "b" -> 500), 4)
    // identical decisions regardless of physical partitioning
    assert(r1 == ids(Map("a" -> 100, "b" -> 500), 13))
    // raising a rate only ADDS rows (incremental top-up property)
    val r2 = ids(Map("a" -> 300, "b" -> 500), 4)
    assert(r1.toSet.subsetOf(r2.toSet) && r2.size > r1.size)
    // boundary rates
    assert(ids(Map("a" -> 0, "b" -> 0), 4).isEmpty)
    assert(ids(Map("a" -> 1000, "b" -> 1000), 4).size == 2000)
    // stratum with no rate entry falls to defaultRate(0) → only "a" kept
    val onlyA = Sampling.stratifiedSample(df, col("stratum"), col("h"),
      Map("a" -> 1000), defaultRate = 0)
    assert(onlyA.select("stratum").distinct().as[String].collect()
      .toSeq == Seq("a"))
  }

  test("exactByGroup percentiles == builtin percentile (differential)") {
    import graft.operators.Percentiles
    // adversarial fixture: negative values (arithmetic-shift buckets),
    // heavy duplicate multiplicities, a single-row group, nulls, values
    // straddling bucket boundaries at shift=4, and non-dyadic fractions
    val rnd = new scala.util.Random(42)
    val rows = (1 to 4000).map { i =>
      val grp = s"g${i % 5}"
      val v: java.lang.Long = i % 37 match {
        case 0 => null
        case m if m < 8 => java.lang.Long.valueOf(-(rnd.nextInt(40).toLong))
        case m if m < 20 => java.lang.Long.valueOf(rnd.nextInt(16).toLong) // dup-heavy
        case _ => java.lang.Long.valueOf(rnd.nextInt(100000).toLong)
      }
      (grp, v)
    } :+ (("lone", java.lang.Long.valueOf(7L)))
    val df = rows.toDF("grp", "v")
    val fracs = Seq(0.0, 0.25, 0.313, 0.5, 0.75, 1.0)
    // (shift, builtin-cutover): three decomposition granularities plus
    // the builtin fast path — all four must agree with the reference
    for ((shift, below) <- Seq((0, 0L), (4, 0L), (16, 0L), (16, 1000000L))) {
      val got = Percentiles.exactByGroup(df, "grp", "v", fracs, shift,
          useBuiltinBelow = below)
        .select(col("grp"), col("fraction"), col("value"))
        .as[(String, Double, Double)].collect()
        .map { case (grp, f, x) => (grp, f) -> x }.toMap
      val want = df.filter(col("v").isNotNull).groupBy(col("grp"))
        .agg(expr(s"percentile(v, array(${fracs.mkString("D,")}D))").as("ps"))
        .select(col("grp"), col("ps")).as[(String, Seq[Double])].collect()
        .flatMap { case (grp, ps) => fracs.zip(ps).map { case (f, x) =>
          (grp, f) -> x } }.toMap
      assert(got.keySet == want.keySet, s"shift=$shift key sets differ")
      want.foreach { case (k @ (_, f), x) =>
        // dyadic fractions are fp-exact under either interpolation
        // form; the builtin uses (1−g)·lo + g·hi vs our lo + (hi−lo)·g,
        // which can differ an ulp at non-dyadic g
        if (f * 4 == (f * 4).floor) assert(got(k) == x,
          s"shift=$shift $k: got ${got(k)}, want $x")
        else assert(math.abs(got(k) - x) <= 1e-9 * math.max(1.0, math.abs(x)),
          s"shift=$shift $k: got ${got(k)}, want $x") }
    }
    // a fractional value column must be rejected, not silently
    // truncated into disagreement with the builtin
    val frac = Seq(("g", 10.99), ("g", 11.99)).toDF("grp", "v")
    val err = intercept[IllegalArgumentException] {
      Percentiles.exactByGroup(frac, "grp", "v", Seq(0.5))
    }
    assert(err.getMessage.contains("integral"), err.getMessage)
    // extreme-magnitude spot check: a span wider than 2^62 must not
    // wrap in the interpolation (values chosen double-exact; dyadic f)
    val wide = Seq(("w", java.lang.Long.valueOf(-(1L << 62))),
      ("w", java.lang.Long.valueOf(1L << 62))).toDF("grp", "v")
    val med = Percentiles.exactByGroup(wide, "grp", "v", Seq(0.5),
        useBuiltinBelow = 0L)
      .select(col("value")).as[Double].collect()
    assert(med.toSeq == Seq(0.0), med.toSeq.toString)
  }

  test("pageRank: hand-computed ranks, partition-invariant, mass conserved") {
    import graft.operators.PageRank.pageRank
    // 1 -> 2, 1 -> 3, 2 -> 3; node 3 dangles
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    // iteration 1 by hand (micro-units, d=850):
    //   deg(1)=2, deg(2)=1; dang = rank(3) = 1_000_000, share = 333_333
    //   in(2) = 500_000; in(3) = 500_000 + 1_000_000
    //   r(1) = 150_000 + 850*333_333 div 1000           = 433_333
    //   r(2) = 150_000 + 850*(500_000+333_333) div 1000 = 858_333
    //   r(3) = 150_000 + 850*(1_500_000+333_333) div 1000 = 1_708_333
    val want1 = Map(1L -> 433333L, 2L -> 858333L, 3L -> 1708333L)
    // threshold 0 forces the distributed loop; the default takes the
    // driver-side cutover — integer fixed-point makes them BIT-identical
    for (parts <- Seq(1, 5); thresh <- Seq(0L, 8000000L)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(edges, parts))
        .toDF("s", "t")
      val got = pageRank(df, "s", "t", iters = 1,
          localEdgeThreshold = thresh)
        .as[(Long, Long)].collect().toMap
      assert(got == want1, s"parts=$parts thresh=$thresh: $got")
    }
    // more iterations keep total mass at n * unit (up to div truncation)
    val r3 = pageRank(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L))
      .toDF("s", "t"), "s", "t", iters = 5)
      .as[(Long, Long)].collect()
    val total = r3.map(_._2).sum
    assert(math.abs(total - 3000000L) < 100L, total.toString)
    // both legs agree on a bigger random-ish graph, with dangling nodes,
    // multi-iteration — and on MIXED-width ids (int src, long dst: node
    // type must come out long on both paths)
    val big = (0 until 3000).map { i =>
      (i % 97, ((i * 31 + 7) % 211).toLong)
    }
    val bigDf = big.toDF("s", "t")
    val local = pageRank(bigDf, "s", "t", iters = 4)
    val dist = pageRank(bigDf, "s", "t", iters = 4,
      localEdgeThreshold = 0L)
    assert(local.schema("node").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(dist.schema("node").dataType ==
      org.apache.spark.sql.types.LongType)
    val lm = local.as[(Long, Long)].collect().toMap
    val dm = dist.as[(Long, Long)].collect().toMap
    assert(lm == dm, s"local/distributed diverge: ${lm.size}/${dm.size}")
  }

  test("heavyHitters == groupBy-HAVING, partition-invariant, no misses") {
    import graft.operators.HeavyHitters.heavyHitters
    // skewed fixture: key 0 dominates, a mid tier sits just above and
    // just below the threshold, a long unique tail stresses the sketch
    val rows = Seq.fill(500)(0L) ++
      (1L to 10L).flatMap(k => Seq.fill(21)(k)) ++ // just above t=20
      (11L to 20L).flatMap(k => Seq.fill(20)(k)) ++ // exactly t: excluded
      (1000L to 3000L) // unique tail
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > 20L).toMap
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Tuple1(_)), parts)
          .map(t => org.apache.spark.sql.Row(t._1)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType))))
      val got = heavyHitters(df, "k", 20L)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"parts=$parts: got ${got.size}, want ${want.size}")
    }
    // nulls are not items; threshold below every count returns all keys
    val withNulls = Seq(Some(1L), Some(1L), None, Some(2L))
      .toDF("k")
    assert(heavyHitters(withNulls, "k", 1L).as[(Long, Long)]
      .collect().toMap == Map(1L -> 2L))
    // BinaryType keys: Array[Byte] hashes by reference, so the summary
    // must normalize — a heavy fingerprint spread across partitions
    // must never be silently dropped
    val binRows = (Seq.fill(30)(Array[Byte](1, 2, 3)) ++
      (0 until 200).map(i => Array[Byte](9, i.toByte))).map(Tuple1(_))
    val binDf = spark.createDataFrame(
      spark.sparkContext.parallelize(binRows.map(t =>
        org.apache.spark.sql.Row(t._1)), 8),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.BinaryType))))
    val binGot = heavyHitters(binDf, "k", 10L)
      .as[(Array[Byte], Long)].collect()
    assert(binGot.length == 1 && binGot.head._2 == 30L &&
      binGot.head._1.toSeq == Seq[Byte](1, 2, 3), binGot.toSeq.toString)
    // candidate-bound fallback: forcing the bound to 1 must produce the
    // identical exact answer via the plain groupBy-HAVING plan
    val fb = heavyHitters(binDf, "k", 10L, maxCandidateBound = 1L)
      .as[(Array[Byte], Long)].collect()
    assert(fb.length == 1 && fb.head._1.toSeq == Seq[Byte](1, 2, 3))
    // a caller-raised bound above the sketch's own 2^22 capacity must
    // ALSO fall back to the exact plan (not throw in MisraGriesAgg):
    // kL here is ~4.3M > 2^22 while maxCandidateBound permits it
    val huge = spark.range((1L << 22) + 100000).toDF("k")
    assert(heavyHitters(huge, "k", 1L, maxCandidateBound = 1L << 40)
      .count() == 0L) // all keys unique: none strictly above freq 1
  }

  test("graft_heavy_hitters aggregate: per-group SQL, lb bound, string keys") {
    // the summary is a registered aggregate, so it composes per-group
    // in plain SQL — the shape the mapPartitions formulation couldn't
    val rows = Seq.fill(50)(("g1", "a")) ++
      (1 to 40).map(i => ("g1", s"t$i")) ++
      Seq.fill(60)(("g2", "b")) ++
      (1 to 30).map(i => ("g2", s"u$i"))
    rows.toDF("g", "k").createOrReplaceTempView("hh_in")
    val out = spark.sql(
      "SELECT g, graft_heavy_hitters(k, 8) AS s FROM hh_in GROUP BY g")
      .select(col("g"), explode(col("s")).as("e"))
      .select(col("g"), col("e.key"), col("e.lb"))
      .as[(String, String, Long)].collect()
    // each group aggregates N=90 rows with k=8 → error ≤ N/(k+1) = 10:
    // the dominant key must be present with lb ≥ C − 10, and no
    // group's summary may exceed k entries
    val g1a = out.filter(t => t._1 == "g1" && t._2 == "a")
    val g2b = out.filter(t => t._1 == "g2" && t._2 == "b")
    assert(g1a.nonEmpty && g1a.head._3 >= 40L, out.mkString(","))
    assert(g2b.nonEmpty && g2b.head._3 >= 50L, out.mkString(","))
    assert(out.count(_._1 == "g1") <= 8 && out.count(_._1 == "g2") <= 8)
    // output is deterministically ordered: lb desc, then key asc
    val g1lbs = out.filter(_._1 == "g1").map(_._3).toSeq
    assert(g1lbs == g1lbs.sortBy(-_))
  }

  test("weightedSample: local replay, weight monotone, partition-invariant") {
    import graft.operators.Sampling.weightedSample
    val P = 1000000007L
    val A = 2654435761L % P
    val B = 40503L * 69069L % P
    def prio(id: Long, w: Long): Long = ((A * id + B) % P) * 1000000L / w
    val rows = (1L to 500L).map(i => (i, (i % 7) + 1L))
    // exact local replay of the quantized-priority order draw
    val want = rows.map { case (id, w) => (id, w, prio(id, w)) }
      .sortBy(t => (t._3, t._1)).take(50)
    for (parts <- Seq(1, 7)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts)).toDF("id", "w")
      val got = weightedSample(df, "id", "w", 50)
        .select($"id", $"w", $"sample_priority")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got.sortBy(t => (t._3, t._1)) == want, s"parts=$parts")
    }
    // weight monotonicity: scaling one row's weight far up pulls it in
    val boosted = rows.map { case (id, w) => if (id == 499L) (id, 100000L)
      else (id, w) }.toDF("id", "w")
    val ids = weightedSample(boosted, "id", "w", 50)
      .select($"id").as[Long].collect().toSet
    assert(ids.contains(499L))
    // null / non-positive weights never qualify
    val edge = Seq((1L, Some(5L)), (2L, None), (3L, Some(0L)),
      (4L, Some(-2L))).toDF("id", "w")
    assert(weightedSample(edge, "id", "w", 10)
      .select($"id").as[Long].collect().toSeq == Seq(1L))
  }

  test("sketchSetOps: exact mode, estimate mode, disjoint/identical sets") {
    import graft.expressions.SketchSetOps.estimate
    val P = 1000000007L
    val A = 2654435761L % P
    val B = 40503L * 69069L % P
    def h(x: Long): Long = (A * x + B) % P
    def run(a: Seq[Long], b: Seq[Long], k: Int, parts: Int = 3)
        : (Long, Long, Long, Long, Long, Long) = {
      val da = spark.createDataFrame(
        spark.sparkContext.parallelize(a.map(Tuple1(_)), parts)).toDF("v")
      val db = spark.createDataFrame(
        spark.sparkContext.parallelize(b.map(Tuple1(_)), parts)).toDF("v")
      estimate(da, "v", db, "v", k)
        .as[(Long, Long, Long, Long, Long, Long)].collect().head
    }
    // exact mode (m < k): every field is hand-computable
    val a = Seq(1L, 2L, 3L, 4L, 2L)
    val b = Seq(3L, 4L, 5L)
    val union = (a ++ b).distinct.map(h).sorted
    val inter = a.toSet.intersect(b.toSet).size.toLong
    val (m, kth, x, uEst, iEst, jacc) = run(a, b, k = 64)
    assert(m == union.length && kth == union.max)
    assert(x == inter && uEst == union.length && iEst == inter)
    assert(jacc == (2 * x * 1000 + m) / (2 * m))
    // disjoint sets: zero overlap everywhere
    val (_, _, x0, _, i0, j0) = run(Seq(1L, 2L), Seq(10L, 20L), k = 64)
    assert(x0 == 0L && i0 == 0L && j0 == 0L)
    // identical sets: jaccard rounds to exactly 1000 in both modes
    assert(run(1L to 10L, 1L to 10L, k = 64)._6 == 1000L)
    assert(run(1L to 500L, 1L to 500L, k = 16)._6 == 1000L)
    // estimate mode (m == k): replay the estimator locally
    val bigA = (1L to 400L)
    val bigB = (201L to 600L)
    val k2 = 32
    val ha = bigA.map(h).sorted.take(k2)
    val hb = bigB.map(h).sorted.take(k2)
    val comb = (ha ++ hb).distinct.sorted.take(k2)
    val xe = comb.count(v => ha.contains(v) && hb.contains(v)).toLong
    val ue = (k2 - 1) * P / comb.max
    val got = run(bigA, bigB, k2, parts = 5)
    assert(got == (k2.toLong, comb.max, xe, ue, xe * ue / k2,
      (2 * xe * 1000 + k2) / (2 * k2)), got.toString)
  }
}
