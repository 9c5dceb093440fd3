package graft

import graft.dedup.{Dedup => D}
import graft.text.TextFunctions._
import org.apache.spark.sql.functions._

/** Dedup + text ops on planted fixtures: exact dupes, near-dupes with
  * known Jaccard, native-vs-HOF hash implementations differential. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "The quick brown fox jumps over the lazy dog!"), // exact dup after norm
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different content about spark engines"),
    (5L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (6L, "")).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per normalized text") {
    val kept = D.exactDedup(docs).select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 3L, 4L, 6L))) // 2 and 5 removed
  }

  test("connected components: chains, triangles, multi-round convergence") {
    // components: {1..6} (a 6-long path — forces several hash-min
    // rounds), {10,11,12} (triangle), {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)).toDF("id_a", "id_b")
    // small edge list → driver-side union-find; threshold 0 forces the
    // distributed hash-min loop. Both must produce the identical labeling.
    for (thr <- Seq(2000000L, 0L)) {
      val comp = D.connectedComponents(pairs, localEdgeThreshold = thr)
        .as[(Long, Long)].collect().toMap
      assert((1L to 6L).forall(comp(_) == 1L))
      assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
      assert(comp(20L) == 20L && comp(21L) == 20L)
      assert(comp.size == 11) // only vertices present in the pair list
    }
  }

  test("connected components: null endpoints and mixed-width ids, both paths") {
    // a null endpoint never equi-joins in the distributed loop: the
    // non-null side survives as a singleton and the null vertex comes
    // out as a (null, null) row — the local cutover must match exactly
    val pairs = Seq(
      (Option(1L), Option(2L)),
      (Option(3L), Option.empty[Long]),
      (Option.empty[Long], Option(4L))).toDF("id_a", "id_b")
    for (thr <- Seq(2000000L, 0L)) {
      val got = D.connectedComponents(pairs, localEdgeThreshold = thr)
        .as[(Option[Long], Option[Long])].collect().toSet
      assert(got == Set(
        (Some(1L), Some(1L)), (Some(2L), Some(1L)),
        (Some(3L), Some(3L)), (Some(4L), Some(4L)),
        (None, None)), s"thr=$thr: $got")
    }
    // mixed-width endpoints (int id_a, long id_b): the local leg must
    // widen like the distributed union coercion, not cast to the first
    // column's narrower type
    val mixed = Seq((1, 5000000000L), (2, 5000000000L))
      .toDF("id_a", "id_b")
    for (thr <- Seq(2000000L, 0L)) {
      val got = D.connectedComponents(mixed, localEdgeThreshold = thr)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 5000000000L -> 1L),
        s"thr=$thr: $got")
    }
  }

  test("connected components: long chain converges in logarithmic rounds") {
    // a 40-node path has diameter 39: plain neighbor-min label
    // propagation needs ~39 rounds, far over maxIter=12 — the pointer-
    // doubling shortcut (engaged from round 3) must converge it anyway
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = D.connectedComponents(pairs, maxIter = 12,
        localEdgeThreshold = 0L) // force the distributed loop
      .as[(Long, Long)].collect().toMap
    assert((1L to 40L).forall(comp(_) == 1L))
    assert(comp.size == 40)
  }

  test("chunkDocuments: boundaries, overlap, short docs, empty docs") {
    import graft.text.TextFunctions
    val corpus = Seq(
      (1L, (1 to 56).map(i => s"w$i").mkString(" ")), // 56 toks → 2 chunks @ (32,8)
      (2L, (1 to 57).map(i => s"w$i").mkString(" ")), // 57 → 3 (short tail)
      (3L, "just three tokens"),                      // 1 short chunk
      (4L, "")).toDF("doc_id", "text")                // 0 chunks
    val out = TextFunctions.chunkDocuments(corpus, "text", 32, 8)
      .select("doc_id", "chunk_idx", "n_chunk_tokens")
      .as[(Long, Int, Int)].collect().sorted
    assert(out.toSeq == Seq(
      (1L, 0, 32), (1L, 1, 32),           // [0,32) [24,56)
      (2L, 0, 32), (2L, 1, 32), (2L, 2, 9), // [48,57) short tail
      (3L, 0, 3)))
    // every token covered, consecutive chunks overlap by exactly 8
    val texts = TextFunctions.chunkDocuments(corpus.filter(col("doc_id") === 1),
      "text", 32, 8).select("chunk_text").as[String].collect()
    assert(texts(0).endsWith("w32") && texts(1).startsWith("w25"))
  }

  test("decontaminate drops any-shingle overlap, keeps short/clean docs") {
    val train = Seq(
      (1L, "the quick brown fox jumps high"),   // shares "quick brown fox"
      (2L, "completely unrelated training text here"),
      (3L, "tiny doc"),                          // < 3 tokens → no shingles
      (4L, "another clean document with no leak")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "benchmark asks about the quick brown fox riddle"))
      .toDF("doc_id", "text")
    val kept = D.decontaminate(train, bench)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L, 4L))
  }

  test("bloomDecontaminate matches exact decontaminate (fpp-independent)") {
    val train = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "completely unrelated training text here"),
      (3L, "tiny doc"),
      (4L, "another clean document with no leak")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "benchmark asks about the quick brown fox riddle"))
      .toDF("doc_id", "text")
    // a deliberately tiny/saturated sketch (high fpp) must still give
    // the exact answer: the verify join strips every false positive
    for (items <- Seq(8L, 1L << 20)) {
      val kept = D.bloomDecontaminate(train, bench, expectedItems = items)
        .select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq == Seq(2L, 3L, 4L), s"expectedItems=$items")
    }
    // empty bench: everything survives
    val all = D.bloomDecontaminate(train, bench.filter(lit(false)))
      .select("doc_id").as[Long].collect().sorted
    assert(all.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("duplicatePassages counts cross-doc shingles, not within-doc repeats") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),          // shares 'alpha beta gamma'
      (2L, "alpha beta gamma zeta"),           // with doc 1
      (3L, "unrelated text entirely here now"),
      (4L, "alpha beta gamma alpha beta gamma"), // repeats internally too
      (5L, "xy")).toDF("doc_id", "text")       // < n tokens: no shingles
    val got = D.duplicatePassages(corpus)
      .select("doc_id", "n_shingles", "n_dup")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc 4: 4 raw shingles but distinct = {abg, bga, gab, abg…} →
    // distinct set {alpha beta gamma, beta gamma alpha, gamma alpha beta}
    assert(got(0) == ((1L, 2L, 1L)))
    assert(got(1) == ((2L, 2L, 1L)))
    assert(got(2) == ((3L, 3L, 0L)))
    val (_, n4, dup4) = got(3)
    assert(n4 == 3L && dup4 == 1L) // only 'alpha beta gamma' crosses docs
    assert(got(4) == ((5L, 0L, 0L)))
  }

  test("substringDedup: overlapping spans merge, self-repeats count, " +
    "k-1 spans survive, full erasure allowed") {
    // k=3. Planted structure (tokens are single letters for clarity):
    //  - docs 10/11 share "a b c d" (two overlapping dup 3-windows ->
    //    one merged 4-token span) at DIFFERENT positions
    //  - doc 12 self-repeats "p q r" twice (within-doc duplication)
    //  - docs 13/14 share only the 2-token span "y z": below k, kept
    //  - doc 15 is entirely one duplicated window of doc 10's "a b c"?
    //    no — it IS exactly "a b c", so the whole doc is erased
    //  - doc 16 has <k tokens and no windows at all
    val corpus = Seq(
      (10L, "a b c d u1 u2 u3"),
      (11L, "v1 v2 a b c d v3"),
      (12L, "p q r w1 p q r"),
      (13L, "w2 w3 y z w4"),
      (14L, "w5 y z w6 w7"),
      (15L, "a b c"),
      (16L, "t1 t2")).toDF("doc_id", "text")
    val got = D.substringDedup(corpus, k = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      // windows "a b c" (10,11,15) and "b c d" (10,11) dup -> merged
      // span [0,4) in doc 10, [2,6) in doc 11
      (10L, 7L, 2L, 4L, "u1 u2 u3"),
      (11L, 7L, 2L, 4L, "v1 v2 v3"),
      // "p q r" occurs twice WITHIN doc 12: both occurrences erased
      (12L, 7L, 2L, 6L, "w1"),
      // 2-token overlap "y z" is below k: nothing flagged
      (13L, 5L, 0L, 0L, "w2 w3 y z w4"),
      (14L, 5L, 0L, 0L, "w5 y z w6 w7"),
      // the whole doc was one duplicated window: empty survivor
      (15L, 3L, 1L, 3L, ""),
      // shorter than k: no windows, untouched
      (16L, 2L, 0L, 0L, "t1 t2")))
  }

  test("tfIdfTopK ranks rare terms above common, ties on term asc") {
    val corpus = Seq(
      (1L, "apple apple banana common common common"),
      (2L, "banana cherry common common"),
      (3L, "common cherry")).toDF("doc_id", "text")
    val top = tfIdfTopK(corpus, "text", "doc_id", k = 2)
      .select("doc_id", "rank", "term")
      .as[(Long, Int, String)].collect().sorted.toSeq
    // doc1: apple tf=2·df=1 → 6e6 beats common tf=3·df=3 → 3e6;
    // doc2: banana/cherry tie at 1.5e6 → term asc picks banana
    assert(top == Seq((1L, 1, "apple"), (1L, 2, "common"),
      (2L, 1, "common"), (2L, 2, "banana"),
      (3L, 1, "cherry"), (3L, 2, "common")))
    val vocab = vocabulary(corpus, "text", "doc_id", 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(vocab == Seq(("common", 6L, 3L), ("apple", 2L, 1L)))
  }

  test("redactPii scrubs all categories, counts match, clean text unchanged") {
    val rows = Seq(
      (1L, "mail a.b+c@ex-corp.io and 555-123-4567 then 192.168.0.1 done"),
      (2L, "ssn 123-45-6789 stays distinct from phone 555 123 4567"),
      (3L, "no pii here at all"),
      (4L, "two mails x@y.com y@z.org")).toDF("doc_id", "text")
    val out = rows.select(col("doc_id"), redactPii(col("text")).as("r"),
      piiCounts(col("text")).as("c"))
      .select(col("doc_id"), col("r"), col("c.n_email"), col("c.n_ssn"),
        col("c.n_phone"), col("c.n_ip"))
      .as[(Long, String, Int, Int, Int, Int)].collect().sortBy(_._1)
    assert(out(0)._2 == "mail <EMAIL> and <PHONE> then <IP> done")
    assert((out(0)._3, out(0)._4, out(0)._5, out(0)._6) == ((1, 0, 1, 1)))
    assert(out(1)._2 == "ssn <SSN> stays distinct from phone <PHONE>")
    assert(out(2)._2 == "no pii here at all")
    assert(out(3)._2 == "two mails <EMAIL> <EMAIL>" && out(3)._3 == 2)
  }

  test("incrementalDedup: batch winners absent from index survive") {
    val index = Seq("known text one", "known text two").toDF("text")
      .select(org.apache.spark.sql.functions.md5(
        normalizedText(col("text"))).as("fp"))
    val batch = Seq(
      (11L, "known text one"),     // already indexed → dropped
      (13L, "fresh text alpha"),   // new → survives
      (15L, "fresh text alpha"),   // batch-internal dup of 13 → dropped
      (17L, "fresh text beta")).toDF("doc_id", "text")
    val out = D.incrementalDedup(index, batch)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(13L, 17L))
  }

  test("bigramRepetition: top bigram, ties lexicographic, short docs zero") {
    val corpus = Seq(
      (1L, "buy now buy now buy now totally organic"), // "buy now" x3
      (2L, "a b a b c"), // "a b" x2 beats others
      (3L, "one"),       // no bigrams
      (4L, "x y y x")).toDF("doc_id", "text") // "x y"=1 "y y"=1 "y x"=1 tie → min
    val out = bigramRepetition(corpus, "text", "doc_id")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 7L, 4L, 3L, "buy now")))
    assert(out(1) == ((2L, 4L, 3L, 2L, "a b")))
    assert(out(2) == ((3L, 0L, 0L, 0L, "")))
    assert(out(3) == ((4L, 3L, 3L, 1L, "x y")))
  }

  test("dedupByClusters keeps min-id survivors + singletons") {
    val corpus = Seq(1L, 2L, 3L, 4L, 9L).toDF("doc_id")
      .withColumn("payload", col("doc_id") * 2)
    val clusters = Seq((1L, 1L), (2L, 1L), (4L, 4L)).toDF("id", "label")
    val kept = D.dedupByClusters(corpus, clusters)
      .select("doc_id").as[Long].collect().sorted
    // 2 dropped (clustered under 1); 3 and 9 are singletons; 4 self-labeled
    assert(kept.sameElements(Array(1L, 3L, 4L, 9L)))
  }

  test("minhash native expression == composed-HOF implementation") {
    val both = docs.select(
      D.minhashSignature(col("text")).as("native"),
      D.minhashSignatureHof(col("text")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).isEmpty)
    // empty text → all -1 sentinel
    val empty = docs.filter(col("doc_id") === 6)
      .select(D.minhashSignature(col("text"))).head.getSeq[Long](0)
    assert(empty.forall(_ == -1L))
  }

  test("simhash native == HOF, and near-dup texts are close in Hamming") {
    val both = docs.select(col("doc_id"), D.simhash(col("text")).as("n"),
      D.simhashHof(col("text")).as("h"))
    assert(both.filter(col("n") =!= col("h")).isEmpty)
    val m = both.select(col("doc_id"), col("n")).as[(Long, Long)]
      .collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(3L)) < ham(m(1L), m(4L))) // near-dup closer than unrelated
    assert(ham(m(1L), m(5L)) == 0) // identical text → identical simhash
  }

  test("minhash LSH finds the planted near-dup pairs") {
    val pairs = D.minhashNearDups(docs, threshold = 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L))) // exact dup pair
    assert(pairs.contains((1L, 2L))) // normalized-identical tokens differ only by '!'
    // unrelated doc 4 pairs with nothing
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash near-dups on a skewed corpus == brute-force all-pairs") {
    // hot-bucket stress: 3 distinct texts × 20 copies each (duplicate
    // fingerprints pile into the same 8-bit slices) + near-dup variants
    val base = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs today",
      "completely different content about spark engines")
    val skewed = (0 until 60).map(i => (i.toLong, base(i % 3))) ++ Seq(
      (60L, "the quick brown fox jumps over the sleepy dog"),
      (61L, "pack my box with five dozen liquor jugs tomorrow"))
    val df = skewed.toDF("doc_id", "text")
    val got = D.simhashNearDups(df, maxDist = 3)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    // brute force: every pair within Hamming 3, no blocking at all
    val sh = df.select(col("doc_id"), D.simhash(col("text")).as("sh"))
      .as[(Long, Long)].collect()
    val want = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == want)
    assert(want.size >= 3 * 20 * 19 / 2) // the dup groups alone
  }

  test("simhashDedup == pairs->CC->survivors on a skewed corpus (value-graph equivalence)") {
    // same hot-bucket fixture as above: heavy duplicate multiplicity is
    // exactly where the value-graph path diverges in COST but must not
    // diverge in RESULT from the doc-pair path
    val base = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs today",
      "completely different content about spark engines")
    val skewed = (0 until 60).map(i => (i.toLong, base(i % 3))) ++ Seq(
      (60L, "the quick brown fox jumps over the sleepy dog"),
      (61L, "pack my box with five dozen liquor jugs tomorrow"),
      (62L, "a singleton document sharing nothing with the others"))
    val df = skewed.toDF("doc_id", "text")
    val viaPairs = D.dedupByClusters(df,
      D.connectedComponents(D.simhashNearDups(df, maxDist = 3), "id_a", "id_b"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val viaValues = D.simhashDedup(df, maxDist = 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaValues == viaPairs)
    assert(viaValues.contains(62L)) // singleton survives
    assert(viaValues.size < skewed.size) // dup groups actually collapsed
  }

  test("minhashDedup == pairs->CC->survivors, incl. the shingle-less edge case") {
    val base = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs today",
      "completely different content about spark engines")
    val skewed = (0 until 30).map(i => (i.toLong, base(i % 3))) ++ Seq(
      (30L, "the quick brown fox jumps over the sleepy dog"),
      // two docs with IDENTICAL sub-3-token text: no shingles → Jaccard 0
      // → the doc-level pipeline must NOT cluster them, so the class
      // decomposition must keep them as singletons too
      (31L, "too short"), (32L, "too short"))
    val df = skewed.toDF("doc_id", "text")
    val viaPairs = D.dedupByClusters(df,
      D.connectedComponents(D.minhashNearDups(df, threshold = 0.2),
        "id_a", "id_b"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val viaClasses = D.minhashDedup(df, threshold = 0.2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaClasses == viaPairs)
    assert(viaClasses.contains(31L) && viaClasses.contains(32L))
    assert(viaClasses.size < skewed.size)
  }

  test("overlapFraction: exact counts, empty-doc and full-containment edges") {
    import graft.dedup.Dedup.overlapFraction
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    // doc 1: both 3-grams of "alpha beta gamma delta" -> 2/2 hit
    // doc 2: one of its three shingles matches ("beta gamma delta")
    // doc 3: disjoint; doc 4: under 3 tokens -> (0, 0)
    val train = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "zz beta gamma delta"),
      (3L, "one two three four"),
      (4L, "too short")).toDF("doc_id", "text")
    val byId = overlapFraction(train, bench)
      .select(col("doc_id"), col("n_shingles"), col("n_hit"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId == Map(1L -> ((2L, 2L)), 2L -> ((2L, 1L)),
      3L -> ((2L, 0L)), 4L -> ((0L, 0L))), byId.toString)
  }

  test("shingle jaccard: hand-computed value") {
    // doc1 vs doc3: 9 tokens each → 7 shingles; lazy→sleepy changes the
    // last two shingles → inter=5, union=9
    val j = docs.filter(col("doc_id") === 1)
      .crossJoin(docs.filter(col("doc_id") === 3).select(col("text").as("t2")))
      .select(D.shingleJaccard(col("text"), col("t2"))).head.getDouble(0)
    assert(j == 0.555556)
  }

  test("fingerprint is normalization-stable, discriminative") {
    val fps = docs.select(col("doc_id"), fingerprint(col("text"))).as[(Long, Long)]
      .collect().toMap
    assert(fps(1L) == fps(2L) && fps(1L) == fps(5L))
    assert(fps(1L) != fps(3L))
  }

  test("langId marker heuristic") {
    val got = Seq(
      "the cat and the dog of the house",
      "le chat et la maison de la ville est grande",
      "der hund und die katze ist nicht hier",
      "xyzzy plugh").toDF("text")
      .select(langId(col("text"))).as[String].collect()
    assert(got.sameElements(Array("en", "fr", "de", "unknown")))
  }

  test("simhashDedup radius monotonicity: survivors at dist<=k+1 are a " +
      "subset of survivors at dist<=k, and strictly fewer somewhere " +
      "across the fixture — the e4/e4b radius knob is order-safe") {
    // a larger radius only MERGES clusters, and a merged cluster's
    // min-id was one of its parts' min-ids, so the survivor set can
    // only shrink as the knob loosens — the property that makes the
    // production radius a tuning choice instead of a correctness one
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val surv = (0 to 3).map { k =>
      k -> D.simhashDedup(docs, maxDist = k)
        .select(col("doc_id")).as[Long].collect().toSet
    }.toMap
    for (k <- 0 to 2) {
      assert(surv(k + 1).subsetOf(surv(k)),
        s"dist<=${k + 1} kept a doc dist<=$k dropped: " +
          s"${(surv(k + 1) -- surv(k)).take(5)}")
    }
    assert(surv(3).size < surv(0).size,
      "the fixture never exercised a merge across the radius range")
  }
}
