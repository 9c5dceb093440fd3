package graft

import graft.similarity.VectorFunctions
import graft.text.TextFunctions._
import org.apache.spark.sql.functions._

/** Differential tests: every native kernel expression must be
  * bit-identical to its composed-HOF reference form on real data. */
class KernelSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf)
  lazy val embs = Tables.embeddings(spark, sf)

  test("tokenize kernel == HOF on all documents") {
    val diff = docs.select(tokens(col("text")).as("a"),
      tokensHof(col("text")).as("b")).filter(col("a") =!= col("b"))
    assert(diff.isEmpty)
    // whitespace edge cases
    import spark.implicits._
    val edge = Seq("  a\tb\nc  ", "", "   ", "ONE two\rTHREE").toDF("text")
    assert(edge.select(tokens(col("text")).as("a"),
      tokensHof(col("text")).as("b")).filter(col("a") =!= col("b")).isEmpty)
  }

  test("word-shingles kernel == HOF on all documents") {
    val diff = docs.select(wordShingles(col("text"), 3).as("a"),
      wordShinglesHof(col("text"), 3).as("b")).filter(col("a") =!= col("b"))
    assert(diff.isEmpty)
  }

  test("cosine kernel == HOF on embedding pairs (bit-identical)") {
    val a = embs.filter(col("vec_id") < 30)
      .select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = embs.filter(col("vec_id").between(30, 60))
      .select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b)
    val diff = pairs.select(
      VectorFunctions.cosine(col("va"), col("vb")).as("n"),
      VectorFunctions.cosineHof(col("va"), col("vb")).as("h"))
      .filter(col("n") =!= col("h"))
    assert(diff.isEmpty)
  }

  test("quantize/dequantize/code-dot kernels == HOF on all embeddings") {
    val q = VectorFunctions.quantizeU8(col("embedding"))
    val h = VectorFunctions.quantizeU8Hof(col("embedding"))
    val diff = embs.select(
      (q.getField("codes") === h.getField("codes")).as("c1"),
      (q.getField("vmin") === h.getField("vmin")).as("c2"),
      (q.getField("vmax") === h.getField("vmax")).as("c3"),
      (VectorFunctions.dequantizeU8(q) ===
        VectorFunctions.dequantizeU8Hof(h)).as("c4"),
      (VectorFunctions.codeDot(q.getField("codes"), h.getField("codes")) ===
        VectorFunctions.codeDotHof(q.getField("codes"), h.getField("codes")))
        .as("c5"))
      .filter(!col("c1") || !col("c2") || !col("c3") || !col("c4") || !col("c5"))
    assert(diff.isEmpty)
    // edge cases: constant vector (all-zero codes), empty vector,
    // null elements, length-mismatched code-dot
    val edge = spark.range(1).selectExpr(
      "array(cast(2.0 as float), cast(2.0 as float), cast(2.0 as float)) as va",
      "array(cast(1.0 as float), cast(null as float), cast(3.0 as float)) as vb",
      "cast(array() as array<float>) as ve")
    val ediff = edge.select(
      (VectorFunctions.quantizeU8(col("va")) <=>
        VectorFunctions.quantizeU8Hof(col("va"))).as("c1"),
      (VectorFunctions.quantizeU8(col("vb")) <=>
        VectorFunctions.quantizeU8Hof(col("vb"))).as("c2"),
      (VectorFunctions.dequantizeU8(VectorFunctions.quantizeU8(col("vb"))) <=>
        VectorFunctions.dequantizeU8Hof(VectorFunctions.quantizeU8Hof(col("vb"))))
        .as("c3"),
      (VectorFunctions.codeDot(
        VectorFunctions.quantizeU8(col("va")).getField("codes"),
        VectorFunctions.quantizeU8(col("vb")).getField("codes")) <=>
        VectorFunctions.codeDotHof(
          VectorFunctions.quantizeU8Hof(col("va")).getField("codes"),
          VectorFunctions.quantizeU8Hof(col("vb")).getField("codes"))).as("c4"),
      (VectorFunctions.quantizeU8(col("ve")) <=>
        VectorFunctions.quantizeU8Hof(col("ve"))).as("c5"),
      // length mismatch: zip_with pads with null => null sum on both sides
      (VectorFunctions.codeDot(
        VectorFunctions.quantizeU8(col("va")).getField("codes"),
        slice(VectorFunctions.quantizeU8(col("va")).getField("codes"), 1, 2)) <=>
        VectorFunctions.codeDotHof(
          VectorFunctions.quantizeU8Hof(col("va")).getField("codes"),
          slice(VectorFunctions.quantizeU8Hof(col("va")).getField("codes"), 1, 2)))
        .as("c6"))
      .filter(!col("c1") || !col("c2") || !col("c3") || !col("c4") ||
        !col("c5") || !col("c6"))
    assert(ediff.isEmpty)
  }

  test("lang-id kernel == HOF on all documents") {
    val diff = docs.select(
      graft.expressions.TextStatsExpressions.lang_id(col("text")).as("a"),
      langId(col("text")).as("b")).filter(col("a") =!= col("b"))
    assert(diff.isEmpty)
  }

  test("lang-id-scored: label always equals the unscored kernel; " +
      "confidence goldens — ambiguous text scores below the gate " +
      "threshold the hard argmax would wave through") {
    import spark.implicits._
    val T = graft.expressions.TextStatsExpressions
    // label parity on the whole corpus
    val diff = docs.select(
      T.lang_id_scored(col("text")).getField("lang").as("a"),
      T.lang_id(col("text")).as("b")).filter(col("a") =!= col("b"))
    assert(diff.isEmpty)
    // goldens: conf_permille = roundDiv(1000·best, Σ all marker hits)
    val got = Seq(
      "the and of to is in",  // 6 en hits, nothing else → 1000
      "the and la le",        // en 2, fr 2 (tie→en first), es 1 → 2000/5
      "le la les et",         // fr 4, es 1 → 4000/5
      "xyz qwerty")           // no marker anywhere
      .toDF("text")
      .select(T.lang_id_scored(col("text")).as("s"))
      .select(col("s.lang"), col("s.conf_permille"))
      .as[(String, Int)].collect().toSeq
    assert(got === Seq(("en", 1000), ("en", 400), ("fr", 800),
      ("unknown", 0)))
    // the e4 gate's point: conf >= 500 drops the 400-permille
    // ambiguous doc that lang == 'en' alone would keep
    assert(got(1)._2 < 500 && got(0)._2 >= 500)
  }

  test("text-stats kernel reproduces the HOF ratios on all documents") {
    val st = graft.expressions.TextStatsExpressions.text_stats(col("text"))
    val diff = docs.select(
      (st.getField("n_tokens") === tokenCount(col("text"))).as("c1"),
      (when(st.getField("n_tokens") === 0, 0.0)
        .otherwise(st.getField("n_stop").cast("double")
          / st.getField("n_tokens")) === stopwordRatio(col("text"))).as("c2"),
      (when(st.getField("n_chars") === 0, 0.0)
        .otherwise(st.getField("n_punct").cast("double")
          / st.getField("n_chars")) === punctRatio(col("text"))).as("c3"),
      (when(st.getField("n_chars") === 0, 0.0)
        .otherwise((st.getField("n_chars") - st.getField("n_nonalpha"))
          .cast("double") / st.getField("n_chars"))
        === alphaRatio(col("text"))).as("c4"))
      .filter(!col("c1") || !col("c2") || !col("c3") || !col("c4"))
    assert(diff.isEmpty)
  }

  test("lsh-code kernel == HOF on all embeddings (bit-identical)") {
    val diff = embs.select(
      VectorFunctions.lshCode(col("embedding"), 8, 64).as("n"),
      VectorFunctions.lshCodeHof(col("embedding"), 8, 64).as("h"))
      .filter(col("n") =!= col("h"))
    assert(diff.isEmpty)
  }

  test("learned-merges BPE kernel: hand-computed goldens") {
    import graft.expressions.BpeExpressions
    import spark.implicits._
    // FixtureMerges order: th, the, in, an, and, ... (see BpeExpressions)
    val cases = Seq(
      ("the", 1),     // t+h -> th; th+e -> the
      ("in", 1),      // i+n
      ("and", 1),     // a+n -> an; an+d -> and
      ("the and", 2), // [the][ ][and] -> the+' ' word-final merge -> [the ][and]
      ("sting", 2),   // i+n -> in; in+g -> ing; s+t -> st => [st][ing]
      ("zq", 2),      // no rule applies
      ("", 0))
    val got = cases.toDF("text", "expected")
      .select(col("expected"),
        BpeExpressions.bpe_token_count(col("text")).as("got"))
      .filter(col("expected") =!= col("got"))
    assert(got.isEmpty, got.collect().mkString(","))
  }

  test("BPE merges file parsing (GPT-2 merges.txt format)") {
    import graft.expressions.BpeExpressions
    val parsed = BpeExpressions.mergesFromLines(Iterator(
      "#version: fixture", "t h", "th e", "", "e  ")) // 'e'+' ' word-final
    assert(parsed == Seq("t" -> "h", "th" -> "e", "e" -> " "))
    // only the #version header is a comment: a rule whose first symbol
    // begins with '#' (hash runs in code corpora) must survive
    assert(BpeExpressions.mergesFromLines(Iterator("#version: 0.2", "# #"))
      == Seq("#" -> "#"))
  }

  test("every kernel expression is codegen'd — no fallback dispatch") {
    // CODEGEN_ONLY + fallback=false turn any codegen failure into a
    // thrown error instead of a silent interpreted fallback
    import graft.expressions.{TextHashExpressions => H, TextStatsExpressions => T}
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = docs
        .join(embs, col("doc_id") === col("vec_id"))
        .select(
          tokens(col("text")).as("tk"),
          wordShingles(col("text"), 3).as("sh"),
          H.poly_hash(col("text")).as("ph"),
          H.simhash32(tokens(col("text"))).as("sim"),
          H.minhash_sig(wordShingles(col("text"), 3),
            Seq(2L, 3L), Seq(5L, 7L)).as("mh"),
          T.lang_id(col("text")).as("lid"),
          T.text_stats(col("text")).as("st"),
          graft.expressions.BpeExpressions.bpe_token_count(col("text")).as("bpe"),
          VectorFunctions.cosine(col("embedding"), col("embedding")).as("cos"),
          VectorFunctions.lshCode(col("embedding"), 8, 64).as("lsh"),
          VectorFunctions.quantizeU8(col("embedding")).as("qz"),
          VectorFunctions.dequantizeU8(
            VectorFunctions.quantizeU8(col("embedding"))).as("dq"),
          VectorFunctions.codeDot(
            VectorFunctions.quantizeU8(col("embedding")).getField("codes"),
            VectorFunctions.quantizeU8(col("embedding")).getField("codes"))
            .as("cd"))
      assert(df.collect().nonEmpty)
      // the generated Java must call the compiled kernels directly
      val code = org.apache.spark.sql.execution.debug
        .codegenString(df.queryExecution.executedPlan)
      assert(code.contains(".kernel("), "expected direct kernel calls in codegen")
      assert(!code.contains("Found 0 WholeStageCodegen subtrees"))
    } finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
