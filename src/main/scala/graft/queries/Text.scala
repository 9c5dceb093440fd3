package graft.queries

import graft.{GQuery, Tables}
import graft.text.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines, gate-checked on
  * the documents table. Shared cross-engine primitive: the polynomial
  * rolling hash (see TextFunctions.polyHash ↔ the list_reduce fold in
  * the oracles). */
object Text {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** DuckDB fragment: whitespace tokens of a lowercased column. */
  private def sqlToksOf(c: String): String =
    s"list_filter(string_split_regex(lower(trim($c)), '\\s+'), x -> x != '')"

  private val SqlToks = sqlToksOf("text")

  val tokenStats: GQuery = GQuery(
    "t1_token_stats",
    (s, d) => {
      val st = graft.expressions.TextStatsExpressions.text_stats(col("text"))
      docs(s, d)
        .select(
          col("doc_id"),
          st.getField("n_tokens").as("n_tokens"),
          st.getField("n_distinct").as("n_distinct"),
          tokenCountBpe(col("text")).as("n_bpe"),
          round(when(st.getField("n_tokens") === 0, 0.0)
            .otherwise(st.getField("sum_token_len").cast("double")
              / st.getField("n_tokens")), 4).as("mean_tok_len"))
        .orderBy(col("doc_id"))
    },
    Some(s"""SELECT doc_id,
            len($SqlToks) AS n_tokens,
            len(list_distinct($SqlToks)) AS n_distinct,
            len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_bpe,
            round(CASE WHEN len($SqlToks) = 0 THEN 0.0
              ELSE CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform($SqlToks, t -> CAST(length(t) AS BIGINT))),
                     (a, b) -> a + b) AS DOUBLE) / len($SqlToks) END, 4)
              AS mean_tok_len
            FROM documents ORDER BY doc_id"""))

  /** Exact integer quality millis (quality × 10⁴ as BIGINT) from the
    * five text-stats counters — the single formula behind t2's quality
    * column and t12's curriculum key. */
  private def qualityMilli(nTok: Column, nChars: Column, nStop: Column,
      nPunct: Column, nAlpha: Column): Column = {
    val qN = least(nTok, lit(100L)) * nChars * nTok * 3L +
      nAlpha * nTok * 300L + (nChars - nPunct) * nTok * 200L +
      nStop * nChars * 200L
    when(nTok === 0 || nChars === 0, lit(0L))
      .otherwise(
        floor((qN * 20L + nChars * nTok) / (nChars * nTok * 2L))
          .cast("long"))
  }

  /** The t2 quality-milli SQL fragment over the CTE columns nt/nc/ns/
    * np/n_nonalpha (see t2's oracle). */
  private val SqlQualityMilli =
    """CASE WHEN nt = 0 OR nc = 0 THEN 0
       ELSE ((least(nt, 100) * nc * nt * 3
              + (nc - n_nonalpha) * nt * 300
              + (nc - np) * nt * 200
              + ns * nc * 200) * 20 + nc * nt) // (nc * nt * 2) END"""

  /** The t2 stats CTE (nt/nc/ns/np/n_nonalpha per doc). */
  private val SqlQualityStats =
    s"""WITH t AS (
          SELECT doc_id, text, $SqlToks AS toks,
            CAST(length(text) AS BIGINT) AS nc FROM documents),
        c AS (SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS nt, nc,
          CAST(len(list_filter(toks, x -> list_contains(
            ['the','a','an','and','or','of','to','in','is','are','was',
             'for','on','with','as','by','at','it','this','that'], x)))
            AS BIGINT) AS ns,
          nc - CAST(length(regexp_replace(text, '[[:punct:]]', '', 'g'))
            AS BIGINT) AS np,
          nc - CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g'))
            AS BIGINT) AS n_nonalpha
          FROM t)"""

  val quality: GQuery = GQuery(
    "t2_quality_score",
    (s, d) => {
      // All ratios projected off ONE text-stats evaluation, rounded via
      // EXACT integer arithmetic: round_half_up(P/Q)·1e-4 computed as
      // floor((2·P·1e4 + Q)/(2Q))/1e4. Double-round of a float sum sits
      // on .00005 boundaries differently per engine (observed once in
      // 5000 docs at sf0.1); integer rationals cannot.
      val st = graft.expressions.TextStatsExpressions.text_stats(col("text"))
      val nTok = st.getField("n_tokens").cast("long")
      val nChars = st.getField("n_chars").cast("long")
      val nStop = st.getField("n_stop").cast("long")
      val nPunct = st.getField("n_punct").cast("long")
      val nAlpha = (nChars - st.getField("n_nonalpha")).cast("long")
      def r4(p: Column, q: Column): Column =
        when(q === 0, lit(0.0)).otherwise(
          floor((p * 20000L + q) / (q * 2L)).cast("long").cast("double") / 10000.0)
      // quality = 3·min(nt,100)·nc·nt/1000·nc·nt + ... over the common
      // denominator 1000·nc·nt → exact integer millis (shared helper);
      // token-less or empty docs are junk by definition: quality 0
      val quality =
        qualityMilli(nTok, nChars, nStop, nPunct, nAlpha)
          .cast("double") / 10000.0
      docs(s, d)
        .select(
          col("doc_id"),
          r4(nStop, nTok).as("stopword_ratio"),
          r4(nPunct, nChars).as("punct_ratio"),
          r4(nAlpha, nChars).as("alpha_ratio"),
          quality.as("quality"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH t AS (
              SELECT doc_id, text, $SqlToks AS toks,
                CAST(length(text) AS BIGINT) AS nc FROM documents),
            c AS (SELECT doc_id,
              CAST(len(toks) AS BIGINT) AS nt, nc,
              CAST(len(list_filter(toks, x -> list_contains(
                ['the','a','an','and','or','of','to','in','is','are','was',
                 'for','on','with','as','by','at','it','this','that'], x)))
                AS BIGINT) AS ns,
              nc - CAST(length(regexp_replace(text, '[[:punct:]]', '', 'g'))
                AS BIGINT) AS np,
              nc - CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g'))
                AS BIGINT) AS n_nonalpha
              FROM t)
            SELECT doc_id,
              CASE WHEN nt = 0 THEN 0.0
                ELSE ((ns * 20000 + nt) // (nt * 2)) / 10000.0 END
                AS stopword_ratio,
              CASE WHEN nc = 0 THEN 0.0
                ELSE ((np * 20000 + nc) // (nc * 2)) / 10000.0 END
                AS punct_ratio,
              CASE WHEN nc = 0 THEN 0.0
                ELSE (((nc - n_nonalpha) * 20000 + nc) // (nc * 2)) / 10000.0 END
                AS alpha_ratio,
              CASE WHEN nt = 0 OR nc = 0 THEN 0.0
                ELSE (((least(nt, 100) * nc * nt * 3
                        + (nc - n_nonalpha) * nt * 300
                        + (nc - np) * nt * 200
                        + ns * nc * 200) * 20 + nc * nt) // (nc * nt * 2))
                     / 10000.0 END AS quality
            FROM c ORDER BY doc_id"""))

  val langIdQ: GQuery = GQuery(
    "t3_lang_id",
    (s, d) =>
      docs(s, d)
        .select(col("doc_id"),
          graft.expressions.TextStatsExpressions.lang_id(col("text"))
            .as("lang_guess"))
        .orderBy(col("doc_id")),
    Some(s"""WITH t AS (SELECT doc_id, list_distinct($SqlToks) AS ts
              FROM documents),
            sc AS (SELECT doc_id,
              len(list_intersect(ts, ['the','and','of','to','is','in','that','it','for','with'])) AS s_en,
              len(list_intersect(ts, ['le','la','les','et','de','un','une','est','que','pour'])) AS s_fr,
              len(list_intersect(ts, ['el','la','los','las','y','de','que','es','en','por'])) AS s_es,
              len(list_intersect(ts, ['der','die','das','und','ist','von','mit','den','nicht','ein'])) AS s_de
              FROM t),
            mx AS (SELECT *, greatest(s_en, s_fr, s_es, s_de) AS m FROM sc)
            SELECT doc_id,
              CASE WHEN m = 0 THEN 'unknown'
                   WHEN s_en = m THEN 'en' WHEN s_fr = m THEN 'fr'
                   WHEN s_es = m THEN 'es' ELSE 'de' END AS lang_guess
            FROM mx ORDER BY doc_id"""))

  /** t3 with the confidence a curation gate thresholds: the winning
    * language's share of all marker hits as an exact per-mille (integer
    * round-half-away — [[graft.queries.Exact.roundDiv]]), 0 for
    * unknown. The label column must equal t3's verbatim; e4 consumes
    * the threshold form. */
  val langIdScoredQ: GQuery = GQuery(
    "t3b_lang_id_scored",
    (s, d) => {
      val sc = graft.expressions.TextStatsExpressions
        .lang_id_scored(col("text"))
      docs(s, d)
        .select(col("doc_id"), sc.getField("lang").as("lang_guess"),
          sc.getField("conf_permille").cast("long").as("conf_permille"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id, list_distinct($SqlToks) AS ts
              FROM documents),
            sc AS (SELECT doc_id,
              len(list_intersect(ts, ['the','and','of','to','is','in','that','it','for','with'])) AS s_en,
              len(list_intersect(ts, ['le','la','les','et','de','un','une','est','que','pour'])) AS s_fr,
              len(list_intersect(ts, ['el','la','los','las','y','de','que','es','en','por'])) AS s_es,
              len(list_intersect(ts, ['der','die','das','und','ist','von','mit','den','nicht','ein'])) AS s_de
              FROM t),
            mx AS (SELECT *, greatest(s_en, s_fr, s_es, s_de) AS m,
              s_en + s_fr + s_es + s_de AS tot FROM sc)
            SELECT doc_id,
              CASE WHEN m = 0 THEN 'unknown'
                   WHEN s_en = m THEN 'en' WHEN s_fr = m THEN 'fr'
                   WHEN s_es = m THEN 'es' ELSE 'de' END AS lang_guess,
              CAST(CASE WHEN m = 0 THEN 0
                ELSE ${Exact.roundDivSqlPos("1000 * m", "tot")} END
                AS BIGINT) AS conf_permille
            FROM mx ORDER BY doc_id"""))

  val fingerprintQ: GQuery = GQuery(
    "t4_fingerprint",
    (s, d) =>
      docs(s, d)
        .select(col("doc_id"), fingerprint(col("text")).as("fp"),
          md5(normalizedText(col("text"))).as("fp_md5"))
        .orderBy(col("doc_id")),
    Some("""WITH n AS (SELECT doc_id,
              trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                   ' +', ' ', 'g')) AS norm
              FROM documents)
            SELECT doc_id,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(norm, ''),
                  c -> CAST(ord(c) AS BIGINT))),
                (h, c) -> (h * 31 + c) % 1000000007) AS fp,
              md5(norm) AS fp_md5
            FROM n ORDER BY doc_id"""))

  /** Word-3-gram shingling, the substrate of MinHash: count + first
    * shingle + its polynomial hash. */
  val shinglesQ: GQuery = GQuery(
    "t5_shingles",
    (s, d) =>
      docs(s, d)
        .select(
          col("doc_id"),
          size(wordShingles(col("text"), 3)).as("n_shingles"),
          get(wordShingles(col("text"), 3), lit(0)).as("first_shingle"),
          // hash only the first shingle (hashing all ~300 then taking
          // element 0 costs 300× more)
          graft.expressions.TextHashExpressions.poly_hash(
            get(wordShingles(col("text"), 3), lit(0))).as("first_shingle_hash"))
        .orderBy(col("doc_id")),
    Some(s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
            sh AS (SELECT doc_id,
              list_transform(range(greatest(len(toks) - 2, 0)),
                j -> array_to_string(toks[j+1:j+3], ' ')) AS shingles
              FROM t)
            SELECT doc_id, len(shingles) AS n_shingles,
              shingles[1] AS first_shingle,
              CASE WHEN len(shingles) = 0 THEN NULL
                ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(shingles[1], ''),
                    c -> CAST(ord(c) AS BIGINT))),
                  (h, c) -> (h * 31 + c) % 1000000007) END AS first_shingle_hash
            FROM sh ORDER BY doc_id"""))

  /** REAL learned-merges BPE (expressions/BpeExpressions): the oracle
    * replays the identical merge list as nested SQL replace() calls over
    * a "(sym)(sym)" state encoding — one replace per rule is exactly
    * exhaustive BPE application because a merged symbol never recreates
    * its own pattern (see BpeTokenCount scaladoc). The heuristic
    * pre-tokenizer count (t1's n_bpe) rides along for comparison. */
  val bpeTokens: GQuery = {
    val init = "regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', " +
      "'', 'g'), '(.)', '(\\1)', 'g')"
    val folded = graft.expressions.BpeExpressions.FixtureMerges
      .foldLeft(init) { case (acc, (a, b)) =>
        s"replace($acc, '($a)($b)', '($a$b)')"
      }
    GQuery(
      "t6_bpe_tokens",
      (s, d) =>
        docs(s, d)
          .select(
            col("doc_id"),
            graft.expressions.BpeExpressions
              .bpe_token_count(bpeNormalize(col("text")))
              .cast("long").as("n_bpe_real"),
            tokenCountBpe(col("text")).cast("long").as("n_pretok"))
          .orderBy(col("doc_id")),
      Some(s"""WITH st AS (SELECT doc_id, text, $folded AS enc FROM documents)
            SELECT doc_id,
              CAST(length(enc) - length(replace(enc, '(', '')) AS BIGINT)
                AS n_bpe_real,
              CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT)
                AS n_pretok
            FROM st ORDER BY doc_id"""))
  }

  /** Token-bounded overlapping chunking (context-window prep): chunk 32,
    * overlap 8 → stride 24. The oracle re-derives every chunk's text via
    * list slicing, so boundary arithmetic (short last chunks, short
    * docs, empty docs) is hash-checked, not just counted. */
  val chunking: GQuery = GQuery(
    "t7_chunking",
    (s, d) =>
      chunkDocuments(
        docs(s, d).select(col("doc_id"), col("text")), "text",
        chunkTokens = 32, overlap = 8)
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("chunk_text"), col("n_chunk_tokens").cast("long")
            .as("n_chunk_tokens"))
        .orderBy(col("doc_id"), col("chunk_idx")),
    Some(s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
            n AS (SELECT doc_id, toks,
              CASE WHEN len(toks) = 0 THEN 0
                ELSE greatest(CAST(ceil((len(toks) - 8) / 24.0) AS BIGINT), 1)
              END AS n_chunks FROM t),
            c AS (SELECT doc_id, toks, CAST(i AS BIGINT) AS chunk_idx
              FROM n, unnest(range(n_chunks)) AS u(i))
            SELECT doc_id, chunk_idx,
              array_to_string(toks[chunk_idx*24+1 : chunk_idx*24+32], ' ')
                AS chunk_text,
              CAST(len(toks[chunk_idx*24+1 : chunk_idx*24+32]) AS BIGINT)
                AS n_chunk_tokens
            FROM c ORDER BY doc_id, chunk_idx"""))

  /** Composite corpus curation — the end-to-end training-data shape in
    * ONE query plan: quality/language gate (t2/t3 kernels) → exact-dedup
    * survivors (d1) → chunking (t7) → per-doc chunk stats. Exercises
    * kernel composition + window dedup + explode in a single plan the
    * optimizer must fuse; the oracle replays the identical chain. */
  val corpusCuration: GQuery = GQuery(
    "c1_corpus_curation",
    (s, d) => {
      val st = graft.expressions.TextStatsExpressions.text_stats(col("text"))
      val lang = graft.expressions.TextStatsExpressions.lang_id(col("text"))
      val filtered = docs(s, d)
        .withColumn("_nt", st.getField("n_tokens"))
        .filter(lang === "en" && col("_nt") >= lit(20))
      val surviving = graft.dedup.Dedup
        .exactDedup(filtered, "text", "doc_id")
      chunkDocuments(surviving.select(col("doc_id"), col("text")), "text",
        chunkTokens = 32, overlap = 8)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_chunk_tokens").cast("long")).as("total_chunk_tokens"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH t0 AS (SELECT doc_id, text, $SqlToks AS toks FROM documents),
            langed AS (SELECT doc_id, text, toks FROM (
              SELECT doc_id, text, toks,
                len(list_intersect(list_distinct(toks),
                  ['the','and','of','to','is','in','that','it','for','with'])) AS s_en,
                len(list_intersect(list_distinct(toks),
                  ['le','la','les','et','de','un','une','est','que','pour'])) AS s_fr,
                len(list_intersect(list_distinct(toks),
                  ['el','la','los','las','y','de','que','es','en','por'])) AS s_es,
                len(list_intersect(list_distinct(toks),
                  ['der','die','das','und','ist','von','mit','den','nicht','ein'])) AS s_de
              FROM t0)
              WHERE greatest(s_en, s_fr, s_es, s_de) > 0
                AND s_en = greatest(s_en, s_fr, s_es, s_de)
                AND len(toks) >= 20),
            survivors AS (SELECT doc_id, toks FROM (
              SELECT doc_id, toks, row_number() OVER (
                PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))
                ORDER BY doc_id) AS rn
              FROM langed) WHERE rn = 1),
            n AS (SELECT doc_id, toks,
              greatest(CAST(ceil((len(toks) - 8) / 24.0) AS BIGINT), 1)
                AS n_chunks FROM survivors),
            c AS (SELECT doc_id, toks, CAST(i AS BIGINT) AS chunk_idx
              FROM n, unnest(range(n_chunks)) AS u(i))
            SELECT doc_id, count(*) AS n_chunks,
              CAST(sum(len(toks[chunk_idx*24+1 : chunk_idx*24+32]) ) AS BIGINT)
                AS total_chunk_tokens
            FROM c GROUP BY doc_id ORDER BY doc_id"""))

  /** Deterministic stratified sampling — training-data mixing by
    * language at per-stratum rates (en 15%, fr 40%, es 65%, de 90%,
    * unknown 100%), decided by content fingerprint % 1000 so the cut
    * is reproducible across engines and re-sharding. The oracle
    * replays lang-id (t3), fingerprint (t4), and the rate CASE. */
  val stratifiedSampleQ: GQuery = GQuery(
    "p15_stratified_sample",
    (s, d) => {
      val lang = graft.expressions.TextStatsExpressions.lang_id(col("text"))
      val withCols = docs(s, d)
        .withColumn("lang", lang)
        .withColumn("fp", fingerprint(col("text")))
      graft.operators.Sampling.stratifiedSample(
        withCols, col("lang"), col("fp"),
        Map("en" -> 150, "fr" -> 400, "es" -> 650, "de" -> 900),
        defaultRate = 1000)
        .select(col("doc_id"), col("lang"),
          pmod(col("fp"), lit(1000)).as("bucket"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id, list_distinct($SqlToks) AS ts,
              trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                   ' +', ' ', 'g')) AS norm
              FROM documents),
            sc AS (SELECT doc_id, norm,
              len(list_intersect(ts, ['the','and','of','to','is','in','that','it','for','with'])) AS s_en,
              len(list_intersect(ts, ['le','la','les','et','de','un','une','est','que','pour'])) AS s_fr,
              len(list_intersect(ts, ['el','la','los','las','y','de','que','es','en','por'])) AS s_es,
              len(list_intersect(ts, ['der','die','das','und','ist','von','mit','den','nicht','ein'])) AS s_de
              FROM t),
            lg AS (SELECT doc_id, norm,
              CASE WHEN greatest(s_en, s_fr, s_es, s_de) = 0 THEN 'unknown'
                   WHEN s_en = greatest(s_en, s_fr, s_es, s_de) THEN 'en'
                   WHEN s_fr = greatest(s_en, s_fr, s_es, s_de) THEN 'fr'
                   WHEN s_es = greatest(s_en, s_fr, s_es, s_de) THEN 'es'
                   ELSE 'de' END AS lang
              FROM sc),
            fp AS (SELECT doc_id, lang,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(norm, ''),
                  c -> CAST(ord(c) AS BIGINT))),
                (h, c) -> (h * 31 + c) % 1000000007) % 1000 AS bucket
              FROM lg)
            SELECT doc_id, lang, bucket FROM fp
            WHERE bucket < CASE lang WHEN 'en' THEN 150 WHEN 'fr' THEN 400
              WHEN 'es' THEN 650 WHEN 'de' THEN 900 ELSE 1000 END
            ORDER BY doc_id"""))

  /** Sequence packing over the t7 chunk stream: 8 shards (doc_id % 8),
    * capacity-64 concat-and-split, per-chunk (seq_id, seq_offset)
    * assignment. The oracle replays chunking + the same shard window
    * with integer div/mod — every boundary straddle is hash-checked. */
  val sequencePackingQ: GQuery = GQuery(
    "c2_sequence_packing",
    (s, d) => {
      val chunks = chunkDocuments(
        docs(s, d).select(col("doc_id"), col("text")), "text",
        chunkTokens = 32, overlap = 8)
        .withColumn("shard", col("doc_id") % 8)
      graft.operators.Packing.packSequences(
        chunks, "n_chunk_tokens", col("shard"),
        Seq(col("doc_id"), col("chunk_idx")), capacity = 64)
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("shard"), col("seq_id"),
          col("seq_offset").cast("long").as("seq_offset"),
          col("n_chunk_tokens").cast("long").as("n_chunk_tokens"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
            n AS (SELECT doc_id, toks,
              CASE WHEN len(toks) = 0 THEN 0
                ELSE greatest(CAST(ceil((len(toks) - 8) / 24.0) AS BIGINT), 1)
              END AS n_chunks FROM t),
            c AS (SELECT doc_id, toks, CAST(i AS BIGINT) AS chunk_idx
              FROM n, unnest(range(n_chunks)) AS u(i)),
            ch AS (SELECT doc_id, chunk_idx,
              CAST(len(toks[chunk_idx*24+1 : chunk_idx*24+32]) AS BIGINT) AS n
              FROM c),
            w AS (SELECT doc_id, chunk_idx, doc_id % 8 AS shard, n,
              sum(n) OVER (PARTITION BY doc_id % 8
                ORDER BY doc_id, chunk_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
                AS cum_excl
              FROM ch)
            SELECT doc_id, chunk_idx, shard,
              CAST(cum_excl // 64 AS BIGINT) AS seq_id,
              CAST(cum_excl % 64 AS BIGINT) AS seq_offset,
              n AS n_chunk_tokens
            FROM w ORDER BY doc_id, chunk_idx"""))

  /** Top-5 tf·idf terms per doc with rational idf (exact integers end
    * to end — see TextFunctions.tfIdfTopK). The oracle replays the
    * identical tf/df/N arithmetic. */
  val tfIdfQ: GQuery = GQuery(
    "t8_tfidf",
    (s, d) =>
      graft.text.TextFunctions.tfIdfTopK(
        docs(s, d).select(col("doc_id"), col("text")), "text", "doc_id",
        k = 5)
        .select(col("doc_id"), col("rank").cast("long").as("rank"),
          col("term"), col("tf"), col("df"), col("score"))
        .orderBy(col("doc_id"), col("rank")),
    Some(s"""WITH t AS (SELECT doc_id, unnest($SqlToks) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
            df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t
              GROUP BY 1),
            n AS (SELECT count(*) AS nd FROM documents),
            sc AS (SELECT doc_id, term, tf, df,
              CAST(tf * ((nd * 1000000) // df) AS BIGINT) AS score
              FROM tf JOIN df USING (term), n),
            r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term) AS rank FROM sc)
            SELECT doc_id, rank, term, tf, df, score FROM r
            WHERE rank <= 5 ORDER BY doc_id, rank"""))

  /** Corpus vocabulary top-100 by occurrences (the vocab-build step
    * before tokenizer training). */
  val vocabQ: GQuery = GQuery(
    "t9_vocab",
    (s, d) =>
      graft.text.TextFunctions.vocabulary(
        docs(s, d).select(col("doc_id"), col("text")), "text", "doc_id",
        topN = 100)
        .orderBy(col("n_occur").desc, col("term")),
    Some(s"""WITH t AS (SELECT doc_id, unnest($SqlToks) AS term
              FROM documents)
            SELECT term, count(*) AS n_occur,
              count(DISTINCT doc_id) AS df
            FROM t GROUP BY term
            ORDER BY n_occur DESC, term LIMIT 100"""))

  /** PII redaction. The synthetic corpus carries no PII, so the gate
    * deterministically APPENDS doc-keyed email/phone/IP strings on both
    * sides first — redaction then runs over 5k real-text rows with
    * planted matches, and the full redacted text is hash-compared. */
  val redactQ: GQuery = GQuery(
    "t10_redact",
    (s, d) => {
      import graft.text.TextFunctions.{redactPii, piiCounts}
      val aug = docs(s, d).withColumn("t",
        concat(col("text"), lit(" reach user"),
          col("doc_id").cast("string"),
          lit("@example.com or 555-123-4567 or 10.0.0."),
          pmod(col("doc_id"), lit(256)).cast("string")))
      val c = piiCounts(col("t"))
      aug.select(col("doc_id"), redactPii(col("t")).as("red"),
          c.getField("n_email").cast("long").as("n_email"),
          c.getField("n_ssn").cast("long").as("n_ssn"),
          c.getField("n_phone").cast("long").as("n_phone"),
          c.getField("n_ip").cast("long").as("n_ip"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH aug AS (SELECT doc_id,
              text || ' reach user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or 555-123-4567 or 10.0.0.'
                   || CAST(doc_id % 256 AS VARCHAR) AS t
              FROM documents)
            SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
                '\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\b', '<PHONE>', 'g'),
                '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')
                AS red,
              CAST(len(regexp_extract_all(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                AS n_email,
              CAST(len(regexp_extract_all(t,
                '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ssn,
              CAST(len(regexp_extract_all(t,
                '\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\b')) AS BIGINT) AS n_phone,
              CAST(len(regexp_extract_all(t,
                '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT)
                AS n_ip
            FROM aug ORDER BY doc_id"""))

  /** Bigram repetition (boilerplate) stats, exact integers only. */
  val repetitionQ: GQuery = GQuery(
    "t11_repetition",
    (s, d) =>
      graft.text.TextFunctions.bigramRepetition(
        docs(s, d).select(col("doc_id"), col("text")), "text", "doc_id")
        .orderBy(col("doc_id")),
    Some(s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
            bg AS (SELECT doc_id, array_to_string(toks[j+1:j+2], ' ') AS b
              FROM t, unnest(range(greatest(len(toks) - 1, 0))) AS u(j)),
            c AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
            d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
              count(*) AS n_distinct_bigrams, max(c) AS top_count
              FROM c GROUP BY 1),
            tb AS (SELECT c.doc_id, min(b) AS top_bigram
              FROM c JOIN d ON c.doc_id = d.doc_id AND c.c = d.top_count
              GROUP BY 1)
            SELECT doc.doc_id,
              coalesce(n_bigrams, 0) AS n_bigrams,
              coalesce(n_distinct_bigrams, 0) AS n_distinct_bigrams,
              coalesce(top_count, 0) AS top_count,
              coalesce(top_bigram, '') AS top_bigram
            FROM documents doc
            LEFT JOIN d ON doc.doc_id = d.doc_id
            LEFT JOIN tb ON doc.doc_id = tb.doc_id
            ORDER BY doc.doc_id"""))

  /** Mixture composition report: docs + tokens per (source, lang) with
    * exact per-mille token share (integer-rational rounding, no float
    * division) — the bookkeeping view behind every mixing decision.
    * The corpus total folds in via crossJoin(broadcast(re-agg of the
    * grouped frame)), so the corpus is scanned once and the share math
    * runs on a handful of grouped rows. */
  val mixtureQ: GQuery = GQuery(
    "a12_mixture",
    (s, d) => {
      val g = docs(s, d).groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(tokenCount(col("text"))).as("n_tokens"))
      val total = g.agg(sum(col("n_tokens")).as("_tot"))
      g.crossJoin(broadcast(total))
        .withColumn("share_pm",
          Exact.roundDiv(col("n_tokens") * 1000, col("_tot")))
        .drop("_tot")
        .orderBy(col("source"), col("lang"))
    },
    Some(s"""WITH g AS (SELECT source, lang, count(*) AS n_docs,
              CAST(sum(len($SqlToks)) AS BIGINT) AS n_tokens
              FROM documents GROUP BY source, lang),
            t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM g)
            SELECT source, lang, n_docs, n_tokens,
              CAST(${Exact.roundDivSqlPos("n_tokens * 1000", "tot")}
                AS BIGINT) AS share_pm
            FROM g, t ORDER BY source, lang"""))

  /** Curriculum buckets: exact global quality rank WITHOUT a global
    * sort (histogram-offset decomposition — see operators/Ranking) and
    * equal-frequency decile assignment in integer arithmetic. The
    * oracle computes the same rank with a plain global row_number. */
  val curriculumQ: GQuery = GQuery(
    "t12_curriculum",
    (s, d) => {
      val st = graft.expressions.TextStatsExpressions.text_stats(col("text"))
      val nTok = st.getField("n_tokens").cast("long")
      val nChars = st.getField("n_chars").cast("long")
      val nStop = st.getField("n_stop").cast("long")
      val nPunct = st.getField("n_punct").cast("long")
      val nAlpha = (nChars - st.getField("n_nonalpha")).cast("long")
      val base = docs(s, d).select(col("doc_id"),
        qualityMilli(nTok, nChars, nStop, nPunct, nAlpha).as("quality_m"))
      graft.operators.Ranking.curriculumBuckets(base, "quality_m", "doc_id",
        nBuckets = 10)
        .select(col("doc_id"), col("quality_m"), col("global_rank"),
          col("bucket").cast("long").as("bucket"))
        .orderBy(col("doc_id"))
    },
    Some(s"""$SqlQualityStats,
            q AS (SELECT doc_id, CAST($SqlQualityMilli AS BIGINT)
              AS quality_m FROM c),
            r AS (SELECT doc_id, quality_m, row_number() OVER (
              ORDER BY quality_m, doc_id) AS global_rank FROM q),
            n AS (SELECT count(*) AS nn FROM documents)
            SELECT doc_id, quality_m, global_rank,
              CAST(((global_rank - 1) * 10) // nn + 1 AS BIGINT) AS bucket
            FROM r, n ORDER BY doc_id"""))

  /** Token-budget selection: take the highest-quality docs until 60%
    * of the corpus token mass is reached — the "best docs under a
    * budget" curation step, built on the sort-free global prefix sum
    * (operators/Ranking.globalPrefixSum; quality negated so the
    * bounded-cardinality coarse key sorts descending). Budget compare
    * stays in integers (cum·10 ≤ total·6). */
  val budgetSelectQ: GQuery = GQuery(
    "c3_budget_select",
    (s, d) => {
      val st = graft.expressions.TextStatsExpressions.text_stats(col("text"))
      val nTok = st.getField("n_tokens").cast("long")
      val nChars = st.getField("n_chars").cast("long")
      val nStop = st.getField("n_stop").cast("long")
      val nPunct = st.getField("n_punct").cast("long")
      val nAlpha = (nChars - st.getField("n_nonalpha")).cast("long")
      val base = docs(s, d).select(col("doc_id"),
        qualityMilli(nTok, nChars, nStop, nPunct, nAlpha).as("quality_m"),
        nTok.as("n_tokens"))
        .withColumn("_neg_q", -col("quality_m"))
      val withCum = graft.operators.Ranking.globalPrefixSum(
        base, "_neg_q", "doc_id", "n_tokens", as = "cum_tokens")
      val total = base.agg(sum(col("n_tokens")).as("_tot"))
      withCum.crossJoin(broadcast(total))
        .filter(col("cum_tokens") * 10 <= col("_tot") * 6)
        .select(col("doc_id"), col("quality_m"), col("n_tokens"),
          col("cum_tokens"))
        .orderBy(col("doc_id"))
    },
    Some(s"""$SqlQualityStats,
            q AS (SELECT doc_id, CAST($SqlQualityMilli AS BIGINT)
              AS quality_m, nt AS n_tokens FROM c),
            w AS (SELECT doc_id, quality_m, n_tokens,
              CAST(sum(n_tokens) OVER (ORDER BY quality_m DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_tokens FROM q),
            tt AS (SELECT CAST(sum(nt) AS BIGINT) AS tot FROM c)
            SELECT doc_id, quality_m, n_tokens, cum_tokens FROM w, tt
            WHERE cum_tokens * 10 <= tot * 6 ORDER BY doc_id"""))

  /** C4: deterministic train/valid/test split — multiplicative-hash
    * bucket of the doc id, 90/5/5. Pure integer arithmetic (identical
    * in any engine), partition-invariant, stable under re-runs and
    * corpus growth: a doc's split never changes when other docs are
    * added, which is the property that keeps eval sets frozen across
    * pipeline versions. At 100 TB this is a row-local projection —
    * no shuffle, no state. */
  val splitAssignQ: GQuery = GQuery(
    "c4_split_assign",
    (s, d) =>
      docs(s, d)
        .select(col("doc_id"),
          pmod(pmod(pmod(col("doc_id"), lit(1000000007L)) * lit(2654435761L),
            lit(1000000007L)), lit(100L)).cast("long").as("bucket"))
        .withColumn("split",
          when(col("bucket") < 90, lit("train"))
            .when(col("bucket") < 95, lit("valid"))
            .otherwise(lit("test")))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
              CAST((doc_id % 1000000007 * 2654435761) % 1000000007 % 100 AS BIGINT)
                AS bucket,
              CASE WHEN (doc_id % 1000000007 * 2654435761) % 1000000007 % 100 < 90
                   THEN 'train'
                   WHEN (doc_id % 1000000007 * 2654435761) % 1000000007 % 100 < 95
                   THEN 'valid' ELSE 'test' END AS split
            FROM documents ORDER BY doc_id"""))

  /** T13: unigram-LM surprisal scoring — the perplexity-proxy quality
    * filter: rare-token-heavy docs score high. The per-token weight is
    * the RATIONAL inverse frequency (N·10⁶) div count — a monotone
    * transform of -log p kept in exact BIGINT arithmetic (same reason
    * as t8's rational idf: float ln() differs in the last ulp across
    * libms). Scale shape: explode → one keyed agg for counts, rejoined
    * on term (broadcast while the vocab fits, shuffle-join beyond), the
    * corpus total via broadcast cross join; headroom: N·10⁶ < 2⁶³ holds
    * to ~9e12 corpus tokens — raise the scale divisor past that. */
  val surprisalQ: GQuery = GQuery(
    "t13_surprisal",
    (s, d) => {
      val tok = docs(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val cnt = tok.groupBy(col("term")).agg(count(lit(1)).as("c"))
      val tot = tok.agg(count(lit(1)).as("n"))
      val w = Exact.idiv(col("n") * lit(1000000L), col("c"))
      tok.join(cnt, Seq("term")).crossJoin(broadcast(tot))
        .withColumn("w", w)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("w")).as("surprisal_sum"))
        .withColumn("surprisal_mean",
          Exact.idiv(col("surprisal_sum"), col("n_tokens")))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH tok AS (SELECT doc_id, unnest($SqlToks) AS term
              FROM documents),
            cnt AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
            tot AS (SELECT count(*) AS n FROM tok)
            SELECT t.doc_id, count(*) AS n_tokens,
              CAST(sum((tot.n * 1000000) // c.c) AS BIGINT)
                AS surprisal_sum,
              CAST(CAST(sum((tot.n * 1000000) // c.c) AS BIGINT)
                // count(*) AS BIGINT) AS surprisal_mean
            FROM tok t JOIN cnt c USING (term), tot
            GROUP BY t.doc_id ORDER BY t.doc_id"""))

  /** Deterministic weighted sample (sequential Poisson / order
    * sampling): draw 200 documents with inclusion probability growing
    * ∝ n_chars — the "sample long documents preferentially" draw of a
    * mixing pipeline — reproducible across engines because the
    * priority is exact integer arithmetic on the affine hash, never a
    * float. Top-n executes as TakeOrderedAndProject (per-partition
    * heaps), not a global sort. */
  val weightedSampleQ: GQuery = GQuery(
    "p16_weighted_sample",
    (s, d) => graft.operators.Sampling
      .weightedSample(docs(s, d), "doc_id", "n_chars", n = 200)
      .select(col("doc_id"), col("n_chars"), col("sample_priority"))
      .orderBy(col("sample_priority"), col("doc_id")),
    Some("""SELECT doc_id, n_chars,
              ((654435747 * doc_id +
                (CAST(40503 AS BIGINT) * 69069) % 1000000007) % 1000000007
                * 1000000) // n_chars AS sample_priority
            FROM documents WHERE n_chars > 0
            ORDER BY sample_priority, doc_id LIMIT 200"""))

  /** t14: positional phrase search over the inverted token index —
    * every document containing "big order scan" as consecutive tokens
    * (anchor-intersection, one shuffle; see text/InvertedIndex.scala).
    * Oracle enumerates token windows in DuckDB directly. */
  val phraseIndexQ: GQuery = GQuery(
    "t14_phrase_index",
    (s, d) => {
      val idx = graft.text.InvertedIndex.postings(
        docs(s, d).select(col("doc_id"), col("text")), "text", "doc_id")
      graft.text.InvertedIndex.phraseSearch(idx, "big order scan")
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
            m AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS anchor
              FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
              WHERE i + 2 <= len(toks)
                AND toks[i] = 'big' AND toks[i+1] = 'order'
                AND toks[i+2] = 'scan')
            SELECT doc_id, count(*) AS n_hits, min(anchor) AS first_pos
            FROM m GROUP BY doc_id ORDER BY doc_id"""))

  /** t15: BM25-ranked retrieval (k1=1.2, b=0.75) for a bag-of-words
    * query, integer-exact scoring (pseudo-idf (N·1000)//df, saturation
    * cleared of fractions by ×10T — see text/InvertedIndex.scala). */
  val bm25Q: GQuery = GQuery(
    "t15_bm25",
    (s, d) => graft.text.InvertedIndex.bm25TopK(
      docs(s, d).select(col("doc_id"), col("text")), "text", "doc_id",
      "hash join table", k = 20),
    Some(s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
            lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
            corpus AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(dl) AS BIGINT) AS tt FROM lens),
            tf AS (SELECT doc_id, tok AS token,
              CAST(count(*) AS BIGINT) AS tf
              FROM t, unnest(toks) AS u(tok)
              WHERE tok IN ('hash', 'join', 'table') GROUP BY 1, 2),
            dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY 1),
            sc AS (SELECT doc_id,
              (((n * 1000) // df) * (tf * 22 * tt))
                // (10 * tt * tf + 3 * tt + 9 * dl * n) AS s
              FROM tf JOIN dfreq USING (token) JOIN lens USING (doc_id),
                corpus),
            agg AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS score,
              count(*) AS n_terms FROM sc GROUP BY 1),
            r AS (SELECT CAST(row_number() OVER (ORDER BY score DESC,
              doc_id) AS BIGINT) AS rank, doc_id, score, n_terms FROM agg)
            SELECT rank, doc_id, score, n_terms FROM r
            WHERE rank <= 20 ORDER BY rank"""))

  /** t16: BM25 served from the MAINTAINED persisted index — build on
    * 2/3 of the corpus, append the rest (new bucket files only), then
    * tombstone every doc_id ≡ 7 (mod 10) without rewriting a bucket
    * (the index-side deletion-vector mirror). The probe reads the query
    * terms' buckets + a one-row corpus sidecar, so its cost is
    * O(query-term postings) at any corpus size. The oracle is t15's
    * scoring restricted to the live documents. */
  val bm25IndexedQ: GQuery = GQuery(
    "t16_bm25_indexed",
    (s, d) => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_t16").toString
      val docsDf = docs(s, d).select(col("doc_id"), col("text"))
      val I = graft.text.InvertedIndex
      I.buildIndex(docsDf.where(col("doc_id") % 3 =!= 2),
        "text", "doc_id", dir)
      I.appendDocs(docsDf.where(col("doc_id") % 3 === 2),
        "text", "doc_id", dir)
      I.deleteDocs(docsDf.where(col("doc_id") % 10 === 7),
        "doc_id", dir)
      I.bm25TopKIndexed(s, dir, "hash join table", k = 20)
    },
    Some(s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents
              WHERE doc_id % 10 <> 7),
            lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
            corpus AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(dl) AS BIGINT) AS tt FROM lens),
            tf AS (SELECT doc_id, tok AS token,
              CAST(count(*) AS BIGINT) AS tf
              FROM t, unnest(toks) AS u(tok)
              WHERE tok IN ('hash', 'join', 'table') GROUP BY 1, 2),
            dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY 1),
            sc AS (SELECT doc_id,
              (((n * 1000) // df) * (tf * 22 * tt))
                // (10 * tt * tf + 3 * tt + 9 * dl * n) AS s
              FROM tf JOIN dfreq USING (token) JOIN lens USING (doc_id),
                corpus),
            agg AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS score,
              count(*) AS n_terms FROM sc GROUP BY 1),
            r AS (SELECT CAST(row_number() OVER (ORDER BY score DESC,
              doc_id) AS BIGINT) AS rank, doc_id, score, n_terms FROM agg)
            SELECT rank, doc_id, score, n_terms FROM r
            WHERE rank <= 20 ORDER BY rank"""))

  /** t17: N-phrase decontamination probe in ONE pass — every phrase in
    * the benchmark set matched against the corpus with a single
    * (doc, phrase, anchor) shuffle (InvertedIndex.multiPhraseSearch);
    * probing more phrases adds broadcast rows, not jobs. Oracle: one
    * token-window enumeration per phrase, unioned. */
  val multiPhraseQ: GQuery = {
    val phrases = Seq("big order scan", "slow hash batch", "filter merge data")
    def oracleFor(pid: Int): String = {
      val toks = phrases(pid).split(" ")
      val conds = toks.zipWithIndex
        .map { case (t, o) => s"toks[i+$o] = '$t'" }.mkString(" AND ")
      s"""SELECT doc_id, CAST($pid AS BIGINT) AS phrase_id,
            count(*) AS n_hits, min(anchor) AS first_pos
          FROM (SELECT doc_id, CAST(i - 1 AS BIGINT) AS anchor
            FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
            WHERE i + ${toks.length - 1} <= len(toks) AND $conds) m$pid
          GROUP BY doc_id"""
    }
    GQuery(
      "t17_multi_phrase",
      (s, d) => graft.text.InvertedIndex.multiPhraseSearch(
        graft.text.InvertedIndex.postings(
          docs(s, d).select(col("doc_id"), col("text")), "text", "doc_id"),
        phrases)
        .orderBy(col("doc_id"), col("phrase_id")),
      Some(s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents)
              ${phrases.indices.map(oracleFor).mkString(" UNION ALL ")}
              ORDER BY doc_id, phrase_id"""))
  }

  /** t18: hybrid retrieval — BM25 (sparse, over `documents`) fused
    * with exact cosine ANN (dense, over `embeddings`, query = vector
    * 0's neighbors) by reciprocal-rank fusion
    * (operators/Ranking.rrfFuse). Only RANKS cross the fusion
    * boundary, so the two retrievers never need score calibration and
    * the fusion shuffles O(lists·k) rows regardless of corpus size.
    * Integer-exact contributions (1000000 div (60 + rank)) make the
    * fused ordering engine-reproducible; the oracle re-derives both
    * rankings and the fusion in DuckDB. */
  val hybridRrfQ: GQuery = GQuery(
    "t18_hybrid_rrf",
    (s, d) => {
      val sparse = graft.text.InvertedIndex.bm25TopK(
        docs(s, d).select(col("doc_id"), col("text")), "text", "doc_id",
        "hash join table", k = 30).select(col("doc_id"), col("rank"))
      val e = Tables.embeddings(s, d)
      val dense = graft.similarity.VectorFunctions.bruteForceTopK(
        e, e.filter(col("vec_id") === 0), k = 30)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      graft.operators.Ranking.rrfFuse(Seq(sparse, dense), "doc_id",
        "rank", k = 20)
    },
    Some(s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
            lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
            corpus AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(dl) AS BIGINT) AS tt FROM lens),
            tf AS (SELECT doc_id, tok AS token,
              CAST(count(*) AS BIGINT) AS tf
              FROM t, unnest(toks) AS u(tok)
              WHERE tok IN ('hash', 'join', 'table') GROUP BY 1, 2),
            dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY 1),
            sc AS (SELECT doc_id,
              (((n * 1000) // df) * (tf * 22 * tt))
                // (10 * tt * tf + 3 * tt + 9 * dl * n) AS s
              FROM tf JOIN dfreq USING (token) JOIN lens USING (doc_id),
                corpus),
            agg AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS score FROM sc
              GROUP BY 1),
            bmr AS (SELECT doc_id, CAST(row_number() OVER
              (ORDER BY score DESC, doc_id) AS BIGINT) AS rank FROM agg
              QUALIFY rank <= 30),
            dot AS (SELECT c.vec_id AS doc_id,
              list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(range(64), i ->
                  CAST(q.embedding[i+1] AS DOUBLE) *
                  CAST(c.embedding[i+1] AS DOUBLE))),
                (acc, x) -> acc + x) AS qc,
              sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(range(64), i ->
                  CAST(q.embedding[i+1] AS DOUBLE) *
                  CAST(q.embedding[i+1] AS DOUBLE))),
                (acc, x) -> acc + x)) AS qn,
              sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(range(64), i ->
                  CAST(c.embedding[i+1] AS DOUBLE) *
                  CAST(c.embedding[i+1] AS DOUBLE))),
                (acc, x) -> acc + x)) AS cn
              FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
              WHERE q.vec_id = 0),
            dnr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY
              round(CASE WHEN qn * cn = 0 THEN 0.0 ELSE qc / (qn * cn) END,
                6) DESC, doc_id) AS BIGINT) AS rank
              FROM dot QUALIFY rank <= 30),
            u AS (SELECT doc_id, 1000000 // (60 + rank) AS c FROM bmr
              UNION ALL SELECT doc_id, 1000000 // (60 + rank) FROM dnr),
            fused AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_score,
              count(*) AS n_lists FROM u GROUP BY 1),
            r AS (SELECT CAST(row_number() OVER (ORDER BY rrf_score DESC,
              doc_id) AS BIGINT) AS rank, doc_id, rrf_score, n_lists
              FROM fused)
            SELECT rank, doc_id, rrf_score, n_lists FROM r
            WHERE rank <= 20 ORDER BY rank"""))

  /** t20: grounds the FUSION the way v13 grounds ANN — recall@20 of
    * the production hybrid (exact BM25 + LSH-bucketed dense, fused by
    * rrfFuse) against the EXACT fusion (same BM25 + brute-force dense)
    * on the same corpus and probe. The sparse retriever is exact
    * either way, so this isolates precisely what the dense ANN
    * approximation costs the fused list — the number a deployment
    * checks before trusting the cheap retriever pair. Integer-exact
    * contributions and permille rounding make the gate
    * engine-reproducible; the recall FLOOR (>= 500‰ on this fixture)
    * is asserted by OperatorsSpec, not the hash oracle, so a data
    * regen that shifts the corpus fails loudly there instead of
    * silently re-hashing. Scale: both fusions shuffle O(lists·k) rows;
    * the LSH side is v4's bucket-join (never all-pairs); recall of the
    * FUSED list needs no extra pass over the corpus. */
  val hybridRecallQ: GQuery = GQuery(
    "t20_hybrid_recall",
    (s, d) => {
      val sparse = graft.text.InvertedIndex.bm25TopK(
        docs(s, d).select(col("doc_id"), col("text")), "text", "doc_id",
        "hash join table", k = 30).select(col("doc_id"), col("rank"))
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0)
      val denseExact = graft.similarity.VectorFunctions
        .bruteForceTopK(e, qv, k = 30)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      val denseAnn = graft.similarity.VectorFunctions
        .lshTopK(e, qv, k = 30, planes = 8, dim = 64)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      val exactF = graft.operators.Ranking.rrfFuse(
        Seq(sparse, denseExact), "doc_id", "rank", k = 20)
        .select(col("doc_id"))
      val annF = graft.operators.Ranking.rrfFuse(
        Seq(sparse, denseAnn), "doc_id", "rank", k = 20)
        .select(col("doc_id").as("__a_id"))
      val hit = exactF
        .join(annF, col("doc_id") === col("__a_id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      exactF.agg(count(lit(1)).as("n_true"))
        .crossJoin(hit)
        .select(col("n_true"), col("n_hit"),
          Exact.roundDiv(col("n_hit") * 1000, col("n_true"))
            .as("recall_permille"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
            lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
            corpus AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(dl) AS BIGINT) AS tt FROM lens),
            tf AS (SELECT doc_id, tok AS token,
              CAST(count(*) AS BIGINT) AS tf
              FROM t, unnest(toks) AS u(tok)
              WHERE tok IN ('hash', 'join', 'table') GROUP BY 1, 2),
            dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY 1),
            sc AS (SELECT doc_id,
              (((n * 1000) // df) * (tf * 22 * tt))
                // (10 * tt * tf + 3 * tt + 9 * dl * n) AS s
              FROM tf JOIN dfreq USING (token) JOIN lens USING (doc_id),
                corpus),
            agg AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS score FROM sc
              GROUP BY 1),
            bmr AS (SELECT doc_id, CAST(row_number() OVER
              (ORDER BY score DESC, doc_id) AS BIGINT) AS rank FROM agg
              QUALIFY rank <= 30),
            pairs AS (SELECT c.vec_id AS doc_id,
              list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(range(64), i ->
                  CAST(q.embedding[i+1] AS DOUBLE) *
                  CAST(c.embedding[i+1] AS DOUBLE))),
                (acc, x) -> acc + x) AS qc,
              sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(range(64), i ->
                  CAST(q.embedding[i+1] AS DOUBLE) *
                  CAST(q.embedding[i+1] AS DOUBLE))),
                (acc, x) -> acc + x)) AS qn,
              sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(range(64), i ->
                  CAST(c.embedding[i+1] AS DOUBLE) *
                  CAST(c.embedding[i+1] AS DOUBLE))),
                (acc, x) -> acc + x)) AS cn
              FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
              WHERE q.vec_id = 0),
            dnr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY
              round(CASE WHEN qn * cn = 0 THEN 0.0 ELSE qc / (qn * cn) END,
                6) DESC, doc_id) AS BIGINT) AS rank
              FROM pairs QUALIFY rank <= 30),
            b AS (SELECT vec_id,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(8), j ->
                  CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                    list_transform(range(64), i ->
                      CAST(embedding[i+1] AS DOUBLE) *
                      (CAST(((2654435761 * (j*64 + i + 1)) % 1000000007)
                            % 2001 - 1000 AS DOUBLE) / 1000.0))),
                    (acc, x) -> acc + x) > 0
                  THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END)),
                (acc, x) -> acc + x) AS bucket
              FROM embeddings),
            anr AS (SELECT p.doc_id, CAST(row_number() OVER (ORDER BY
              round(CASE WHEN p.qn * p.cn = 0 THEN 0.0
                ELSE p.qc / (p.qn * p.cn) END, 6) DESC, p.doc_id)
                AS BIGINT) AS rank
              FROM pairs p
              JOIN b q ON q.vec_id = 0
              JOIN b c ON c.vec_id = p.doc_id AND c.bucket = q.bucket
              QUALIFY rank <= 30),
            fe AS (SELECT doc_id FROM (
              SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_score
              FROM (SELECT doc_id, 1000000 // (60 + rank) AS c FROM bmr
                UNION ALL SELECT doc_id, 1000000 // (60 + rank) FROM dnr)
              GROUP BY 1) QUALIFY row_number() OVER
                (ORDER BY rrf_score DESC, doc_id) <= 20),
            fa AS (SELECT doc_id FROM (
              SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_score
              FROM (SELECT doc_id, 1000000 // (60 + rank) AS c FROM bmr
                UNION ALL SELECT doc_id, 1000000 // (60 + rank) FROM anr)
              GROUP BY 1) QUALIFY row_number() OVER
                (ORDER BY rrf_score DESC, doc_id) <= 20),
            h AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
              FROM fe JOIN fa USING (doc_id)),
            nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM fe)
            SELECT nt.n_true, h.n_hit,
              ${Exact.roundDivSqlPos("h.n_hit * 1000", "nt.n_true")}
                AS recall_permille
            FROM nt, h"""))

  /** t20b: t20's recall gate with the hybrid path's PROBE-FANOUT knob
    * turned up — the same corpus, probe, and exact-fusion truth, but
    * the dense retriever probes the full Hamming-≤2 shell
    * (HybridRetrieval.topK with probeFanout = 1 + 8 + 28 = 37, the
    * v14 multi-probe machinery's ring-2 extension) instead of its
    * single bucket. This is the dial a deployment turns when t20's
    * single-probe recall is not enough: recall rises from t20's
    * ~600‰ to ≥800‰ here (measured 850‰ at sf0.01 AND sf0.1;
    * OperatorsSpec asserts the floor) while cost stays O(lists·k) —
    * the fanout rides the broadcast QUERY side only, the corpus is
    * still bucket-joined, never scanned. */
  val hybridRecallMpQ: GQuery = GQuery(
    "t20b_hybrid_recall_mp",
    (s, d) => {
      val sparse = graft.text.InvertedIndex.bm25TopK(
        docs(s, d).select(col("doc_id"), col("text")), "text", "doc_id",
        "hash join table", k = 30).select(col("doc_id"), col("rank"))
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0)
      val denseExact = graft.similarity.VectorFunctions
        .bruteForceTopK(e, qv, k = 30)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      val exactF = graft.operators.Ranking.rrfFuse(
        Seq(sparse, denseExact), "doc_id", "rank", k = 20)
        .select(col("doc_id"))
      val annF = graft.text.HybridRetrieval.topK(
        docs(s, d).select(col("doc_id"), col("text")), "text", "doc_id",
        "hash join table", e, queryVecId = 0L, k = 20, listK = 30,
        planes = 8, dim = 64, probeFanout = 37)
        .select(col("doc_id").as("__a_id"))
      val hit = exactF
        .join(annF, col("doc_id") === col("__a_id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      exactF.agg(count(lit(1)).as("n_true"))
        .crossJoin(hit)
        .select(col("n_true"), col("n_hit"),
          Exact.roundDiv(col("n_hit") * 1000, col("n_true"))
            .as("recall_permille"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents),
            lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
            corpus AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(dl) AS BIGINT) AS tt FROM lens),
            tf AS (SELECT doc_id, tok AS token,
              CAST(count(*) AS BIGINT) AS tf
              FROM t, unnest(toks) AS u(tok)
              WHERE tok IN ('hash', 'join', 'table') GROUP BY 1, 2),
            dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY 1),
            sc AS (SELECT doc_id,
              (((n * 1000) // df) * (tf * 22 * tt))
                // (10 * tt * tf + 3 * tt + 9 * dl * n) AS s
              FROM tf JOIN dfreq USING (token) JOIN lens USING (doc_id),
                corpus),
            agg AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS score FROM sc
              GROUP BY 1),
            bmr AS (SELECT doc_id, CAST(row_number() OVER
              (ORDER BY score DESC, doc_id) AS BIGINT) AS rank FROM agg
              QUALIFY rank <= 30),
            pairs AS (SELECT c.vec_id AS doc_id,
              list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(range(64), i ->
                  CAST(q.embedding[i+1] AS DOUBLE) *
                  CAST(c.embedding[i+1] AS DOUBLE))),
                (acc, x) -> acc + x) AS qc,
              sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(range(64), i ->
                  CAST(q.embedding[i+1] AS DOUBLE) *
                  CAST(q.embedding[i+1] AS DOUBLE))),
                (acc, x) -> acc + x)) AS qn,
              sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(range(64), i ->
                  CAST(c.embedding[i+1] AS DOUBLE) *
                  CAST(c.embedding[i+1] AS DOUBLE))),
                (acc, x) -> acc + x)) AS cn
              FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
              WHERE q.vec_id = 0),
            dnr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY
              round(CASE WHEN qn * cn = 0 THEN 0.0 ELSE qc / (qn * cn) END,
                6) DESC, doc_id) AS BIGINT) AS rank
              FROM pairs QUALIFY rank <= 30),
            b AS (SELECT vec_id,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(8), j ->
                  CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                    list_transform(range(64), i ->
                      CAST(embedding[i+1] AS DOUBLE) *
                      (CAST(((2654435761 * (j*64 + i + 1)) % 1000000007)
                            % 2001 - 1000 AS DOUBLE) / 1000.0))),
                    (acc, x) -> acc + x) > 0
                  THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END)),
                (acc, x) -> acc + x) AS bucket
              FROM embeddings),
            anr AS (SELECT p.doc_id, CAST(row_number() OVER (ORDER BY
              round(CASE WHEN p.qn * p.cn = 0 THEN 0.0
                ELSE p.qc / (p.qn * p.cn) END, 6) DESC, p.doc_id)
                AS BIGINT) AS rank
              FROM pairs p
              JOIN b c ON c.vec_id = p.doc_id
              JOIN b q ON q.vec_id = 0
                AND bit_count(xor(c.bucket, q.bucket)) <= 2
              QUALIFY rank <= 30),
            fe AS (SELECT doc_id FROM (
              SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_score
              FROM (SELECT doc_id, 1000000 // (60 + rank) AS c FROM bmr
                UNION ALL SELECT doc_id, 1000000 // (60 + rank) FROM dnr)
              GROUP BY 1) QUALIFY row_number() OVER
                (ORDER BY rrf_score DESC, doc_id) <= 20),
            fa AS (SELECT doc_id FROM (
              SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_score
              FROM (SELECT doc_id, 1000000 // (60 + rank) AS c FROM bmr
                UNION ALL SELECT doc_id, 1000000 // (60 + rank) FROM anr)
              GROUP BY 1) QUALIFY row_number() OVER
                (ORDER BY rrf_score DESC, doc_id) <= 20),
            h AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
              FROM fe JOIN fa USING (doc_id)),
            nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM fe)
            SELECT nt.n_true, h.n_hit,
              ${Exact.roundDivSqlPos("h.n_hit * 1000", "nt.n_true")}
                AS recall_permille
            FROM nt, h"""))

  /** e3: the CAPSTONE end-to-end training-data pipeline — every stage
    * a 100 TB pretraining feed runs, composed as ONE gate: tagged
    * streaming ingest (with a REPLAYED batch proving effectively-once
    * inside the pipeline itself) → quality/language gate (t2/t3
    * kernels) → cross-batch exact dedup over the accumulated table
    * (d1) → token-bounded chunking (t7) → hash-stable train/valid/test
    * split (c4, assigned BEFORE packing so no sequence ever mixes
    * splits) → capacity-64 sequence packing within (split, shard)
    * (c2) → JSONL shard EXPORT (TrainingExport, key-stable shard
    * membership, on-disk row count verified) → the per-(split, shard)
    * EXPORT MANIFEST a training loader reads (docs, chunks, sequences,
    * tokens), derived from the exported shards themselves so it can
    * never drift from the files. One pass per stage:
    * ingest appends, the curation chain is one fused plan (kernel
    * filters → window dedup → explode → window pack → one keyed agg);
    * nothing corpus-sized is re-derived or collected. The oracle
    * replays the identical chain in SQL; the ingest invariants
    * (replay must not re-append) are require()d in the gate body
    * because the manifest alone cannot distinguish a duplicate the
    * dedup stage would silently eat. */
  /** The hash-stable split column every capstone shares (c4). doc_id
    * reduces mod p BEFORE the Knuth multiply: the raw product wraps
    * Spark's Long silently for doc_id ≳ 3.5e9 while DuckDB raises on
    * BIGINT overflow — reduce-first keeps both sides exact
    * ((p−1)·2654435761 < 2^63) at ANY id range. */
  private def splitCol: org.apache.spark.sql.Column = {
    val b = pmod(pmod(pmod(col("doc_id"), lit(1000000007L)) *
      lit(2654435761L), lit(1000000007L)), lit(100L))
    when(b < 90, lit("train")).when(b < 95, lit("valid"))
      .otherwise(lit("test"))
  }

  /** e3's curation chain, corpus → packed sequences — ONE definition
    * shared by the e3 gate (which wraps it in the ingest fixture and
    * JSONL export) and PlanSpec's structural lock, so the plan the
    * spec pins is the plan the capstone actually runs. */
  private[graft] def trainingChain(corpus: DataFrame): DataFrame = {
    val st = graft.expressions.TextStatsExpressions.text_stats(col("text"))
    val lang = graft.expressions.TextStatsExpressions.lang_id(col("text"))
    val gated = corpus
      .withColumn("_nt", st.getField("n_tokens"))
      .filter(lang === "en" && col("_nt") >= lit(20))
    val unique = graft.dedup.Dedup.exactDedup(gated, "text", "doc_id")
    val chunks = chunkDocuments(
      unique.select(col("doc_id"), col("text")), "text",
      chunkTokens = 32, overlap = 8)
      .withColumn("shard", col("doc_id") % 8)
      .withColumn("split", splitCol)
    graft.operators.Packing.packSequences(
      chunks, "n_chunk_tokens",
      concat_ws("/", col("split"), col("shard")),
      Seq(col("doc_id"), col("chunk_idx")), capacity = 64)
  }

  /** e4's curated chain, corpus → packed sequences — shared by the e4
    * gate (fixture + export; radius 1, bench slice `% 89`), the e4b
    * aggregate gate (radius 2, bench slice `% 1997`), and PlanSpec's
    * structural lock. Both knobs are data-density choices, not
    * semantics: the tiled scale tiers give every distinct text ~1000
    * clones, so ANY id-keyed bench slice contains a clone of every
    * text at scale and decontamination correctly empties the corpus
    * (the d13 finding) — e4b keys its slice on the TEXT (md5 prefix),
    * which is invariant under tiling, so the surviving set is
    * tier-stable and the scale oracle proves real rows, not zeros. */
  private[graft] def curatedChain(corpus: DataFrame, maxDist: Int,
      benchPred: org.apache.spark.sql.Column =
        col("doc_id") % 89 === 0): DataFrame = {
    val sc = graft.expressions.TextStatsExpressions
      .lang_id_scored(col("text"))
    val st = graft.expressions.TextStatsExpressions.text_stats(col("text"))
    // Decide on small rows, attach the payload once (guide §8): the
    // scored-lang gate and the exact-dup fingerprint are ID-level
    // decisions, so ONE corpus pass computes them projected to
    // (doc_id, fp), the min-id winner per fingerprint persists as an
    // id set, and the payload re-attaches by row-local semi-join.
    // The previous stacked form re-evaluated the gate kernels and the
    // dedup window up to 4x per run — once per eager boundary (the CC
    // cutover collect, the Bloom sketch build) and twice through the
    // decontamination anti-join's two arms. Survivor semantics are
    // exactDedup's: same fingerprint, same min-id winner rule.
    val gatedFp = corpus
      .filter(sc.getField("lang") === "en" &&
        sc.getField("conf_permille") >= lit(500) &&
        st.getField("n_tokens") >= lit(20))
      .select(col("doc_id"),
        md5(normalizedText(col("text"))).as("_fp"))
    val exactW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_fp")).orderBy(col("doc_id"))
    val exactIds = gatedFp
      .withColumn("_rn", row_number().over(exactW))
      .filter(col("_rn") === 1)
      .select(col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exact = corpus.join(exactIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"))
    val near = graft.dedup.Dedup.simhashDedup(exact, maxDist = maxDist)
    val bench = corpus.filter(benchPred)
      .select(col("doc_id"), col("text"))
    val train = near.filter(!benchPred)
    val clean = graft.dedup.Dedup.bloomDecontaminate(train, bench,
      expectedItems = 1L << 18)
    val red = clean.select(col("doc_id"),
      graft.text.TextFunctions.redactPii(concat(col("text"),
        lit(" reach user"), col("doc_id").cast("string"),
        lit("@example.com or 555-123-4567 or 10.0.0."),
        pmod(col("doc_id"), lit(256)).cast("string"))).as("red"))
    val chunks = chunkDocuments(red, "red", chunkTokens = 32, overlap = 8)
      .withColumn("shard", col("doc_id") % 8)
      .withColumn("split", splitCol)
    graft.operators.Packing.packSequences(
      chunks, "n_chunk_tokens",
      concat_ws("/", col("split"), col("shard")),
      Seq(col("doc_id"), col("chunk_idx")), capacity = 64)
  }

  val trainingPipelineQ: GQuery = GQuery(
    "e3_training_pipeline",
    (s, d) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_e3").toString
      val t = new graft.io.ManagedParquetTable(s, s"$root/docs")
      val src = docs(s, d).select(col("doc_id"), col("text"))
      for (b <- 0 to 2)
        graft.streaming.BronzeIngest.indexedIngestBatch(t,
          src.where(col("doc_id") % 3 === b), b.toLong, "e3", Nil)
      // re-present the LAST batch — the one a checkpointed stream can
      // replay after a crash before its commit marker
      val v = t.version
      graft.streaming.BronzeIngest.indexedIngestBatch(t,
        src.where(col("doc_id") % 3 === 2), 2L, "e3", Nil)
      require(t.version == v, "replayed ingest batch must not re-append")
      val packed = trainingChain(t.read())
      // the pipeline ends at FILES a training loader reads, not at a
      // summary: export the packed chunk rows (chunk_text, never the
      // full source document) as key-stable JSONL shards, verify the
      // bytes on disk hold exactly the rows the write pass observed,
      // and derive the manifest FROM the exported shards — the summary
      // a loader trusts can never drift from the files it will read
      val payload = packed.drop("text")
      val written = graft.io.TrainingExport.writeJsonlShards(
        payload, keyCol = "doc_id", nShards = 8, path = s"$root/shards")
      val onDisk = s.read.textFile(s"$root/shards").count()
      require(onDisk == written,
        s"export shards hold $onDisk rows, the write pass observed $written")
      s.read.schema(payload.schema).json(s"$root/shards")
        .groupBy(col("split"), col("shard"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          (max(col("seq_id")) + 1).as("n_seqs"),
          sum(col("n_chunk_tokens").cast("long")).as("n_tokens"))
        .orderBy(col("split"), col("shard"))
    },
    Some(s"""WITH t0 AS (SELECT doc_id, text, $SqlToks AS toks FROM documents),
            langed AS (SELECT doc_id, text, toks FROM (
              SELECT doc_id, text, toks,
                len(list_intersect(list_distinct(toks),
                  ['the','and','of','to','is','in','that','it','for','with'])) AS s_en,
                len(list_intersect(list_distinct(toks),
                  ['le','la','les','et','de','un','une','est','que','pour'])) AS s_fr,
                len(list_intersect(list_distinct(toks),
                  ['el','la','los','las','y','de','que','es','en','por'])) AS s_es,
                len(list_intersect(list_distinct(toks),
                  ['der','die','das','und','ist','von','mit','den','nicht','ein'])) AS s_de
              FROM t0)
              WHERE greatest(s_en, s_fr, s_es, s_de) > 0
                AND s_en = greatest(s_en, s_fr, s_es, s_de)
                AND len(toks) >= 20),
            survivors AS (SELECT doc_id, toks FROM (
              SELECT doc_id, toks, row_number() OVER (
                PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))
                ORDER BY doc_id) AS rn
              FROM langed) WHERE rn = 1),
            n AS (SELECT doc_id, toks,
              greatest(CAST(ceil((len(toks) - 8) / 24.0) AS BIGINT), 1)
                AS n_chunks FROM survivors),
            c AS (SELECT doc_id, toks, CAST(i AS BIGINT) AS chunk_idx
              FROM n, unnest(range(n_chunks)) AS u(i)),
            ch AS (SELECT doc_id, chunk_idx,
              CAST(len(toks[chunk_idx*24+1 : chunk_idx*24+32]) AS BIGINT)
                AS nt FROM c),
            sp AS (SELECT doc_id, chunk_idx, nt,
              CAST(doc_id % 8 AS BIGINT) AS shard,
              CASE WHEN (doc_id % 1000000007 * 2654435761) % 1000000007 % 100 < 90
                   THEN 'train'
                   WHEN (doc_id % 1000000007 * 2654435761) % 1000000007 % 100 < 95
                   THEN 'valid' ELSE 'test' END AS split
              FROM ch),
            w AS (SELECT *, sum(nt) OVER (PARTITION BY split, shard
                ORDER BY doc_id, chunk_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt
                AS cum_excl FROM sp)
            SELECT split, shard,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
              count(*) AS n_chunks,
              CAST(max(cum_excl // 64) + 1 AS BIGINT) AS n_seqs,
              CAST(sum(nt) AS BIGINT) AS n_tokens
            FROM w GROUP BY split, shard ORDER BY split, shard"""))

  /** e4: e3's capstone with the curation stages a production
    * pretraining feed actually runs between the quality gate and the
    * chunker — each stage an already-gated operator, composed here so
    * the ONE-PASS-PER-STAGE shape and the export invariants survive
    * the full chain:
    *   tagged ingest (replayed batch must no-op)
    *   → scored lang gate (t3b's confidence threshold, not the bare
    *     argmax label) + token floor
    *   → exact dedup (d1)
    *   → NEAR-DUP dedup (d11's SimHash value-graph — doc pairs never
    *     materialize)
    *   → benchmark decontamination (d13's Bloom prefilter + exact
    *     semi-join; bench slice = full-corpus doc_id % 89 == 0)
    *   → PII redaction (t10's planted-PII protocol — chunking then
    *     runs over the REDACTED text, so a redaction regression
    *     breaks the final token accounting, not just a side column)
    *   → chunk → hash-stable split → capacity packing → JSONL shard
    *     export with on-disk row-count verification → manifest derived
    *     FROM the shards.
    * The oracle replays the identical chain in SQL (the proven CTEs of
    * e3 + d10/d11 + d13 + t10 composed over the same subsets). */
  val curatedPipelineQ: GQuery = GQuery(
    "e4_curated_pipeline",
    (s, d) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_e4").toString
      val t = new graft.io.ManagedParquetTable(s, s"$root/docs")
      val src = docs(s, d).select(col("doc_id"), col("text"))
      for (b <- 0 to 2)
        graft.streaming.BronzeIngest.indexedIngestBatch(t,
          src.where(col("doc_id") % 3 === b), b.toLong, "e4", Nil)
      val v = t.version
      graft.streaming.BronzeIngest.indexedIngestBatch(t,
        src.where(col("doc_id") % 3 === 2), 2L, "e4", Nil)
      require(t.version == v, "replayed ingest batch must not re-append")
      // conservative near-dup radius for the capstone fixture: the
      // synthetic corpus is template-generated and dist<=3 collapses
      // the gated set to a handful of docs — dist<=1 keeps the tail
      // stages fed (e4b gates the same chain at radius 2, d11 the
      // aggressive radius standalone, and DedupSpec proves the k+1 ⊆ k
      // survivor monotonicity that makes the knob order-safe)
      val packed = curatedChain(t.read(), maxDist = 1)
      val payload = packed.drop("red")
      val written = graft.io.TrainingExport.writeJsonlShards(
        payload, keyCol = "doc_id", nShards = 8, path = s"$root/shards")
      val onDisk = s.read.textFile(s"$root/shards").count()
      require(onDisk == written,
        s"export shards hold $onDisk rows, the write pass observed $written")
      s.read.schema(payload.schema).json(s"$root/shards")
        .groupBy(col("split"), col("shard"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          (max(col("seq_id")) + 1).as("n_seqs"),
          sum(col("n_chunk_tokens").cast("long")).as("n_tokens"))
        .orderBy(col("split"), col("shard"))
    },
    Some(raw"""WITH RECURSIVE
            t0 AS (SELECT doc_id, text, $SqlToks AS toks FROM documents),
            sc AS (SELECT doc_id, text, toks,
              len(list_intersect(list_distinct(toks),
                ['the','and','of','to','is','in','that','it','for','with'])) AS s_en,
              len(list_intersect(list_distinct(toks),
                ['le','la','les','et','de','un','une','est','que','pour'])) AS s_fr,
              len(list_intersect(list_distinct(toks),
                ['el','la','los','las','y','de','que','es','en','por'])) AS s_es,
              len(list_intersect(list_distinct(toks),
                ['der','die','das','und','ist','von','mit','den','nicht','ein'])) AS s_de
              FROM t0),
            gated AS (SELECT doc_id, text, toks FROM (
              SELECT *, greatest(s_en, s_fr, s_es, s_de) AS m,
                s_en + s_fr + s_es + s_de AS tot FROM sc)
              WHERE m > 0 AND s_en = m
                AND ${Exact.roundDivSqlPos("1000 * m", "tot")} >= 500
                AND len(toks) >= 20),
            ex AS (SELECT doc_id, text, toks FROM (
              SELECT doc_id, text, toks, row_number() OVER (
                PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))
                ORDER BY doc_id) AS rn
              FROM gated) WHERE rn = 1),
            hs AS (SELECT doc_id,
              list_transform(toks, tok ->
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(tok, ''),
                    c -> CAST(ord(c) AS BIGINT))),
                  (h, c) -> (h * 31 + c) % 4294967296)) AS hs
              FROM ex),
            sh AS (SELECT doc_id,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(32), b ->
                  CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(hs, h ->
                      CASE WHEN (h >> b) & 1 = 1 THEN CAST(1 AS BIGINT)
                           ELSE CAST(-1 AS BIGINT) END)),
                    (a2, v) -> a2 + v) > 0
                  THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END)),
                (a2, v) -> a2 + v) AS sh
              FROM hs),
            vals AS (SELECT DISTINCT sh AS v FROM sh),
            banded AS (SELECT v, b AS band, (v >> (b*8)) & 255 AS slice
              FROM vals, unnest(range(4)) AS u(b)),
            vp AS (SELECT DISTINCT l.v AS v_a, r.v AS v_b
              FROM banded l JOIN banded r
                ON l.band = r.band AND l.slice = r.slice AND l.v < r.v
              WHERE bit_count(xor(l.v, r.v)) <= 1),
            vedges AS (SELECT v_a AS s, v_b AS d FROM vp
                       UNION SELECT v_b, v_a FROM vp),
            vreach(v, lab) AS (
              SELECT s, s FROM vedges
              UNION
              SELECT e.s, r.lab FROM vedges e JOIN vreach r ON e.d = r.v),
            vcomp AS (SELECT v, min(lab) AS vlab FROM vreach GROUP BY v),
            nd AS (SELECT min(doc_id) AS doc_id
              FROM sh LEFT JOIN vcomp ON sh.sh = vcomp.v
              GROUP BY coalesce(vcomp.vlab, sh.sh)),
            shing AS (SELECT doc_id,
              list_distinct(list_transform(range(greatest(len(toks) - 2, 0)),
                j -> array_to_string(toks[j+1:j+3], ' '))) AS shs
              FROM t0),
            bench AS (SELECT DISTINCT unnest(shs) AS s FROM shing
                      WHERE doc_id % 89 = 0),
            cont AS (SELECT DISTINCT y.doc_id FROM (
                SELECT s2.doc_id, unnest(s2.shs) AS s FROM shing s2
                JOIN nd USING (doc_id) WHERE s2.doc_id % 89 <> 0) y
              JOIN bench USING (s)),
            clean AS (SELECT ex.doc_id, ex.text FROM ex
              JOIN nd USING (doc_id)
              WHERE ex.doc_id % 89 <> 0
                AND ex.doc_id NOT IN (SELECT doc_id FROM cont)),
            aug AS (SELECT doc_id,
              text || ' reach user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or 555-123-4567 or 10.0.0.'
                   || CAST(doc_id % 256 AS VARCHAR) AS t
              FROM clean),
            red AS (SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
                '\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\b', '<PHONE>', 'g'),
                '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')
                AS red
              FROM aug),
            rt AS (SELECT doc_id, ${sqlToksOf("red")} AS rtoks FROM red),
            n AS (SELECT doc_id, rtoks,
              greatest(CAST(ceil((len(rtoks) - 8) / 24.0) AS BIGINT), 1)
                AS n_chunks FROM rt),
            c AS (SELECT doc_id, rtoks, CAST(i AS BIGINT) AS chunk_idx
              FROM n, unnest(range(n_chunks)) AS u(i)),
            ch AS (SELECT doc_id, chunk_idx,
              CAST(len(rtoks[chunk_idx*24+1 : chunk_idx*24+32]) AS BIGINT)
                AS nt FROM c),
            sp AS (SELECT doc_id, chunk_idx, nt,
              CAST(doc_id % 8 AS BIGINT) AS shard,
              CASE WHEN (doc_id % 1000000007 * 2654435761) % 1000000007 % 100 < 90
                   THEN 'train'
                   WHEN (doc_id % 1000000007 * 2654435761) % 1000000007 % 100 < 95
                   THEN 'valid' ELSE 'test' END AS split
              FROM ch),
            w AS (SELECT *, sum(nt) OVER (PARTITION BY split, shard
                ORDER BY doc_id, chunk_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt
                AS cum_excl FROM sp)
            SELECT split, shard,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
              count(*) AS n_chunks,
              CAST(max(cum_excl // 64) + 1 AS BIGINT) AS n_seqs,
              CAST(sum(nt) AS BIGINT) AS n_tokens
            FROM w GROUP BY split, shard ORDER BY split, shard"""))

  /** e4b: the curated CHAIN aggregate-exact at a SECOND near-dup
    * radius — the two evidence gaps the e4 gate left open, closed in
    * one gate:
    *   - e4 pins maxDist = 1 for fixture-density reasons; this gate
    *     runs the identical relational chain (scored-lang gate → exact
    *     dedup → SimHash value-graph near-dup → Bloom decontamination
    *     → PII redaction → chunk → split → pack → per-(split, shard)
    *     accounting) at maxDist = 2 and a TEXT-keyed bench slice
    *     (md5-prefix — see [[curatedChain]]: the tiled scale tiers
    *     saturate any id-keyed slice and the chain would prove only
    *     zeros; text-keying makes the survivor set tier-stable), so the
    *     production knobs have their own oracle row (DedupSpec adds
    *     the general k+1 ⊆ k survivor monotonicity proof). The
    *     ingest/export fixture is deliberately NOT repeated here — e4
    *     owns it; this gate isolates the data transformations so it
    *     stays cheap enough to oracle at sf10.
    *   - the oracle is the d6b protocol applied to the whole capstone:
    *     O(1) output (group count, exact sums, and an order-free
    *     modular polynomial signature binding each (split, shard)
    *     group to its four measures), and the SQL decomposes every
    *     per-text HOF (lang scores, simhash, shingles) over DISTINCT
    *     texts before re-joining doc_ids — relationally identical
    *     (validated row-exact against e4's composed CTEs at
    *     sf0.01/sf0.1), but DuckDB-feasible at sf10's 500k docs,
    *     where the tiled corpus holds ~5k distinct texts and the
    *     undecomposed form exceeds the 40-minute budget. */
  val curatedChainAggQ: GQuery = {
    val P = 1000000007L
    GQuery(
      "e4b_curated_chain_agg",
      (s, d) => {
        val packed = curatedChain(
          docs(s, d).select(col("doc_id"), col("text")), maxDist = 2,
          benchPred = substring(md5(col("text")), 1, 2) === "00")
        val grouped = packed
          .groupBy(col("split"), col("shard"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_chunks"),
            (max(col("seq_id")) + 1).as("n_seqs"),
            sum(col("n_chunk_tokens").cast("long")).as("n_tokens"))
        val k = (when(col("split") === "train", lit(0L))
          .when(col("split") === "valid", lit(1L))
          .otherwise(lit(2L)) * lit(8L) + col("shard").cast("long"))
        val sig = pmod(pmod(pmod(pmod(
          k * lit(1048573L) + col("n_docs"), lit(P)) *
            lit(1048573L) + col("n_chunks"), lit(P)) *
            lit(1048573L) + col("n_seqs"), lit(P)) *
            lit(1048573L) + col("n_tokens"), lit(P))
        grouped.agg(count(lit(1)).as("n_groups"),
          coalesce(sum(col("n_docs")), lit(0L)).as("sum_docs"),
          coalesce(sum(col("n_chunks")), lit(0L)).as("sum_chunks"),
          coalesce(sum(col("n_seqs")), lit(0L)).as("sum_seqs"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("sum_tokens"),
          coalesce(sum(sig), lit(0L)).as("group_sig"))
      },
      Some(raw"""WITH RECURSIVE
            dt AS (SELECT DISTINCT text FROM documents),
            t0 AS MATERIALIZED (SELECT text, $SqlToks AS toks FROM dt),
            sc AS (SELECT text, toks,
              len(list_intersect(list_distinct(toks),
                ['the','and','of','to','is','in','that','it','for','with'])) AS s_en,
              len(list_intersect(list_distinct(toks),
                ['le','la','les','et','de','un','une','est','que','pour'])) AS s_fr,
              len(list_intersect(list_distinct(toks),
                ['el','la','los','las','y','de','que','es','en','por'])) AS s_es,
              len(list_intersect(list_distinct(toks),
                ['der','die','das','und','ist','von','mit','den','nicht','ein'])) AS s_de
              FROM t0),
            gt AS (SELECT text, toks FROM (
              SELECT *, greatest(s_en, s_fr, s_es, s_de) AS m,
                s_en + s_fr + s_es + s_de AS tot FROM sc)
              WHERE m > 0 AND s_en = m
                AND ${Exact.roundDivSqlPos("1000 * m", "tot")} >= 500
                AND len(toks) >= 20),
            gfp AS MATERIALIZED (SELECT text, toks,
              md5(trim(regexp_replace(regexp_replace(lower(text),
                '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp FROM gt),
            ex0 AS (SELECT g.fp, min(d.doc_id) AS doc_id
              FROM documents d JOIN gfp g USING (text) GROUP BY g.fp),
            ex AS MATERIALIZED (SELECT e.doc_id, d.text
              FROM ex0 e JOIN documents d USING (doc_id)),
            hs AS (SELECT text, list_transform(toks, tok ->
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(tok, ''),
                    c -> CAST(ord(c) AS BIGINT))),
                  (h, c) -> (h * 31 + c) % 4294967296)) AS hs
              FROM gfp),
            sh0 AS MATERIALIZED (SELECT text,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(32), b ->
                  CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(hs, h ->
                      CASE WHEN (h >> b) & 1 = 1 THEN CAST(1 AS BIGINT)
                           ELSE CAST(-1 AS BIGINT) END)),
                    (a2, v) -> a2 + v) > 0
                  THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END)),
                (a2, v) -> a2 + v) AS sh
              FROM hs),
            sh AS (SELECT ex.doc_id, sh0.sh FROM ex JOIN sh0 USING (text)),
            vals AS (SELECT DISTINCT sh AS v FROM sh),
            banded AS (SELECT v, b AS band, (v >> (b*8)) & 255 AS slice
              FROM vals, unnest(range(4)) AS u(b)),
            vp AS (SELECT DISTINCT l.v AS v_a, r.v AS v_b
              FROM banded l JOIN banded r
                ON l.band = r.band AND l.slice = r.slice AND l.v < r.v
              WHERE bit_count(xor(l.v, r.v)) <= 2),
            vedges AS (SELECT v_a AS s, v_b AS d FROM vp
                       UNION SELECT v_b, v_a FROM vp),
            vreach(v, lab) AS (
              SELECT s, s FROM vedges
              UNION
              SELECT e.s, r.lab FROM vedges e JOIN vreach r ON e.d = r.v),
            vcomp AS (SELECT v, min(lab) AS vlab FROM vreach GROUP BY v),
            nd AS (SELECT min(doc_id) AS doc_id
              FROM sh LEFT JOIN vcomp ON sh.sh = vcomp.v
              GROUP BY coalesce(vcomp.vlab, sh.sh)),
            shing0 AS MATERIALIZED (SELECT text,
              list_distinct(list_transform(range(greatest(len(toks) - 2, 0)),
                j -> array_to_string(toks[j+1:j+3], ' '))) AS shs
              FROM t0),
            bencht AS (SELECT DISTINCT text FROM documents
              WHERE substr(md5(text), 1, 2) = '00'),
            bench AS (SELECT DISTINCT unnest(shs) AS s
              FROM shing0 JOIN bencht USING (text)),
            ndx AS MATERIALIZED (SELECT nd.doc_id, d.text
              FROM nd JOIN documents d USING (doc_id)),
            cont AS (SELECT DISTINCT y.doc_id FROM (
                SELECT n2.doc_id, unnest(s0.shs) AS s FROM ndx n2
                JOIN shing0 s0 USING (text)
                WHERE substr(md5(n2.text), 1, 2) <> '00') y
              JOIN bench USING (s)),
            clean AS (SELECT n2.doc_id, n2.text FROM ndx n2
              WHERE substr(md5(n2.text), 1, 2) <> '00'
                AND n2.doc_id NOT IN (SELECT doc_id FROM cont)),
            aug AS (SELECT doc_id,
              text || ' reach user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or 555-123-4567 or 10.0.0.'
                   || CAST(doc_id % 256 AS VARCHAR) AS t
              FROM clean),
            red AS (SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
                '\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\b', '<PHONE>', 'g'),
                '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')
                AS red
              FROM aug),
            rt AS (SELECT doc_id, ${sqlToksOf("red")} AS rtoks FROM red),
            n AS (SELECT doc_id, rtoks,
              greatest(CAST(ceil((len(rtoks) - 8) / 24.0) AS BIGINT), 1)
                AS n_chunks FROM rt),
            c AS (SELECT doc_id, rtoks, CAST(i AS BIGINT) AS chunk_idx
              FROM n, unnest(range(n_chunks)) AS u(i)),
            ch AS (SELECT doc_id, chunk_idx,
              CAST(len(rtoks[chunk_idx*24+1 : chunk_idx*24+32]) AS BIGINT)
                AS nt FROM c),
            sp AS (SELECT doc_id, chunk_idx, nt,
              CAST(doc_id % 8 AS BIGINT) AS shard,
              CASE WHEN (doc_id % 1000000007 * 2654435761) % 1000000007 % 100 < 90
                   THEN 'train'
                   WHEN (doc_id % 1000000007 * 2654435761) % 1000000007 % 100 < 95
                   THEN 'valid' ELSE 'test' END AS split
              FROM ch),
            w AS (SELECT *, sum(nt) OVER (PARTITION BY split, shard
                ORDER BY doc_id, chunk_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt
                AS cum_excl FROM sp),
            grouped AS (SELECT split, shard,
                CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                count(*) AS n_chunks,
                CAST(max(cum_excl // 64) + 1 AS BIGINT) AS n_seqs,
                CAST(sum(nt) AS BIGINT) AS n_tokens
              FROM w GROUP BY split, shard)
            SELECT CAST(count(*) AS BIGINT) AS n_groups,
              CAST(coalesce(sum(n_docs), 0) AS BIGINT) AS sum_docs,
              CAST(coalesce(sum(n_chunks), 0) AS BIGINT) AS sum_chunks,
              CAST(coalesce(sum(n_seqs), 0) AS BIGINT) AS sum_seqs,
              CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS sum_tokens,
              CAST(coalesce(sum((((((CASE split WHEN 'train' THEN 0
                    WHEN 'valid' THEN 1 ELSE 2 END * 8 + shard)
                * 1048573 + n_docs) % 1000000007 * 1048573 + n_chunks)
                % 1000000007 * 1048573 + n_seqs) % 1000000007
                * 1048573 + n_tokens) % 1000000007), 0) AS BIGINT)
                AS group_sig
            FROM grouped"""))
  }

  /** t19: the BASIS-TRACKED maintainer end to end — a managed document
    * table commits three windows (initial corpus, late append, DV +
    * rewriting deletes) and `IncrementalInvertedIndex.refresh()` folds
    * each one through the change feed: full build, then O(changed docs)
    * incremental windows, nothing corpus-sized re-derived and the
    * basis recording exactly which table version the index serves.
    * This is the per-micro-batch call a streaming ingest makes; t16
    * gates the applyChanges primitives, this gates the refresh loop
    * that drives them. Oracle: t15's scoring restricted to the live
    * documents after all three windows. */
  val indexRefreshQ: GQuery = GQuery(
    "t19_index_refresh",
    (s, d) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_t19").toString
      val docsDf = docs(s, d).select(col("doc_id"), col("text"))
      val src = new graft.io.ManagedParquetTable(s, s"$root/t")
      val idx = new graft.text.IncrementalInvertedIndex(
        s, s"$root/t", s"$root/idx")
      src.append(docsDf.where(col("doc_id") % 3 =!= 2))
      idx.refresh() // full build
      src.append(docsDf.where(col("doc_id") % 3 === 2))
      idx.refresh() // incremental append window
      src.deleteWhereDV(col("doc_id") % 10 === 7)
      src.deleteWhere(col("doc_id") % 7 === 1)
      idx.refresh() // deletes tombstone; rewrite survivors round-trip
      graft.text.InvertedIndex.bm25TopKIndexed(
        s, s"$root/idx", "hash join table", k = 20)
    },
    Some(s"""WITH t AS (SELECT doc_id, $SqlToks AS toks FROM documents
              WHERE doc_id % 10 <> 7 AND doc_id % 7 <> 1),
            lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
            corpus AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(dl) AS BIGINT) AS tt FROM lens),
            tf AS (SELECT doc_id, tok AS token,
              CAST(count(*) AS BIGINT) AS tf
              FROM t, unnest(toks) AS u(tok)
              WHERE tok IN ('hash', 'join', 'table') GROUP BY 1, 2),
            dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY 1),
            sc AS (SELECT doc_id,
              (((n * 1000) // df) * (tf * 22 * tt))
                // (10 * tt * tf + 3 * tt + 9 * dl * n) AS s
              FROM tf JOIN dfreq USING (token) JOIN lens USING (doc_id),
                corpus),
            agg AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS score,
              count(*) AS n_terms FROM sc GROUP BY 1),
            r AS (SELECT CAST(row_number() OVER (ORDER BY score DESC,
              doc_id) AS BIGINT) AS rank, doc_id, score, n_terms FROM agg)
            SELECT rank, doc_id, score, n_terms FROM r
            WHERE rank <= 20 ORDER BY rank"""))

  val all: Seq[GQuery] =
    Seq(tokenStats, quality, langIdQ, fingerprintQ, shinglesQ, bpeTokens,
      chunking, corpusCuration, stratifiedSampleQ, weightedSampleQ,
      sequencePackingQ, tfIdfQ, vocabQ, redactQ, repetitionQ, mixtureQ,
      curriculumQ, budgetSelectQ, splitAssignQ, surprisalQ, phraseIndexQ,
      bm25Q, bm25IndexedQ, multiPhraseQ, hybridRrfQ, indexRefreshQ,
      hybridRecallQ, hybridRecallMpQ, trainingPipelineQ, langIdScoredQ,
      curatedPipelineQ, curatedChainAggQ)
}
