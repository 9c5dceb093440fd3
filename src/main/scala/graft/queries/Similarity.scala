package graft.queries

import graft.{GQuery, Tables}
import graft.similarity.VectorFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (array<float>, dim 64).
  * Oracles compute the identical double-precision left-fold arithmetic
  * in DuckDB (explicit list_reduce, not list_cosine_similarity, so the
  * summation order matches bit-for-bit before rounding). */
object Similarity {

  val Dim = 64
  val Planes = 8

  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  /** DuckDB fragment: sequential-fold dot product of two double lists. */
  private def sqlDotD(a: String, b: String, n: Int): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(range($n), i ->
           CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE))),
         (acc, x) -> acc + x)"""

  private def sqlDot(a: String, b: String): String = sqlDotD(a, b, 64)

  private def sqlCosineD(a: String, b: String, n: Int): String =
    s"""CASE WHEN sqrt(${sqlDotD(a, a, n)}) * sqrt(${sqlDotD(b, b, n)}) = 0
        THEN 0.0
        ELSE ${sqlDotD(a, b, n)} /
          (sqrt(${sqlDotD(a, a, n)}) * sqrt(${sqlDotD(b, b, n)})) END"""

  private def sqlCosine(a: String, b: String): String =
    s"""CASE WHEN sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)}) = 0 THEN 0.0
        ELSE ${sqlDot(a, b)} /
          (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)})) END"""

  /** DuckDB fragment: sequential-fold squared L2 distance. */
  private def sqlSqDistD(a: String, b: String, n: Int): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(range($n), i ->
           (CAST($a[i+1] AS DOUBLE) - CAST($b[i+1] AS DOUBLE)) *
           (CAST($a[i+1] AS DOUBLE) - CAST($b[i+1] AS DOUBLE)))),
         (acc, x) -> acc + x)"""

  /** Exact brute-force cosine top-10 for query vectors (vec_id < 5). */
  val bruteTopK: GQuery = GQuery(
    "v1_cosine_topk",
    (s, d) => {
      val e = emb(s, d)
      bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 10)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""SELECT q.vec_id AS query_id,
              row_number() OVER (PARTITION BY q.vec_id
                ORDER BY round(${sqlCosine("q.embedding", "c.embedding")}, 6) DESC,
                         c.vec_id) AS rank,
              c.vec_id AS neighbor_id,
              round(${sqlCosine("q.embedding", "c.embedding")}, 6) AS sim
            FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
            WHERE q.vec_id < 5
            QUALIFY rank <= 10
            ORDER BY query_id, rank"""))

  /** LSH bucket code per vector (sign random projection, 8 planes). */
  val lshBuckets: GQuery = GQuery(
    "v2_lsh_bucket",
    (s, d) =>
      emb(s, d)
        .select(col("vec_id"),
          lshCode(col("embedding"), Planes, Dim).as("bucket"))
        .orderBy(col("vec_id")),
    Some(s"""SELECT vec_id,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(8), j ->
                  CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                    list_transform(range(64), i ->
                      CAST(embedding[i+1] AS DOUBLE) *
                      (CAST(((2654435761 * (j*64 + i + 1)) % 1000000007) % 2001
                            - 1000 AS DOUBLE) / 1000.0))),
                    (acc, x) -> acc + x) > 0
                  THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END)),
                (acc, x) -> acc + x) AS bucket
            FROM embeddings ORDER BY vec_id"""))

  /** Embedding-cosine near-duplicate pairs: same LSH bucket AND
    * cosine >= 0.35 (≈ p99.9 of the pair distribution at these sfs, so
    * the result is non-degenerate; adjacent-bucket recall loss is the
    * documented ANN trade-off; exact variant is v1). */
  val nearDups: GQuery = GQuery(
    "v3_cosine_neardup",
    (s, d) => cosineNearDups(emb(s, d), threshold = 0.35, Planes, Dim)
      .orderBy(col("id_a"), col("id_b")),
    Some(s"""WITH b AS (
              SELECT vec_id, embedding,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(range(8), j ->
                    CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                      list_transform(range(64), i ->
                        CAST(embedding[i+1] AS DOUBLE) *
                        (CAST(((2654435761 * (j*64 + i + 1)) % 1000000007) % 2001
                              - 1000 AS DOUBLE) / 1000.0))),
                      (acc, x) -> acc + x) > 0
                    THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END)),
                  (acc, x) -> acc + x) AS bucket
              FROM embeddings)
            SELECT l.vec_id AS id_a, r.vec_id AS id_b,
              round(${sqlCosine("l.embedding", "r.embedding")}, 6) AS sim
            FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
            WHERE round(${sqlCosine("l.embedding", "r.embedding")}, 6) >= 0.35
            ORDER BY id_a, id_b"""))

  /** ANN top-5 via LSH (exact-bucket candidates, cosine-verified) for
    * query vectors vec_id < 5. */
  val annTopK: GQuery = GQuery(
    "v4_ann_lsh_topk",
    (s, d) => {
      val e = emb(s, d)
      lshTopK(e, e.filter(col("vec_id") < 5), k = 5, Planes, Dim)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH b AS (
              SELECT vec_id, embedding,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(range(8), j ->
                    CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                      list_transform(range(64), i ->
                        CAST(embedding[i+1] AS DOUBLE) *
                        (CAST(((2654435761 * (j*64 + i + 1)) % 1000000007) % 2001
                              - 1000 AS DOUBLE) / 1000.0))),
                      (acc, x) -> acc + x) > 0
                    THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END)),
                  (acc, x) -> acc + x) AS bucket
              FROM embeddings)
            SELECT q.vec_id AS query_id,
              row_number() OVER (PARTITION BY q.vec_id
                ORDER BY round(${sqlCosine("q.embedding", "c.embedding")}, 6) DESC,
                         c.vec_id) AS rank,
              c.vec_id AS neighbor_id,
              round(${sqlCosine("q.embedding", "c.embedding")}, 6) AS sim
            FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
            WHERE q.vec_id < 5
            QUALIFY rank <= 5
            ORDER BY query_id, rank"""))

  /** Shared oracle CTEs for the IVF path: centroids = vec_id < 16 (a
    * deterministic stand-in for trained centroids — the quantizer is
    * pluggable; the plan shape is what's under test), assignment =
    * argmax cosine with id tiebreak. */
  private val SqlIvf =
    s"""WITH c AS (SELECT vec_id AS centroid_id, embedding AS cv
          FROM embeddings WHERE vec_id < 16),
        asg AS (
          SELECT vec_id, centroid_id, sim FROM (
            SELECT e.vec_id, c.centroid_id,
              round(${sqlCosine("e.embedding", "c.cv")}, 6) AS sim,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY round(${sqlCosine("e.embedding", "c.cv")}, 6) DESC,
                         c.centroid_id) AS rn
            FROM embeddings e, c) WHERE rn = 1)"""

  /** IVF coarse assignment (nearest centroid per vector). */
  val ivfAssignQ: GQuery = GQuery(
    "v5_ivf_assign",
    (s, d) => {
      val e = emb(s, d)
      ivfAssign(e, e.filter(col("vec_id") < 16))
        .orderBy(col("vec_id"))
    },
    Some(s"""$SqlIvf
            SELECT vec_id, centroid_id, sim FROM asg ORDER BY vec_id"""))

  /** IVF ANN top-5 with nprobe=2 for queries vec_id < 5. */
  val ivfTopKQ: GQuery = GQuery(
    "v6_ivf_topk",
    (s, d) => {
      val e = emb(s, d)
      ivfTopK(e, e.filter(col("vec_id") < 5), e.filter(col("vec_id") < 16),
        k = 5, nprobe = 2)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""$SqlIvf,
            probes AS (
              SELECT query_id, qv, centroid_id FROM (
                SELECT q.vec_id AS query_id, q.embedding AS qv, c.centroid_id,
                  row_number() OVER (PARTITION BY q.vec_id
                    ORDER BY round(${sqlCosine("q.embedding", "c.cv")}, 6) DESC,
                             c.centroid_id) AS rn
                FROM embeddings q, c WHERE q.vec_id < 5) WHERE rn <= 2),
            cand AS (
              SELECT p.query_id, p.qv, a.vec_id AS neighbor_id, e.embedding AS nv
              FROM probes p
              JOIN asg a ON a.centroid_id = p.centroid_id
              JOIN embeddings e ON e.vec_id = a.vec_id
              WHERE a.vec_id != p.query_id)
            SELECT query_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY round(${sqlCosine("qv", "nv")}, 6) DESC, neighbor_id)
                AS rank,
              neighbor_id,
              round(${sqlCosine("qv", "nv")}, 6) AS sim
            FROM cand
            QUALIFY rank <= 5
            ORDER BY query_id, rank"""))

  /** Affine uint8 quantization: exact integer code checks (sum over all
    * 64 codes + extreme-code count) beside round-6 min/max and a
    * reconstruction-error boolean with scale-wide margin (true error is
    * ≤ scale/2, so the compare sits far from any float boundary). */
  val quantizeQ: GQuery = GQuery(
    "v7_quantize",
    (s, d) => {
      val q = quantizeU8(col("embedding"))
      emb(s, d)
        .withColumn("_q", q)
        .withColumn("_dv", transform(col("embedding"), x => x.cast("double")))
        .select(col("vec_id"),
          round(col("_q.vmin"), 6).as("vmin"),
          round(col("_q.vmax"), 6).as("vmax"),
          aggregate(col("_q.codes"), lit(0L),
            (a, c) => a + c.cast("long")).as("code_sum"),
          size(filter(col("_q.codes"),
            c => c === 0 || c === 255)).cast("long").as("n_extreme"),
          forall(
            zip_with(dequantizeU8(col("_q")), col("_dv"),
              (r, x) => abs(r - x) <=
                (col("_q.vmax") - col("_q.vmin")) / 255.0 + 1e-12),
            b => b).as("reconstruct_ok"))
        .orderBy(col("vec_id"))
    },
    Some("""WITH e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
            m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx
              FROM e),
            q AS (SELECT vec_id, v, mn, mx,
              CASE WHEN mx = mn THEN list_transform(v,
                x -> CASE WHEN x IS NULL THEN NULL ELSE 0 END)
              ELSE list_transform(v, x ->
                CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS INTEGER))
              END AS codes
              FROM m)
            SELECT vec_id, round(mn, 6) AS vmin, round(mx, 6) AS vmax,
              CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(codes, c -> CAST(c AS BIGINT))),
                (a, b) -> a + b) AS BIGINT) AS code_sum,
              CAST(len(list_filter(codes, c -> c = 0 OR c = 255)) AS BIGINT)
                AS n_extreme,
              CASE WHEN mx = mn THEN TRUE ELSE
                list_reduce(list_prepend(TRUE,
                  list_transform(range(64), i ->
                    abs((mn + CAST(codes[i+1] AS DOUBLE) * (mx - mn) / 255.0)
                        - v[i+1]) <= (mx - mn) / 255.0 + 1e-12)),
                  (a, b) -> a AND b) END AS reconstruct_ok
            FROM q ORDER BY vec_id"""))

  /** Oracle for the two-stage quantized search (shared by v8's inline
    * and v9's stored-index variant — the index is a pure storage
    * optimization, so both hash-match the SAME replayed pipeline:
    * quantization, code-dot fold, candidate window, cosine re-rank). */
  private val SqlQuantizedTopK: String =
    s"""WITH e AS (SELECT vec_id, embedding,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
            m AS (SELECT vec_id, embedding, v, list_min(v) AS mn,
              list_max(v) AS mx FROM e),
            q AS (SELECT vec_id, embedding, v,
              CASE WHEN mx = mn THEN list_transform(v,
                x -> CASE WHEN x IS NULL THEN NULL ELSE 0 END)
              ELSE list_transform(v, x ->
                CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS INTEGER))
              END AS codes
              FROM m),
            pairs AS (SELECT qr.vec_id AS query_id, c.vec_id AS neighbor_id,
              c.embedding AS ce, qr.embedding AS qe,
              CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(64), i ->
                  CAST(c.codes[i+1] AS BIGINT) * CAST(qr.codes[i+1] AS BIGINT))),
                (a, b) -> a + b) AS BIGINT) AS code_dot
              FROM q qr JOIN q c ON c.vec_id != qr.vec_id
              WHERE qr.vec_id < 3),
            cand AS (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY code_dot DESC, neighbor_id) AS cand_rank FROM pairs),
            top AS (SELECT query_id, neighbor_id, code_dot,
              round(${sqlCosine("qe", "ce")}, 6) AS sim
              FROM cand WHERE cand_rank <= 20),
            r AS (SELECT query_id, neighbor_id, sim, code_dot,
              row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS rank FROM top)
            SELECT query_id, rank, neighbor_id, sim, code_dot FROM r
            WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Two-stage quantized search: integer code-dot candidates (exact
    * BIGINT arithmetic both engines) re-ranked by full-precision
    * cosine. */
  val quantizedTopKQ: GQuery = GQuery(
    "v8_quantized_topk",
    (s, d) => {
      val e = emb(s, d)
      quantizedTopK(e, e.filter(col("vec_id") < 3), kCand = 20, k = 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("sim"), col("code_dot"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(SqlQuantizedTopK))

  /** v8's search over a PERSISTED quantized index: codes+vmin/vmax are
    * written once through ManagedParquetTable and stage 1 scans only
    * that stored code table — the real compressed-index lifecycle
    * (build once, search many) rather than re-quantizing the corpus per
    * query. Hash-matches the identical oracle as v8 on the same
    * fixture, proving the storage round-trip changes nothing. */
  /** One stored index per sf dir per JVM — "build once, search many"
    * is the point of the gate, and memoizing keeps repeated invocations
    * (plan sweeps, bench, verify) from re-running the build write and
    * littering temp dirs. */
  private val v9Index =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val storedQuantizedTopKQ: GQuery = GQuery(
    "v9_stored_quantized_topk",
    (s, d) => {
      val e = emb(s, d)
      val idxDir = v9Index.computeIfAbsent(d, _ => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft_v9_index").toString
        new graft.io.ManagedParquetTable(s, dir)
          .overwrite(buildQuantizedIndex(e))
        dir
      })
      val index = new graft.io.ManagedParquetTable(s, idxDir)
      storedQuantizedTopK(index.read(), e, e.filter(col("vec_id") < 3),
        kCand = 20, k = 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("sim"), col("code_dot"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(SqlQuantizedTopK))

  /** One k-means iteration in DuckDB SQL: assignment against `cPrev`
    * (rounded fold-cosine, id tiebreak — identical to ivfAssign's
    * scoring) then the id-ordered fold mean per (centroid, dim), with
    * empty clusters carrying their previous position. */
  private def sqlKmeansIter(n: Int): String = {
    val (prev, a, u, next) = (s"c$n", s"a$n", s"u$n", s"c${n + 1}")
    s"""$a AS (SELECT id, v, cid FROM (
          SELECT b.id, b.v, c.cid,
            row_number() OVER (PARTITION BY b.id
              ORDER BY round(${sqlCosine("b.v", "c.cv")}, 6) DESC, c.cid)
              AS rn
          FROM kbase b CROSS JOIN $prev c) t WHERE rn = 1),
        $u AS (SELECT a.cid, d.i,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list(a.v[d.i + 1] ORDER BY a.id)),
              (acc, x) -> acc + x) / count(*) AS mean
          FROM $a a CROSS JOIN kdims d GROUP BY a.cid, d.i),
        $next AS (SELECT $prev.cid, coalesce(n.cv, $prev.cv) AS cv
          FROM $prev LEFT JOIN
            (SELECT cid, list(mean ORDER BY i) AS cv FROM $u GROUP BY cid) n
          ON $prev.cid = n.cid)"""
  }

  /** v10: Lloyd's k-means (k=8, 2 iterations) over the full embeddings
    * table — the IVF coarse-quantizer trainer. The oracle replays BOTH
    * iterations (assignment + ordered-fold means) in DuckDB; every
    * centroid coordinate is hash-compared at 6 decimals. */
  val kmeansQ: GQuery = GQuery(
    "v10_kmeans_fit",
    (s, d) =>
      kmeansFit(emb(s, d), k = 8, iters = 2)
        .select(col("centroid_id"), posexplode(col("centroid")))
        .select(col("centroid_id"),
          col("pos").cast("long").as("pos"),
          round(col("col"), 6).as("m"))
        .orderBy(col("centroid_id"), col("pos")),
    Some(s"""WITH kbase AS (SELECT vec_id AS id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
            kdims AS (SELECT unnest(range(64)) AS i),
            c0 AS (SELECT id AS cid, v AS cv FROM kbase ORDER BY id LIMIT 8),
            ${sqlKmeansIter(0)},
            ${sqlKmeansIter(1)}
            SELECT c2.cid AS centroid_id, d.i AS pos,
              round(c2.cv[d.i + 1], 6) AS m
            FROM c2 CROSS JOIN kdims d
            ORDER BY centroid_id, pos"""))

  /** d15: SemDeDup-style semantic dedup — kmeans (k=8, 1 Lloyd
    * iteration) clusters, then drop every vector with a lower-id
    * within-cluster neighbor at cosine >= 0.35. The oracle replays the
    * trainer iteration, the argmax assignment, and the per-pair drop
    * rule; pair cosines reuse precomputed norms (hoisting sqrt(dot) into
    * a CTE computes the identical doubles). */
  val semanticDedupQ: GQuery = GQuery(
    "d15_semantic_dedup",
    (s, d) => {
      val e = emb(s, d).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val cent = kmeansFit(e, k = 8, iters = 1)
        .select(col("centroid_id").as("vec_id"),
          col("centroid").as("embedding"))
      semanticDedup(e, cent, threshold = 0.35)
        .select(col("vec_id")).orderBy(col("vec_id"))
    },
    Some(s"""WITH kbase AS (SELECT vec_id AS id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
            kdims AS (SELECT unnest(range(64)) AS i),
            c0 AS (SELECT id AS cid, v AS cv FROM kbase ORDER BY id LIMIT 8),
            ${sqlKmeansIter(0)},
            asg AS (SELECT id, cid FROM (
              SELECT b.id, c.cid,
                row_number() OVER (PARTITION BY b.id
                  ORDER BY round(${sqlCosine("b.v", "c.cv")}, 6) DESC, c.cid)
                  AS rn
              FROM kbase b CROSS JOIN c1 c) t WHERE rn = 1),
            nrm AS (SELECT id, sqrt(${sqlDot("k.v", "k.v")}) AS nn
              FROM kbase k),
            drops AS (SELECT DISTINCT p2.id AS id
              FROM asg p1 JOIN asg p2 ON p1.cid = p2.cid AND p1.id < p2.id
              JOIN kbase ka ON ka.id = p1.id
              JOIN kbase kb ON kb.id = p2.id
              JOIN nrm na ON na.id = p1.id
              JOIN nrm nb ON nb.id = p2.id
              WHERE round(CASE WHEN na.nn * nb.nn = 0 THEN 0.0
                ELSE ${sqlDot("ka.v", "kb.v")} / (na.nn * nb.nn) END, 6)
                >= 0.35)
            SELECT k.id AS vec_id FROM kbase k
            LEFT JOIN drops d ON k.id = d.id
            WHERE d.id IS NULL ORDER BY vec_id"""))

  /** v11: product-quantization ADC top-10 (m=4 subspaces × ksub=16
    * codes, iters=0 so the codebook is the 16 lowest-id sub-vectors —
    * the trainer itself is gated by v10). The oracle replays codebook
    * construction, the per-subspace argmax encode, and the s-ordered
    * lookup-table fold score. */
  val pqTopKQ: GQuery = GQuery(
    "v11_pq_topk",
    (s, d) => {
      val e = emb(s, d)
      val cbs = pqTrain(e, m = 4, ksub = 16, iters = 0, dim = Dim)
      val codes = pqEncode(e, cbs, m = 4, ksub = 16, dim = Dim)
      pqAdcTopK(codes, e.filter(col("vec_id") < 3), cbs,
        m = 4, ksub = 16, dim = Dim, k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("sim"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH kbase AS (SELECT vec_id AS id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
            subs AS (SELECT unnest(range(4)) AS s),
            bsub AS (SELECT b.id, t.s, b.v[t.s*16+1 : t.s*16+16] AS sv
              FROM kbase b CROSS JOIN subs t),
            init AS (SELECT id, v FROM kbase ORDER BY id LIMIT 16),
            cb AS (SELECT t.s,
                row_number() OVER (PARTITION BY t.s ORDER BY b.id) - 1
                  AS code,
                b.v[t.s*16+1 : t.s*16+16] AS cv
              FROM init b CROSS JOIN subs t),
            enc AS (SELECT id, s, code FROM (
              SELECT t.id, t.s, c.code,
                row_number() OVER (PARTITION BY t.id, t.s
                  ORDER BY round(${sqlCosineD("t.sv", "c.cv", 16)}, 6) DESC,
                           c.code) AS rn
              FROM bsub t JOIN cb c ON c.s = t.s) z WHERE rn = 1),
            pd AS (SELECT q.id AS query_id, e.id AS neighbor_id, e.s,
                ${sqlDotD("q.sv", "c.cv", 16)} AS pdot
              FROM bsub q
              JOIN enc e ON e.s = q.s AND e.id != q.id
              JOIN cb c ON c.s = e.s AND c.code = e.code
              WHERE q.id < 3),
            sc AS (SELECT query_id, neighbor_id,
                round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list(pdot ORDER BY s)), (acc, x) -> acc + x), 6) AS sim
              FROM pd GROUP BY query_id, neighbor_id)
            SELECT query_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS rank,
              neighbor_id, sim
            FROM sc QUALIFY rank <= 10 ORDER BY query_id, rank"""))

  /** v12: IVF-PQ — probe-pruned (nprobe=2 of 16 lists) ADC scoring,
    * the composition of v5/v6's coarse quantizer with v11's code-table
    * scoring. The oracle composes the two replays: centroid probes +
    * argmax assignment restrict WHICH vectors score; codebook + encode
    * + s-ordered LUT fold produce the score. */
  val ivfPqTopKQ: GQuery = GQuery(
    "v12_ivfpq_topk",
    (s, d) => {
      val e = emb(s, d)
      val cbs = pqTrain(e, m = 4, ksub = 16, iters = 0, dim = Dim)
      ivfPqTopK(e, e.filter(col("vec_id") < 3),
        e.filter(col("vec_id") < 16), cbs,
        m = 4, ksub = 16, dim = Dim, k = 10, nprobe = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("sim"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH kbase AS (SELECT vec_id AS id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
            subs AS (SELECT unnest(range(4)) AS s),
            bsub AS (SELECT b.id, t.s, b.v[t.s*16+1 : t.s*16+16] AS sv
              FROM kbase b CROSS JOIN subs t),
            init AS (SELECT id, v FROM kbase ORDER BY id LIMIT 16),
            cb AS (SELECT t.s,
                row_number() OVER (PARTITION BY t.s ORDER BY b.id) - 1
                  AS code,
                b.v[t.s*16+1 : t.s*16+16] AS cv
              FROM init b CROSS JOIN subs t),
            enc AS (SELECT id, s, code FROM (
              SELECT t.id, t.s, c.code,
                row_number() OVER (PARTITION BY t.id, t.s
                  ORDER BY round(${sqlCosineD("t.sv", "c.cv", 16)}, 6) DESC,
                           c.code) AS rn
              FROM bsub t JOIN cb c ON c.s = t.s) z WHERE rn = 1),
            cents AS (SELECT id AS centroid_id, v AS cv FROM kbase
              WHERE id < 16),
            asg AS (SELECT id, centroid_id FROM (
              SELECT b.id, c.centroid_id,
                row_number() OVER (PARTITION BY b.id
                  ORDER BY round(${sqlCosine("b.v", "c.cv")}, 6) DESC,
                           c.centroid_id) AS rn
              FROM kbase b CROSS JOIN cents c) z WHERE rn = 1),
            probes AS (SELECT query_id, centroid_id FROM (
              SELECT q.id AS query_id, c.centroid_id,
                row_number() OVER (PARTITION BY q.id
                  ORDER BY round(${sqlCosine("q.v", "c.cv")}, 6) DESC,
                           c.centroid_id) AS rn
              FROM kbase q CROSS JOIN cents c WHERE q.id < 3) z
              WHERE rn <= 2),
            pd AS (SELECT q.id AS query_id, e.id AS neighbor_id, e.s,
                ${sqlDotD("q.sv", "c.cv", 16)} AS pdot
              FROM bsub q
              JOIN probes p ON p.query_id = q.id
              JOIN asg a ON a.centroid_id = p.centroid_id
                AND a.id != q.id
              JOIN enc e ON e.id = a.id AND e.s = q.s
              JOIN cb c ON c.s = e.s AND c.code = e.code
              WHERE q.id < 3),
            sc AS (SELECT query_id, neighbor_id,
                round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list(pdot ORDER BY s)), (acc, x) -> acc + x), 6) AS sim
              FROM pd GROUP BY query_id, neighbor_id)
            SELECT query_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS rank,
              neighbor_id, sim
            FROM sc QUALIFY rank <= 10 ORDER BY query_id, rank"""))

  /** v15: RESIDUAL IVF-PQ (Jégou TPAMI 2011 §IV — the FAISS
    * billion-scale configuration): vectors are PQ-encoded as residuals
    * v − c(list) and scored as dot(q,c) + ADC(q, r̂), same code bytes
    * as v12. Centroids are vec_ids 16..31 (NOT the 16 lowest) so the
    * iters=0 residual codebook — the 16 lowest-id residuals — is
    * non-degenerate. The oracle replays assignment, residual
    * subtraction, residual codebook + encode, probe selection with the
    * exact dot(q,c) seed, and the seeded s-ordered LUT fold. */
  val ivfPqResidualTopKQ: GQuery = GQuery(
    "v15_ivfpq_residual",
    (s, d) => {
      val e = emb(s, d)
      val cents = e.filter(col("vec_id") >= 16 && col("vec_id") < 32)
      val cbs = pqTrainResidual(e, cents, m = 4, ksub = 16, iters = 0,
        dim = Dim)
      ivfPqResidualTopK(e, e.filter(col("vec_id") < 3), cents, cbs,
        m = 4, ksub = 16, dim = Dim, k = 10, nprobe = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("sim"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH kbase AS (SELECT vec_id AS id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
            subs AS (SELECT unnest(range(4)) AS s),
            bsub AS (SELECT b.id, t.s, b.v[t.s*16+1 : t.s*16+16] AS sv
              FROM kbase b CROSS JOIN subs t),
            cents AS (SELECT id AS centroid_id, v AS cv FROM kbase
              WHERE id >= 16 AND id < 32),
            asg AS (SELECT id, centroid_id FROM (
              SELECT b.id, c.centroid_id,
                row_number() OVER (PARTITION BY b.id
                  ORDER BY round(${sqlCosine("b.v", "c.cv")}, 6) DESC,
                           c.centroid_id) AS rn
              FROM kbase b CROSS JOIN cents c) z WHERE rn = 1),
            res AS (SELECT a.id, a.centroid_id,
                list_transform(range(64), i -> b.v[i+1] - c.cv[i+1]) AS rv
              FROM asg a JOIN kbase b ON b.id = a.id
              JOIN cents c ON c.centroid_id = a.centroid_id),
            rsub AS (SELECT r.id, t.s, r.rv[t.s*16+1 : t.s*16+16] AS sv
              FROM res r CROSS JOIN subs t),
            init AS (SELECT id, rv FROM res ORDER BY id LIMIT 16),
            cb AS (SELECT t.s,
                row_number() OVER (PARTITION BY t.s ORDER BY b.id) - 1
                  AS code,
                b.rv[t.s*16+1 : t.s*16+16] AS cv
              FROM init b CROSS JOIN subs t),
            enc AS (SELECT id, s, code FROM (
              SELECT t.id, t.s, c.code,
                row_number() OVER (PARTITION BY t.id, t.s
                  ORDER BY round(${sqlSqDistD("t.sv", "c.cv", 16)}, 6) ASC,
                           c.code) AS rn
              FROM rsub t JOIN cb c ON c.s = t.s) z WHERE rn = 1),
            probes AS (SELECT query_id, centroid_id, qdotc FROM (
              SELECT q.id AS query_id, c.centroid_id,
                ${sqlDot("q.v", "c.cv")} AS qdotc,
                row_number() OVER (PARTITION BY q.id
                  ORDER BY round(${sqlCosine("q.v", "c.cv")}, 6) DESC,
                           c.centroid_id) AS rn
              FROM kbase q CROSS JOIN cents c WHERE q.id < 3) z
              WHERE rn <= 2),
            pd AS (SELECT q.id AS query_id, e.id AS neighbor_id,
                p.qdotc, e.s, ${sqlDotD("q.sv", "c.cv", 16)} AS pdot
              FROM bsub q
              JOIN probes p ON p.query_id = q.id
              JOIN asg a ON a.centroid_id = p.centroid_id
                AND a.id != q.id
              JOIN enc e ON e.id = a.id AND e.s = q.s
              JOIN cb c ON c.s = e.s AND c.code = e.code
              WHERE q.id < 3),
            sc AS (SELECT query_id, neighbor_id,
                round(list_reduce(list_prepend(qdotc,
                  list(pdot ORDER BY s)), (acc, x) -> acc + x), 6) AS sim
              FROM pd GROUP BY query_id, neighbor_id, qdotc)
            SELECT query_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS rank,
              neighbor_id, sim
            FROM sc QUALIFY rank <= 10 ORDER BY query_id, rank"""))

  /** ANN index-quality diagnostic: recall@5 of the LSH index (v4's
    * path) against exact brute force (v1's path), per query — the
    * evaluation harness an ANN deployment runs before trusting an
    * index, expressed in-engine so it scales with the corpus instead
    * of exporting result sets. Both top-k sets use deterministic
    * id tiebreaks, so the intersection — and the gate hash — is
    * exact. One fused plan: the exact side ranks all candidates, the
    * ANN side ranks its bucket, the hit join is per-(query, neighbor). */
  val annRecallQ: GQuery = GQuery(
    "v13_ann_recall",
    (s, d) => {
      val e = emb(s, d)
      val q = e.filter(col("vec_id") < 5)
      val exact = bruteForceTopK(e, q, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val ann = lshTopK(e, q, k = 5, Planes, Dim)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(ann, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_true"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          Exact.roundDiv(coalesce(col("n_hit"), lit(0L)) * 1000,
            col("n_true")).as("recall_permille"))
        .orderBy(col("query_id"))
    },
    Some(s"""WITH b AS (
              SELECT vec_id, embedding,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(range(8), j ->
                    CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                      list_transform(range(64), i ->
                        CAST(embedding[i+1] AS DOUBLE) *
                        (CAST(((2654435761 * (j*64 + i + 1)) % 1000000007) % 2001
                              - 1000 AS DOUBLE) / 1000.0))),
                      (acc, x) -> acc + x) > 0
                    THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END)),
                  (acc, x) -> acc + x) AS bucket
              FROM embeddings),
            ex AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
              FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
              WHERE q.vec_id < 5
              QUALIFY row_number() OVER (PARTITION BY q.vec_id
                ORDER BY round(${sqlCosine("q.embedding", "c.embedding")}, 6)
                  DESC, c.vec_id) <= 5),
            ann AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
              FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
              WHERE q.vec_id < 5
              QUALIFY row_number() OVER (PARTITION BY q.vec_id
                ORDER BY round(${sqlCosine("q.embedding", "c.embedding")}, 6)
                  DESC, c.vec_id) <= 5),
            h AS (SELECT ex.query_id, count(*) AS n_hit
              FROM ex JOIN ann USING (query_id, neighbor_id)
              GROUP BY 1),
            t AS (SELECT query_id, count(*) AS n_true FROM ex GROUP BY 1)
            SELECT t.query_id, t.n_true,
              coalesce(h.n_hit, 0) AS n_hit,
              ${Exact.roundDivSqlPos("coalesce(h.n_hit, 0) * 1000",
                "t.n_true")} AS recall_permille
            FROM t LEFT JOIN h USING (query_id)
            ORDER BY t.query_id"""))

  /** Multi-probe ANN top-5: v4's exact-bucket search plus the
    * Hamming-1 probe shell (Lv et al., VLDB 2007) — the standard
    * answer to the recall collapse v13 measures. Probe fanout rides
    * the (tiny) query side only; candidates still arrive by bucket
    * join. The oracle expands the same planes+1 probe codes with
    * xor(). */
  val multiProbeQ: GQuery = GQuery(
    "v14_multiprobe_topk",
    (s, d) => {
      val e = emb(s, d)
      lshMultiProbeTopK(e, e.filter(col("vec_id") < 5), k = 5, Planes, Dim)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH b AS (
              SELECT vec_id, embedding,
                list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(range(8), j ->
                    CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                      list_transform(range(64), i ->
                        CAST(embedding[i+1] AS DOUBLE) *
                        (CAST(((2654435761 * (j*64 + i + 1)) % 1000000007) % 2001
                              - 1000 AS DOUBLE) / 1000.0))),
                      (acc, x) -> acc + x) > 0
                    THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END)),
                  (acc, x) -> acc + x) AS bucket
              FROM embeddings),
            probes AS (
              SELECT vec_id AS query_id, embedding AS qv,
                CASE WHEN j = 0 THEN bucket
                  ELSE xor(bucket, CAST(1 AS BIGINT) << (j - 1)) END AS bucket
              FROM b, unnest(range(9)) AS t(j)
              WHERE vec_id < 5)
            SELECT q.query_id,
              row_number() OVER (PARTITION BY q.query_id
                ORDER BY round(${sqlCosine("q.qv", "c.embedding")}, 6) DESC,
                         c.vec_id) AS rank,
              c.vec_id AS neighbor_id,
              round(${sqlCosine("q.qv", "c.embedding")}, 6) AS sim
            FROM probes q JOIN b c ON q.bucket = c.bucket
              AND c.vec_id != q.query_id
            QUALIFY rank <= 5
            ORDER BY query_id, rank"""))

  /** v16: INCREMENTAL index maintenance — the stored quantized index
    * (v9) kept fresh from the source table's change feed instead of
    * rebuilt: three appends refresh O(delta); a dv delete and a
    * scattered rewriting delete both drop index rows without an index
    * rebuild. quantizeU8 is row-local (no training pass), so the
    * maintained index is EXACTLY rebuild-equivalent — the oracle
    * recomputes the quantization facts relationally over the final
    * live set, so any divergence between maintenance and rebuild
    * hash-fails. */
  val indexUpdateQ: GQuery = GQuery(
    "v16_index_update",
    (s, d) => {
      val e = emb(s, d)
      val root = java.nio.file.Files
        .createTempDirectory("graft_v16").toString
      val src = new graft.io.ManagedParquetTable(s, root + "/emb_t")
      val idx = new graft.similarity.IncrementalVectorIndex(
        s, root + "/emb_t", root + "/emb_idx")
      src.append(e.filter(col("vec_id") % 3 === 0))
      idx.refresh() // initial: full encode
      src.append(e.filter(col("vec_id") % 3 === 1))
      idx.refresh()
      require(idx.lastRefresh == "incremental",
        s"append must refresh incrementally, got ${idx.lastRefresh}")
      src.append(e.filter(col("vec_id") % 3 === 2))
      idx.refresh()
      // dv delete: row visibility changes with no file diff — the
      // index drops the rows as key tombstones, no rebuild
      src.deleteWhereDV(col("vec_id") % 5 === 3)
      idx.refresh()
      require(idx.lastRefresh == "incremental",
        s"dv delete must refresh incrementally, got ${idx.lastRefresh}")
      // scattered rewriting delete: delete+insert file pairs net to
      // replace; pure deletes drop
      src.deleteWhere(col("vec_id") % 7 === 2)
      idx.refresh()
      require(idx.lastRefresh == "incremental",
        s"rewrite delete must refresh incrementally, got ${idx.lastRefresh}")
      idx.read()
        .select(col("vec_id"),
          round(col("vmin"), 6).as("vmin"),
          round(col("vmax"), 6).as("vmax"),
          aggregate(col("codes"), lit(0L),
            (a, c) => a + c.cast("long")).as("code_sum"),
          size(filter(col("codes"),
            c => c === 0 || c === 255)).cast("long").as("n_extreme"))
        .orderBy(col("vec_id"))
    },
    Some("""WITH e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
              WHERE vec_id % 5 <> 3 AND vec_id % 7 <> 2),
            m AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx
              FROM e),
            q AS (SELECT vec_id, mn, mx,
              CASE WHEN mx = mn THEN list_transform(v,
                x -> CASE WHEN x IS NULL THEN NULL ELSE 0 END)
              ELSE list_transform(v, x ->
                CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS INTEGER))
              END AS codes
              FROM m)
            SELECT vec_id, round(mn, 6) AS vmin, round(mx, 6) AS vmax,
              CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(codes, c -> CAST(c AS BIGINT))),
                (a, b) -> a + b) AS BIGINT) AS code_sum,
              CAST(len(list_filter(codes, c -> c = 0 OR c = 255)) AS BIGINT)
                AS n_extreme
            FROM q ORDER BY vec_id"""))

  /** v17: PERSISTED IVF-PQ index with change-feed maintenance — v16's
    * lifecycle template applied to the flagship ANN form (v12). The
    * index table stores (id, centroid_id, codes) inverted lists under
    * FROZEN centroids + codebooks; three appends maintain O(delta), a
    * dv delete and a scattered rewriting delete drop rows without a
    * rebuild, and the final probe-pruned STORED search must equal the
    * oracle's from-scratch relational replay (training init, coarse
    * assignment, PQ encode, probe selection, s-ordered ADC fold) over
    * the live set — any divergence between maintenance and rebuild,
    * or between the stored search and the per-run derivation,
    * hash-fails. */
  val ivfPqIndexQ: GQuery = GQuery(
    "v17_ivfpq_index",
    (s, d) => {
      val e = emb(s, d)
      val root = java.nio.file.Files
        .createTempDirectory("graft_v17").toString
      val src = new graft.io.ManagedParquetTable(s, root + "/emb_t")
      val idx = new graft.similarity.IncrementalIvfPqIndex(
        s, root + "/emb_t", root + "/emb_idx",
        m = 4, ksub = 16, dim = Dim)
      // frozen artifacts: centroids = vec_id < 16, codebooks = iters=0
      // pqTrain over the full table (init = 16 lowest ids) — both
      // replayed relationally by the oracle
      idx.train(e.filter(col("vec_id") < 16),
        pqTrain(e, m = 4, ksub = 16, iters = 0, dim = Dim))
      src.append(e.filter(col("vec_id") % 3 === 0))
      idx.refresh() // initial: full encode
      src.append(e.filter(col("vec_id") % 3 === 1))
      idx.refresh()
      require(idx.lastRefresh == "incremental",
        s"append must refresh incrementally, got ${idx.lastRefresh}")
      src.append(e.filter(col("vec_id") % 3 === 2))
      idx.refresh()
      // dv delete: visibility-only change — index drops key tombstones
      src.deleteWhereDV(col("vec_id") % 5 === 3)
      idx.refresh()
      require(idx.lastRefresh == "incremental",
        s"dv delete must refresh incrementally, got ${idx.lastRefresh}")
      // scattered rewriting delete: delete+insert pairs net to replace
      src.deleteWhere(col("vec_id") % 7 === 2)
      idx.refresh()
      require(idx.lastRefresh == "incremental",
        s"rewrite delete must refresh incrementally, got ${idx.lastRefresh}")
      idx.topK(src.read().filter(col("vec_id") < 3), k = 10, nprobe = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("sim"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""WITH kbase AS (SELECT vec_id AS id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
            lv AS (SELECT id, v FROM kbase
              WHERE id % 5 <> 3 AND id % 7 <> 2),
            subs AS (SELECT unnest(range(4)) AS s),
            bsub AS (SELECT b.id, t.s, b.v[t.s*16+1 : t.s*16+16] AS sv
              FROM kbase b CROSS JOIN subs t),
            init AS (SELECT id, v FROM kbase ORDER BY id LIMIT 16),
            cb AS (SELECT t.s,
                row_number() OVER (PARTITION BY t.s ORDER BY b.id) - 1
                  AS code,
                b.v[t.s*16+1 : t.s*16+16] AS cv
              FROM init b CROSS JOIN subs t),
            enc AS (SELECT id, s, code FROM (
              SELECT t.id, t.s, c.code,
                row_number() OVER (PARTITION BY t.id, t.s
                  ORDER BY round(${sqlCosineD("t.sv", "c.cv", 16)}, 6) DESC,
                           c.code) AS rn
              FROM bsub t JOIN cb c ON c.s = t.s) z WHERE rn = 1),
            cents AS (SELECT id AS centroid_id, v AS cv FROM kbase
              WHERE id < 16),
            asg AS (SELECT id, centroid_id FROM (
              SELECT b.id, c.centroid_id,
                row_number() OVER (PARTITION BY b.id
                  ORDER BY round(${sqlCosine("b.v", "c.cv")}, 6) DESC,
                           c.centroid_id) AS rn
              FROM lv b CROSS JOIN cents c) z WHERE rn = 1),
            probes AS (SELECT query_id, centroid_id FROM (
              SELECT q.id AS query_id, c.centroid_id,
                row_number() OVER (PARTITION BY q.id
                  ORDER BY round(${sqlCosine("q.v", "c.cv")}, 6) DESC,
                           c.centroid_id) AS rn
              FROM lv q CROSS JOIN cents c WHERE q.id < 3) z
              WHERE rn <= 2),
            pd AS (SELECT q.id AS query_id, e.id AS neighbor_id, e.s,
                ${sqlDotD("q.sv", "c.cv", 16)} AS pdot
              FROM bsub q
              JOIN probes p ON p.query_id = q.id
              JOIN asg a ON a.centroid_id = p.centroid_id
                AND a.id != q.id
              JOIN enc e ON e.id = a.id AND e.s = q.s
              JOIN cb c ON c.s = e.s AND c.code = e.code
              WHERE q.id < 3),
            sc AS (SELECT query_id, neighbor_id,
                round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list(pdot ORDER BY s)), (acc, x) -> acc + x), 6) AS sim
              FROM pd GROUP BY query_id, neighbor_id)
            SELECT query_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS rank,
              neighbor_id, sim
            FROM sc QUALIFY rank <= 10 ORDER BY query_id, rank"""))

  val all: Seq[GQuery] = Seq(bruteTopK, lshBuckets, nearDups, annTopK,
    ivfAssignQ, ivfTopKQ, quantizeQ, quantizedTopKQ, storedQuantizedTopKQ,
    kmeansQ, semanticDedupQ, pqTopKQ, ivfPqTopKQ, annRecallQ, multiProbeQ,
    ivfPqResidualTopKQ, indexUpdateQ, ivfPqIndexQ)
}
