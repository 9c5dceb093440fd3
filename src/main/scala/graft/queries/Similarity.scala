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
  private def sqlDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(range(64), i ->
           CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE))),
         (acc, x) -> acc + x)"""

  private def sqlCosine(a: String, b: String): String =
    s"""CASE WHEN sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)}) = 0 THEN 0.0
        ELSE ${sqlDot(a, b)} /
          (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)})) END"""

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

  val all: Seq[GQuery] = Seq(bruteTopK, lshBuckets, nearDups, annTopK)
}
