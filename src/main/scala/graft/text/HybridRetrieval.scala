package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid sparse+dense retrieval — BM25 over the documents fused with
  * LSH-bucketed dense ANN over the embeddings by reciprocal-rank
  * fusion (the production cheap-retriever pair; reference behavior
  * anchor: the reference serves gold lookups from one modality only,
  * gold/bronzeToGold.py — hybrid fusion is part of the engine's
  * beyond-reference retrieval surface).
  *
  * `probeFanout` is the recall dial the t20 diagnostic exists for:
  * single-bucket LSH (fanout 1) loses fused recall whenever a true
  * dense neighbor sits one sign-flip away; widening the fanout probes
  * that Hamming-1 shell ([[graft.similarity.VectorFunctions
  * .lshMultiProbeTopK]], Lv et al. VLDB 2007) and recovers it at
  * query-side-only cost — the probe codes ride the broadcast side,
  * the corpus is still bucket-joined, never scanned. Both retrievers
  * emit RANKS (never scores) into the fusion, so no calibration is
  * needed and the fused shuffle stays O(lists·k) regardless of corpus
  * size.
  */
object HybridRetrieval {

  /** Fused top-`k` for one query: `query` (bag of words) against
    * `docs(idCol, textCol)` via exact BM25, `queryVecId`'s embedding
    * against `embeddings(vecIdCol, vecCol)` via LSH ANN with
    * `probeFanout` probe codes per query (1 = own bucket; planes+1 =
    * full Hamming-1 shell; up to 1 + planes + planes·(planes−1)/2 =
    * full Hamming-≤2 shell), both lists `listK` deep, RRF-fused.
    * Output: (rank, doc_id, rrf_score, n_lists). */
  def topK(docs: DataFrame, textCol: String, idCol: String,
      query: String, embeddings: DataFrame, queryVecId: Long,
      k: Int, listK: Int, planes: Int, dim: Int,
      probeFanout: Int = 1,
      vecIdCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(probeFanout >= 1, s"probeFanout must be >= 1, got $probeFanout")
    val sparse = InvertedIndex.bm25TopK(docs, textCol, idCol, query,
      listK).select(col("doc_id"), col("rank"))
    val qv = embeddings.filter(col(vecIdCol) === queryVecId)
    val dense = (
      if (probeFanout == 1)
        graft.similarity.VectorFunctions.lshTopK(embeddings, qv,
          k = listK, planes = planes, dim = dim, idCol = vecIdCol,
          vecCol = vecCol)
      else
        graft.similarity.VectorFunctions.lshMultiProbeTopK(embeddings,
          qv, k = listK, planes = planes, dim = dim, idCol = vecIdCol,
          vecCol = vecCol, probes = probeFanout)
      ).select(col("neighbor_id").as("doc_id"), col("rank"))
    graft.operators.Ranking.rrfFuse(Seq(sparse, dense), "doc_id",
      "rank", k)
  }
}
