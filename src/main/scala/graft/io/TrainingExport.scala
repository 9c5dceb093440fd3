package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JSONL training-shard export — the interchange format training
  * loaders consume (one JSON object per line, a fixed set of shard
  * files).
  *
  * Shard membership is decided by hash-partitioning on a KEY column,
  * not by input partitioning: the same document lands in the same
  * shard file on every run, whatever the upstream layout — so a
  * re-export after an incremental top-up only changes the shards whose
  * documents changed. One partition ≙ one shard file; at 100 TB pick
  * nShards so a shard is a few GB (the loader-friendly size), and the
  * write is a single hash shuffle followed by embarrassingly parallel
  * file writes.
  *
  * Caveat: a hash partition with ZERO rows emits no file, so fewer
  * than nShards files can exist when distinct keys are scarce —
  * loaders should glob the output directory rather than assume a
  * dense part-00000..n list. */
object TrainingExport {

  /** Serialize every column of `df` as JSON and write `nShards` text
    * files under `path` (overwrite). Returns the row count written. */
  def writeJsonlShards(df: DataFrame, keyCol: String, nShards: Int,
      path: String): Long = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(df.columns.contains(keyCol), s"no such key column: $keyCol")
    require(!df.columns.contains("_json"),
      "input frame already has a _json column")
    val json = df.withColumn("_json",
      to_json(struct(df.columns.map(col): _*)))
    // row count observed ON the write pass — a read-back count would be
    // a second full I/O pass over every shard at 100 TB
    val obs = org.apache.spark.sql.Observation()
    json.observe(obs, count(lit(1)).as("rows"))
      .repartition(nShards, col(keyCol))
      .select(col("_json").as("value"))
      .write.mode("overwrite").text(path)
    // a provably-EMPTY input is a legal export (a fully-filtered
    // curation run writes zero shards): AQE propagates the empty
    // relation through the plan and the CollectMetrics node is
    // eliminated with it, so the observation completes with NO metrics
    // — absent means 0 here, never a lost count (any row that reached
    // the writer passed through the observe node)
    obs.get.get("rows").map(_.asInstanceOf[Long]).getOrElse(0L)
  }
}
