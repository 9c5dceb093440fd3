package graft.streaming

import graft.text.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus curation — the training-data pipeline's ingest
  * path as ONE continuous query: JSONL document drops → quality/
  * language gate (native kernels) → exact-dedup across micro-batches
  * (watermarked fingerprint state, the streaming analog of batch d1/
  * d9) → token-window chunking → append sink with checkpointing.
  *
  * Every stage is the SAME operator the batch path uses (text_stats,
  * lang_id, normalizedText fingerprint, chunkDocuments), so batch
  * backfill and streaming ingest cannot drift — the property a
  * production corpus pipeline needs when it replays history through
  * the batch engine and tails fresh crawls through this stream.
  *
  * Scale: per-row kernels run inside the micro-batch scan; dedup state
  * is (md5 digest, event-time) bounded by the watermark — state size
  * is O(docs per watermark window), never O(corpus). The chunk explode
  * multiplies rows AFTER dedup, so dropped duplicates cost nothing
  * downstream. */
object CurationStream {

  /** Documents arrive as JSONL: {"doc_id":…,"text":…,"event_ts":…}. */
  def source(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .format("text")
      .option("maxFilesPerTrigger", 10)
      .load(dir)

  /** Decode + gate + fingerprint (no streaming-specific ops yet). */
  def prepared(raw: DataFrame, minTokens: Int = 3): DataFrame = {
    val parsed = raw.select(from_json(col("value"),
      "doc_id LONG, text STRING, event_ts TIMESTAMP",
      Map.empty[String, String]).as("d"))
      .select(col("d.doc_id"), col("d.text"), col("d.event_ts"))
      // event_ts gated explicitly: rows with a null/unparsable event
      // time would otherwise reach the watermark/dedup stateful
      // operator and be discarded there invisibly. The drop is still a
      // drop — audit it with [[rejects]] as a parallel stream/batch
      .filter(col("doc_id").isNotNull && col("text").isNotNull &&
        col("event_ts").isNotNull)
    val st = graft.expressions.TextStatsExpressions.text_stats(col("text"))
    parsed
      .withColumn("n_tokens", st.getField("n_tokens"))
      .filter(col("n_tokens") >= minTokens)
      .withColumn("lang",
        graft.expressions.TextStatsExpressions.lang_id(col("text")))
      .withColumn("fp", md5(TextFunctions.normalizedText(col("text"))))
  }

  /** Rows [[prepared]] silently excludes — malformed JSON, null ids/
    * text/event time. Run it over the same source (or its backlog
    * directory in batch) to audit ingest losses; zero rows here means
    * the gate dropped nothing. */
  def rejects(raw: DataFrame): DataFrame =
    raw.select(col("value"), from_json(col("value"),
      "doc_id LONG, text STRING, event_ts TIMESTAMP",
      Map.empty[String, String]).as("d"))
      .filter(col("d").isNull || col("d.doc_id").isNull ||
        col("d.text").isNull || col("d.event_ts").isNull)
      .select(col("value"))

  /** Start the curation stream: dedup on content fingerprint within
    * the watermark, chunk, append to parquet. */
  def start(raw: DataFrame, outPath: String, checkpoint: String,
      watermark: String = "1 hour", chunkTokens: Int = 32,
      overlap: Int = 8,
      trigger: Trigger = Trigger.ProcessingTime("2 seconds")): StreamingQuery = {
    val deduped = prepared(raw)
      .withWatermark("event_ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
    val chunked = TextFunctions
      .chunkDocuments(deduped, "text", chunkTokens, overlap)
      .select(col("doc_id"), col("lang"), col("fp"), col("event_ts"),
        col("chunk_idx"), col("chunk_text"), col("n_chunk_tokens"))
    chunked.writeStream
      .trigger(trigger)
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", outPath)
      .start()
  }
}
