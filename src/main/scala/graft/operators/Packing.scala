package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sample packing for LLM pre-training: concatenate chunk token streams
  * in a deterministic order and split every `capacity` tokens into
  * fixed-size training sequences (the standard concat-and-split packing
  * of GPT-style pipelines — a chunk may straddle a sequence boundary;
  * its assignment is the sequence where its FIRST token lands).
  *
  * Packing is per shard, not global: a single global order would funnel
  * 100 TB through one window partition. Each shard packs independently
  * in parallel (one shard ≙ one output training shard file), which is
  * exactly how multi-file pre-training datasets are laid out. All
  * arithmetic is integral (`div`/`pmod` on BIGINT cumulative sums) —
  * no float division that could mis-bucket past 2^53 tokens. */
object Packing {

  /** Adds (seq_id, seq_offset) to `chunks`: sequence index within the
    * shard and the chunk's first-token offset inside that sequence.
    * `orderCols` must be a total order within each shard (e.g.
    * (doc_id, chunk_idx)) — ties would make packing nondeterministic. */
  def packSequences(chunks: DataFrame, tokenCol: String, shardCol: Column,
      orderCols: Seq[Column], capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val clash = Seq("_cum_excl", "seq_id", "seq_offset")
      .filter(chunks.columns.contains)
    require(clash.isEmpty,
      s"input frame already has column(s) ${clash.mkString(", ")}")
    val w = Window.partitionBy(shardCol).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("_cum_excl",
        sum(col(tokenCol).cast("long")).over(w) - col(tokenCol))
      .withColumn("seq_id", expr(s"_cum_excl div $capacity"))
      .withColumn("seq_offset", pmod(col("_cum_excl"), lit(capacity)))
      .drop("_cum_excl")
  }

  /** Per-sequence roll-up: chunks and tokens starting in each (shard,
    * seq_id) — the shard-file manifest a training loader reads. */
  def sequenceStats(packed: DataFrame, tokenCol: String,
      shardCol: Column): DataFrame =
    packed.groupBy(shardCol.as("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col(tokenCol).cast("long")).as("n_tokens"))
}
