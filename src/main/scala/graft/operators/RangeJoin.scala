package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join: left rows matched to right rows with
  * rightTs ∈ [leftTs − window, leftTs], per key.
  *
  * The naive plan is a key-equi join with a range predicate — Spark
  * executes that as an equi-join then filters the full per-key pair
  * space (quadratic in events-per-key). Bucketing by the window width
  * replicates the right side ×2 and turns the range predicate into an
  * equi-join on (key, bucket): each left row only meets right rows from
  * its own and the previous bucket — candidate pairs shrink from
  * O(n²/keys) to O(n·density), which is the difference at 100 TB.
  */
object RangeJoin {

  def bucketedRangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, window: Long,
      rightCols: Seq[String]): DataFrame = {
    require(window > 0)
    val l = left.withColumn("_bucket", floor(col(leftTs) / window).cast("long"))
    val r = right
      .select((col(key) +: col(rightTs).as("_rts") +: rightCols.map(col)): _*)
      .withColumn("_rb", floor(col("_rts") / window).cast("long"))
      // a right row at bucket b can match left rows in buckets b and b+1
      .withColumn("_bucket", explode(array(col("_rb"), col("_rb") + 1)))
      .drop("_rb")
    l.join(r, Seq(key, "_bucket"))
      .filter(col("_rts") >= col(leftTs) - window && col("_rts") <= col(leftTs))
      .drop("_bucket")
  }

  /** Bucketed INTERVAL-OVERLAP join: both sides are intervals; pairs
    * where [lStart,lEnd] ∩ [rStart,rEnd] ≠ ∅ per key. Each interval
    * explodes into the `bucket`-width buckets it covers, the join is
    * equi on (key, bucket), and each overlapping pair is kept exactly
    * once WITHOUT a distinct: only in the bucket containing the overlap
    * start (max of the two starts) — a row-local post-filter, so no
    * second shuffle. Candidates are O(n · interval/bucket · density)
    * instead of the per-key quadratic pair space; pick `bucket` near
    * the typical interval length (replication factor ≈ 2). Spark has
    * no native interval join — this is the standard distributed
    * decomposition (genomics/AD-tech overlap joins at 100 TB). */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, key: String,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucket: Long, rightCols: Seq[String]): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    def buckets(s: String, e: String) =
      sequence(floor(col(s) / bucket).cast("long"),
        floor(col(e) / bucket).cast("long"))
    val l = left.withColumn("_b", explode(buckets(lStart, lEnd)))
    val r = right
      .select((col(key) +: col(rStart) +: col(rEnd) +: rightCols.map(col)): _*)
      .withColumn("_b", explode(buckets(rStart, rEnd)))
    l.join(r, Seq(key, "_b"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_b") ===
        floor(greatest(col(lStart), col(rStart)) / bucket).cast("long"))
      .drop("_b")
  }
}
