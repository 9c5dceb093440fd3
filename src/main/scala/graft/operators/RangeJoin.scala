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
}
