package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual complement to AQE's
  * skew-join splitting (which only fires on sort-merge joins above the
  * skewedPartitionThreshold; pre-salting also covers aggregations and
  * broadcast-ineligible cases).
  *
  * left (large, skewed) gains a uniform salt in [0, salts); right
  * (smaller) is replicated once per salt value. The join key becomes
  * (key, salt), splitting each hot key's rows across `salts` partitions.
  * Cost: right side × salts — use for dim-ish right sides too big to
  * broadcast but far smaller than the skewed fact. */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // deterministic uniform salt from existing columns (no rand(): keeps
    // retries/speculative tasks consistent)
    val salted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts.toLong)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group-by keys:
    * count-ish aggregates computed per (key, salt) first, then merged.
    * Spark's hash aggregate already does map-side partials; this helps
    * when a single reducer key still overwhelms one task. */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("_salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong)))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum(col("_partial")).as("n"))
}
