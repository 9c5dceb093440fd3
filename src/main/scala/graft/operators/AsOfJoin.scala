package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * rightTs <= leftTs, per key.
  *
  * Composed from stock operators (preference (a) of the custom-operator
  * ladder): tag + union + one ordered window per key, then keep left
  * rows. A single shuffle on (key) total — strictly better at scale
  * than the naive approach (join all pairs with rts <= lts, then argmax
  * per left row), which materializes the full pair space; equivalent in
  * data movement to what a dedicated SortMerge-style SparkPlan would do.
  *
  * Tie rules (deterministic): a right row with rts == lts matches
  * (<= semantics — right sorts before left at equal ts); among right
  * rows with identical rts, the highest `rightTiebreak` wins.
  */
object AsOfJoin {

  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightTiebreak: String, rightCols: Seq[String]): DataFrame = {
    val payload = struct(
      (col(ts).as("_rts") +: rightCols.map(col)): _*)
    val rTagged = right
      .withColumn("_payload", payload)
      .select(col(key), col(ts),
        col(rightTiebreak).cast("long").as("_rtb"), col("_payload"))
      .withColumn("_side", lit(0))
    val lTagged = left
      .withColumn("_side", lit(1))
      .withColumn("_rtb", lit(null).cast("long"))
      .withColumn("_payload",
        lit(null).cast(rTagged.schema("_payload").dataType))

    val unioned = lTagged.unionByName(
      rTagged.select(lTagged.columns.map {
        case c if rTagged.columns.contains(c) => col(c)
        case c => lit(null).cast(lTagged.schema(c).dataType).as(c)
      }: _*))

    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"), col("_rtb"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = unioned
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    rightCols.foldLeft(
      joined.withColumn("asof_ts", col("_asof").getField("_rts"))) {
      (df, c) => df.withColumn(s"asof_$c", col("_asof").getField(c))
    }.drop("_side", "_rtb", "_payload", "_asof")
  }
}
