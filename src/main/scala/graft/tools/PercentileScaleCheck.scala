package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale evidence for BASELINE.md: at the sf1 tier, the
  * Percentiles.exactByGroup decomposition (builtin cutover disabled)
  * must produce byte-identical quantiles to the builtin percentile
  * aggregate, and its wall time is recorded alongside. Usage:
  *   sbt "runMain graft.tools.PercentileScaleCheck /root/repo/target/sf1"
  */
object PercentileScaleCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("pscale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cents = graft.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    cents.count() // warm the scan
    val fr = Seq(0.25, 0.5, 0.75)

    var t0 = System.nanoTime()
    val dec = graft.operators.Percentiles
      .exactByGroup(cents, "l_returnflag", "cents", fr, useBuiltinBelow = 0L)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val tDec = (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    val blt = cents.groupBy(col("l_returnflag"))
      .agg(expr("percentile(cents, array(0.25D, 0.5D, 0.75D))").as("ps"))
      .collect().flatMap(r => fr.zip(r.getSeq[Double](1))
        .map { case (f, v) => (r.getString(0), f) -> v }).toMap
    val tBlt = (System.nanoTime() - t0) / 1e9

    val same = dec.keySet == blt.keySet && dec.forall { case (k, v) => blt(k) == v }
    println(f"[pscale] rows=${cents.count()} groups=${dec.keySet.map(_._1).size} " +
      f"identical=$same decomposition=${tDec}%.1fs builtin=${tBlt}%.1fs")
    spark.stop()
  }
}
