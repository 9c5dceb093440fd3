package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact per-group interpolated percentiles WITHOUT a per-group funnel.
  *
  * Spark's `percentile` aggregate is exact but centralizing: every
  * group's full value-counts map is merged and sorted inside ONE final
  * aggregation buffer, so a 3-group corpus puts the entire dataset
  * through 3 tasks — the same scale-killer as an unpartitioned window.
  * (`approx_percentile` fixes scale by giving up exactness; this
  * operator keeps both.)
  *
  * Decomposition (the [[Ranking]] histogram-offset idea applied to
  * order statistics), for a LONG value column:
  *
  *  1. the coarse-bucket (value >> shift) count histogram comes
  *     straight off the raw rows — map-side combine collapses the
  *     corpus into partials bounded by the VALUE RANGE (groups ·
  *     range/2^shift rows), independent of corpus size — driver-scale
  *     state of the same class as kmeansFit's centroid matrix;
  *  2. it is collected, and all rank arithmetic happens in plain
  *     Scala: per-group totals, each quantile's type-7 ranks (1-based
  *     ⌊h⌋+1 / ⌈h⌉+1 for h = f·(n−1)), and which bucket holds each
  *     rank (running-sum offsets);
  *  3. order statistics come from a second raw pass over ONLY the
  *     located buckets: per-(group, bucket, value) counts (≤ 2^shift
  *     distinct values per bucket, bounded however skewed the
  *     multiplicities), a cumsum window partitioned by (group, bucket),
  *     and a broadcast range join against the located ranks — the
  *     output is O(groups · fractions) rows, collected;
  *  4. v = v_lo + (v_hi − v_lo)·(h − ⌊h⌋) on the driver — identical
  *     arithmetic to Spark `percentile` / DuckDB quantile_cont over
  *     integers at dyadic fractions.
  *
  * Two pruned corpus scans, no corpus-sized shuffle, no cache, no
  * global sort; no task ever holds more than one bucket of one group.
  * The operator is EAGER: the result (a tiny local frame) is computed
  * on call. Arithmetic shift keeps negative values ordered. NULL values
  * are ignored (like the builtin); groups whose every value is NULL are
  * absent.
  */
object Percentiles {

  /** Long-format exact type-7 percentiles: one row per (group,
    * fraction). `valueCol` must be integral (exactness of the
    * interpolation is only engine-portable over integers — see a8's
    * cents contract).
    *
    * Adaptive cutover (the [[graft.dedup.Dedup.connectedComponents]]
    * shape): below `useBuiltinBelow` non-null input rows the builtin
    * `percentile` aggregate wins outright — its per-group value map is
    * bounded by the row count, and one warm in-memory aggregation beats
    * the decomposition's counts shuffle. Above it, per-group maps stop
    * fitting one buffer and the histogram decomposition takes over.
    * Both paths produce identical values at dyadic fractions (and are
    * differential-tested); the row count costs one pruned-scan pass.
    *
    * @param shift bucket granularity: collected histogram rows ≈
    *              groups · (value-range >> shift). Default 16 ≈ 1.5k
    *              buckets per 1e8 of range.
    * @param useBuiltinBelow builtin-aggregate cutover; 20M longs is a
    *              ≤ ~320 MB worst-case single-group buffer. 0 forces
    *              the decomposition. */
  def exactByGroup(df: DataFrame, groupCol: String, valueCol: String,
      fractions: Seq[Double], shift: Int = 16,
      useBuiltinBelow: Long = 20000000L): DataFrame = {
    require(fractions.nonEmpty, "need at least one fraction")
    require(fractions.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1]: $fractions")
    require(shift >= 0 && shift < 63, s"shift out of range: $shift")
    val vType = df.schema(valueCol).dataType
    require(vType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }, s"valueCol '$valueCol' must be integral, got $vType — quantize " +
      "fractional values to integer units (e.g. cents) first; a silent " +
      "cast would truncate and disagree with the builtin")
    val spark = df.sparkSession
    val g = col(groupCol)
    // driver-side map key for a collected group value: Array[Byte]
    // compares by reference, so binary keys normalize to a Seq (raw
    // values are kept alongside for the output rows)
    def keyOf(v: Any): Any = v match {
      case b: Array[Byte] => b.toSeq
      case x => x
    }

    val nonNull = df.filter(col(valueCol).isNotNull)
      .select(g, col(valueCol).cast("long").as("_v"))
    if (useBuiltinBelow > 0 && nonNull.count() <= useBuiltinBelow) {
      val fracArr = s"array(${fractions.mkString("D,")}D)"
      return nonNull.groupBy(g)
        .agg(expr(s"percentile(_v, $fracArr)").as("_ps"))
        .select(g, explode(arrays_zip(
            typedlit(fractions).as("fraction"), col("_ps").as("value")))
          .as("_z"))
        .select(g, col("_z.fraction").as("fraction"),
          col("_z.value").as("value"))
    }

    // (1)+(2) bounded bucket histogram straight off the raw rows — the
    // map-side combine collapses the corpus into ≤ groups·buckets
    // partials, so nothing corpus-sized ever shuffles (a per-(group,
    // value) counts pre-pass would shuffle one row per DISTINCT value —
    // ~the corpus for near-unique values). Collected to the driver
    // under an explicit bound (fail fast with advice instead of a
    // driver OOM when the value range is too wide for the shift — e.g.
    // epoch-micros at shift=16); all rank math is local. Group keys
    // stay raw Row values so any group type round-trips (binary via
    // keyOf).
    val maxHistRows = 8 << 20
    val hist = nonNull.groupBy(g, expr(s"_v >> $shift").as("_b"))
      .agg(count(lit(1)).as("_bc"))
      .limit(maxHistRows + 1)
      .collect().map(r => (r.get(0), r.getLong(1), r.getLong(2)))
    require(hist.length <= maxHistRows,
      s"bucket histogram exceeds $maxHistRows rows at shift=$shift — " +
        "raise shift so groups * (value-range >> shift) is driver-scale")
    // per group: buckets ascending, exclusive offsets, total n
    case class Located(gk: Any, bucket: Long, off: Long, rank: Long)
    val located = scala.collection.mutable.ArrayBuffer.empty[Located]
    // (group, fraction) -> (h, rlo, rhi) for the final interpolation
    val quant = scala.collection.mutable.ArrayBuffer
      .empty[(Any, Double, Double, Long, Long)]
    hist.groupBy(r => keyOf(r._1)).foreach { case (_, rows) =>
      val gk = rows.head._1 // raw representative for output/loc rows
      val buckets = rows.sortBy(_._2) // (gk, bucket, bucketCount)
      val n = buckets.iterator.map(_._3).sum
      // ranks this group needs (1-based), deduplicated
      val needed = scala.collection.mutable.SortedSet.empty[Long]
      fractions.foreach { f =>
        val h = f * (n - 1).toDouble
        val rlo = math.floor(h).toLong + 1
        val rhi = math.ceil(h).toLong + 1
        quant += ((gk, f, h, rlo, rhi))
        needed += rlo; needed += rhi
      }
      // locate each rank's bucket by walking the running sum once
      var off = 0L; var bi = 0
      needed.foreach { r =>
        while (off + buckets(bi)._3 < r) { off += buckets(bi)._3; bi += 1 }
        located += Located(gk, buckets(bi)._2, off, r)
      }
    }

    val gField = nonNull.schema(groupCol)
    val locSchema = StructType(Seq(gField.copy(name = "_ng"),
      StructField("_lb", LongType, nullable = false),
      StructField("_off", LongType, nullable = false),
      StructField("_r", LongType, nullable = false)))
    val locDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        located.toSeq.map(l => Row(l.gk, l.bucket, l.off, l.rank)), 1),
      locSchema)
    val targets = locDf.select(col("_ng"), col("_lb")).distinct()

    // (3) order statistics from a second raw pass over ONLY the located
    // buckets: the broadcast semi filter keeps ~(ranks · bucket
    // population) rows, the per-(group, bucket, value) counts agg is
    // again map-side combined (≤ 2^shift distinct values per bucket —
    // bounded however skewed the multiplicities), and the cumsum window
    // partitions are bucket-width bounded, never group-sized
    val wIn = Window.partitionBy(g, col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = nonNull.withColumn("_b", expr(s"_v >> $shift"))
      .join(broadcast(targets), g <=> col("_ng") && col("_b") === col("_lb"))
      .groupBy(g, col("_b"), col("_v")).agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum(col("_c")).over(wIn))
    val ostat = inBucket.join(broadcast(locDf),
        g <=> col("_ng") && col("_b") === col("_lb") &&
          col("_r") > col("_off") + col("_cum") - col("_c") &&
          col("_r") <= col("_off") + col("_cum"))
      .select(col("_ng"), col("_r"), col("_v"))
      .collect().map(r => (keyOf(r.get(0)), r.getLong(1)) -> r.getLong(2))
      .toMap

    // (4) interpolate — exact for integer values at dyadic fractions.
    // Differences in DOUBLE (like the builtin): a long vhi−vlo would
    // silently wrap for spans over 2^63, and doubles are exact for
    // every |value| < 2^53 anyway
    val out = quant.toSeq.map { case (gk, f, h, rlo, rhi) =>
      val vlo = ostat((keyOf(gk), rlo)).toDouble
      val vhi = ostat((keyOf(gk), rhi)).toDouble
      Row(gk, f, vlo + (vhi - vlo) * (h - math.floor(h)))
    }
    val outSchema = StructType(Seq(gField,
      StructField("fraction", DoubleType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), outSchema)
  }
}
