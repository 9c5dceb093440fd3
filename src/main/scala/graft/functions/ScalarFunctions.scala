package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar-function surface (SURVEY.md §2.4, F1–F18) as
  * Column-returning Scala functions — codegen-friendly `functions._`
  * compositions, no UDFs except the two reference-exact formatting
  * fallbacks in [[RefUdfs]].
  *
  * Null semantics deliberately mirror the pandas originals (documented
  * per function); Spark 4 runs ANSI mode, so every "coerce" op uses the
  * try_* family instead of plain casts.
  */
object ScalarFunctions {

  /** F1: µs-epoch long → timestamp, µs-preserving.
    * Ref: bronze/redPandaToDeltaLake.py:80-83 (`datetime.fromtimestamp(
    * x/1_000_000)`); we keep µs and UTC, documented divergence from the
    * second-truncating bronze/consume_data2.py:38-39 variant. */
  def microsToTimestamp(c: Column): Column = timestamp_micros(c)

  /** F1b: ns-epoch long → timestamp (µs truncation; Spark has no ns).
    * Integer division via decimal — double division would lose µs
    * precision on epoch-ns magnitudes (~1.7e18 > 2^53). */
  def nanosToTimestamp(c: Column): Column =
    timestamp_micros(
      (c.cast(org.apache.spark.sql.types.DecimalType(25, 0)) / lit(1000))
        .cast("long"))

  /** F2: string → timestamp with null-on-failure.
    * Ref: gold/bronzeToGold2.py:156-159 (`pd.to_datetime(errors='coerce')`). */
  def toTimestampCoerce(c: Column): Column = try_to_timestamp(c)

  /** F3: string → double with null-on-failure.
    * Ref: gold/2test1.py:131-138 (`pd.to_numeric(errors='coerce')`). */
  def toNumericCoerce(c: Column): Column = c.try_cast("double")

  /** F4: null-fill then cast. Ref: gold/bronzeToGold2.py:150-153. */
  def fillCastInt(c: Column, default: Int = 0): Column =
    coalesce(c, lit(default)).cast("int")
  def fillCastString(c: Column): Column =
    coalesce(c.cast("string"), lit(""))

  /** F5: processing-metadata columns.
    * Ref: bronze/redPandaToDeltaLake.py:86, gold/bronzeToGold.py:181-183. */
  def processingTimestamp(): Column = current_timestamp()
  def processingDate(): Column =
    date_format(current_timestamp(), "yyyy-MM-dd")

  /** F6: elapsed whole seconds between two timestamps.
    * Ref: find_unique_employee.ipynb (cell b0cab438) —
    * `(end-start).total_seconds().astype(int)`. */
  def elapsedSeconds(start: Column, end: Column): Column =
    ((unix_micros(end) - unix_micros(start)) / lit(1000000L)).cast("long")

  /** F7: integer seconds → zero-padded "HH:MM:SS".
    * Ref: google_map/gmap_commute.py:178-182. */
  def secondsToHms(secs: Column): Column = {
    val s = secs.cast("long")
    format_string("%02d:%02d:%02d",
      (s / 3600).cast("long"), ((s % 3600) / 60).cast("long"), (s % 60).cast("long"))
  }

  /** F8: French humanized duration ("X jours et Y heures et Z minutes",
    * singular/plural, "quelques secondes" under a minute), as a pure
    * Column expression. Ref: slack_bot/slack_notifier.py:65-79. */
  def frenchDuration(secs: Column): Column = {
    val s = secs.cast("long")
    val d = (s / 86400L).cast("long")
    val h = ((s % 86400L) / 3600L).cast("long")
    val m = ((s % 3600L) / 60L).cast("long")
    def unit(n: Column, sing: String, plur: String): Column =
      when(n > 1, concat(n.cast("string"), lit(" " + plur)))
        .otherwise(concat(n.cast("string"), lit(" " + sing)))
    val parts = array_compact(array(
      when(d > 0, unit(d, "jour", "jours")),
      when(h > 0, unit(h, "heure", "heures")),
      when(m > 0, unit(m, "minute", "minutes"))))
    when(s < 60, lit("quelques secondes"))
      .otherwise(array_join(parts, " et "))
  }

  /** F9: metres → 3-significant-figure display string
    * (≥1000 m → km, else m; null/non-numeric → "").
    * Ref: slack_bot/slack_notifier.py:94-105. Exact `%.3g` parity lives
    * in [[RefUdfs.formatDistanceUdf]]; this Column variant uses the same
    * branch structure with format_string. */
  def formatDistance(metres: Column): Column = {
    val m = metres.try_cast("double")
    when(m.isNull, lit(""))
      .when(m >= 1000, format_string("%.3g km", m / 1000))
      .otherwise(format_string("%.3g m", m))
  }

  /** F10/F11: code → display-name lookup with default.
    * Ref: slack_bot/slack_notifier.py:81-92 + config.json:7-15.
    * Literal map + element_at keeps it codegen'd (no join, no UDF). */
  def codeLookup(c: Column, mapping: Map[String, String], default: String): Column = {
    val m = typedlit(mapping)
    coalesce(element_at(m, c), lit(default))
  }

  /** F12: Slack message template concat with optional suffix parts.
    * Ref: slack_bot/slack_notifier.py:125-149. */
  def activityMessage(emoji: Column, employeeId: Column, sportName: Column,
      distanceText: Column, durationText: Column, comment: Column): Column = {
    val base = concat(
      emoji, lit(" Bravo "), employeeId.cast("string"),
      lit(" ! Tu viens de faire une session de "), sportName,
      when(distanceText.isNotNull && distanceText =!= "",
        concat(lit(" sur "), distanceText)).otherwise(lit("")),
      lit(" en "), durationText, lit(" !"))
    when(comment.isNotNull && comment =!= "",
      concat(base, lit(" Avec le commentaire : "), comment)).otherwise(base)
  }

  /** F13: normalize for category compare. Ref: gold/2test1.py:19-27. */
  def normalized(c: Column): Column = lower(trim(c))

  /** F14: Prime_Sportive flag — active-transport commute modes (accent
    * variants listed explicitly, as the reference does).
    * Ref: gold/2test1.py:17-27. */
  val sportyModes: Seq[String] = Seq(
    "marche/running", "vélo/trottinette/autres", "velo/trottinette/autres")
  def primeSportive(mode: Column): Column =
    normalized(mode).isin(sportyModes: _*)

  /** F15: Commute_long flag — walking > 15 km, bike > 25 km, else false;
    * null distance → false. Ref: gold/2test1.py:29-47. */
  def commuteLong(mode: Column, distKm: Column): Column = {
    val dist = coalesce(distKm.try_cast("double"), lit(0.0))
    val m = normalized(mode)
    when(m === "marche/running", dist > 15)
      .when(m.isin("vélo/trottinette/autres", "velo/trottinette/autres"), dist > 25)
      .otherwise(lit(false))
  }

  /** F16: dense sequential 1..N id (generator only — global sort).
    * Ref: strava_like_data.ipynb `df.insert(0,'ID', range(1,len+1))`. */
  def sequentialId(orderCols: Column*): Column =
    row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(orderCols: _*))

  /** F17: timestamp + n seconds. Ref: strava_like_data.ipynb. */
  def addSeconds(ts: Column, secs: Column): Column =
    ts + make_dt_interval(lit(0), lit(0), lit(0), secs.cast("double"))
  def addDays(ts: Column, days: Column): Column =
    ts + make_dt_interval(days.cast("int"), lit(0), lit(0), lit(0.0))

  /** F18: percentage with rounding. Ref: gold/2test1.py:182-194. */
  def pct(part: Column, total: Column, decimals: Int = 1): Column =
    round(part * 100.0 / total, decimals)
}

/** Reference-exact UDF fallbacks for the two formatting functions whose
  * exact output (`%.3g`, French pluralization) is string-golden in the
  * reference's Slack messages. Registered for SQL via [[register]]. */
object RefUdfs {
  import org.apache.spark.sql.SparkSession

  /** Exact port of slack_bot/slack_notifier.py:94-105 semantics:
    * Python `f"{v:.3g}"` formatting (strips trailing zeros, switches to
    * scientific outside 1e-4..1e6 — C-style %g, which Java's Formatter
    * does NOT match, hence the hand-rolled shortest-form). */
  private[graft] def py3g(v: Double): String = {
    if (v == 0.0) "0"
    else {
      val r = new java.math.BigDecimal(v).round(new java.math.MathContext(3))
      val exp = r.precision - r.scale - 1
      if (exp < -4 || exp >= 3) {
        val mant = r.movePointLeft(exp).stripTrailingZeros.toPlainString
        val sign = if (exp < 0) "-" else "+"
        f"${mant}e$sign${math.abs(exp)}%02d"
      } else r.stripTrailingZeros.toPlainString
    }
  }

  def formatDistance(metres: Option[Double]): String = metres match {
    case None => ""
    case Some(m) if m >= 1000 => s"${py3g(m / 1000)} km"
    case Some(m) => s"${py3g(m)} m"
  }

  /** Exact port of slack_bot/slack_notifier.py:65-79. */
  def frenchDuration(totalSeconds: Long): String = {
    val d = totalSeconds / 86400
    val h = (totalSeconds % 86400) / 3600
    val m = (totalSeconds % 3600) / 60
    val parts = Seq(
      if (d > 0) Some(s"$d jour" + (if (d > 1) "s" else "")) else None,
      if (h > 0) Some(s"$h heure" + (if (h > 1) "s" else "")) else None,
      if (m > 0) Some(s"$m minute" + (if (m > 1) "s" else "")) else None
    ).flatten
    if (parts.isEmpty) "quelques secondes" else parts.mkString(" et ")
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("format_distance_fr",
      (m: java.lang.Double) => formatDistance(Option(m).map(_.doubleValue)))
    spark.udf.register("duration_fr", (s: java.lang.Long) =>
      frenchDuration(Option(s).map(_.longValue).getOrElse(0L)))
  }
}
