package graft

import graft.functions.{RefUdfs, ScalarFunctions => F}
import org.apache.spark.sql.functions._

/** §2.4 scalar functions — reference-exact golden outputs.
  * Expected strings come from executing the reference's own Python
  * helpers (slack_bot/slack_notifier.py:65-105) semantics by hand. */
class ScalarFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("F7: secondsToHms zero-pads") {
    val got = Seq(0L, 59L, 3661L, 86399L).toDF("s")
      .select(F.secondsToHms(col("s"))).as[String].collect()
    assert(got.sameElements(Array("00:00:00", "00:00:59", "01:01:01", "23:59:59")))
  }

  test("F8: French duration pluralization and fallback") {
    val cases = Seq(
      30L -> "quelques secondes",
      60L -> "1 minute",
      120L -> "2 minutes",
      3600L -> "1 heure",
      3660L -> "1 heure et 1 minute",
      90000L -> "1 jour et 1 heure",
      266460L -> "3 jours et 2 heures et 1 minute")
    val got = cases.map(_._1).toDF("s")
      .select(F.frenchDuration(col("s"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
    // UDF variant agrees
    cases.foreach { case (s, want) => assert(RefUdfs.frenchDuration(s) == want) }
  }

  test("F9: python-%.3g distance formatting (UDF golden)") {
    // golden values = python f"{v:.3g}" semantics
    assert(RefUdfs.formatDistance(Some(500.0)) == "500 m")
    assert(RefUdfs.formatDistance(Some(1500.0)) == "1.5 km")
    assert(RefUdfs.formatDistance(Some(12345.0)) == "12.3 km")
    assert(RefUdfs.formatDistance(Some(999.0)) == "999 m")
    assert(RefUdfs.formatDistance(None) == "")
  }

  test("F10: code lookup with default") {
    val got = Seq("V", "C", "X").toDF("c")
      .select(F.codeLookup(col("c"),
        Map("V" -> "vélo", "C" -> "course à pied"), "activité sportive"))
      .as[String].collect()
    assert(got.sameElements(Array("vélo", "course à pied", "activité sportive")))
  }

  test("F14/F15: commute flags incl. accent variants and null distance") {
    val df = Seq(
      ("Marche/running", Some(20.0)),
      ("Vélo/Trottinette/Autres", Some(30.0)),
      ("velo/trottinette/autres", Some(10.0)),
      ("Voiture/Moto", Some(99.0)),
      ("Marche/running", None)).toDF("mode", "dist")
    val got = df.select(
      F.primeSportive(col("mode")),
      F.commuteLong(col("mode"), col("dist"))).as[(Boolean, Boolean)].collect()
    assert(got.toSeq == Seq(
      (true, true), (true, true), (true, false), (false, false), (true, false)))
  }

  test("F2/F3: coercing casts null on bad input (ANSI-safe)") {
    val got = Seq("2024-01-01 00:00:00", "garbage").toDF("s")
      .select(F.toTimestampCoerce(col("s")).isNull,
        F.toNumericCoerce(lit("12.5")), F.toNumericCoerce(col("s")).isNull)
      .collect()
    assert(!got(0).getBoolean(0) && got(1).getBoolean(0))
    assert(got(0).getDouble(1) == 12.5)
  }

  test("F1: µs-epoch keeps microseconds (divergence from consume_data2)") {
    val us = 1724069978076346L // 2024-08-19T12:19:38.076346Z
    val got = Seq(us).toDF("us")
      .select(F.microsToTimestamp(col("us")).cast("string")).as[String].head()
    assert(got == "2024-08-19 12:19:38.076346")
  }
}
