package graft

import graft.etl.{DataGen, GoldEnrich, WellnessMeasures}
import org.apache.spark.sql.functions._

/** Gold-layer pipeline (§3.2) on the seeded generator fixtures:
  * join correctness, incremental watermark semantics, measure math. */
class GoldEnrichSpec extends SparkSpec {

  lazy val acts = DataGen.activities(spark, nEmployees = 20, avgPerEmployee = 8)
  lazy val hr = DataGen.hr(spark, nEmployees = 20)
  lazy val sportive = DataGen.sportive(spark, nEmployees = 20)

  test("generator is deterministic and referentially intact") {
    assert(acts.count() == 160)
    assert(hr.count() == 20)
    // same seed → same data
    val again = DataGen.activities(spark, 20, 8).agg(sum("ID_salarie")).head.getLong(0)
    assert(acts.agg(sum("ID_salarie")).head.getLong(0) == again)
    // all activity employees exist in HR
    val orphans = acts.join(hr.withColumnRenamed("ID salarié", "ID_salarie"),
      Seq("ID_salarie"), "left_anti").count()
    assert(orphans == 0)
  }

  test("full refresh: row preservation, no duplicate columns, dims joined") {
    val gold = GoldEnrich.fullRefresh(acts, sportive, hr)
    assert(gold.count() == acts.count()) // left joins preserve the fact side
    assert(gold.columns.distinct.length == gold.columns.length) // P3 hygiene
    assert(gold.columns.contains("Pratique d'un sport"))
    assert(gold.columns.contains("Salaire brut"))
    val misses = GoldEnrich.joinMissReport(gold).collect()(0)
    assert(misses.getLong(1) == 0 && misses.getLong(2) == 0)
  }

  test("incremental: only rows past the gold watermark are processed") {
    val stamped = acts.withColumn("processing_timestamp",
      when(col("ID") <= 100, lit("2024-01-01 00:00:00").cast("timestamp"))
        .otherwise(lit("2024-06-01 00:00:00").cast("timestamp")))
    val gold = stamped.filter(col("ID") <= 100) // already-processed state
    val inc = GoldEnrich.incremental(stamped, sportive, hr, Some(gold))
    assert(inc.count() == 60) // only the newer 60 rows
    // empty gold → full load
    val full = GoldEnrich.incremental(stamped, sportive, hr, None)
    assert(full.count() == 160)
  }

  test("wellness measures: DAX math on a hand-checked micro-fixture") {
    import spark.implicits._
    val enriched = Seq(
      // employee 1: 6 activities (qualifies), mode sporty
      (1, "Marche/running"), (1, "Marche/running"), (1, "Marche/running"),
      (1, "Marche/running"), (1, "Marche/running"), (1, "Marche/running"),
      // employee 2: 2 activities (no), mode car
      (2, "Voiture/Moto"), (2, "Voiture/Moto"))
      .toDF("ID_salarie", "Moyen de déplacement")
    val commute = Seq((1, 25100.0), (2, 40000.0))
      .toDF("ID salarié", "Salaire brut")
    val q = WellnessMeasures.employeesQualification(enriched, commute)
    val m = WellnessMeasures.measures(q).collect()(0)
    assert(m.getLong(0) == 5L) // one qualifying (employee, mode) row × 5 days
    assert(m.getDouble(1) == 500.0) // 25100 * 5 / 251
    assert(m.getDouble(2) == 1255.0) // 25100 * 0.05 (commute qualifies)
  }

  test("commute report: per-mode flags + workforce pct in one job") {
    import spark.implicits._
    val commute = Seq(
      ("Marche/running", 2.0), ("Marche/running", 12.0),
      ("Voiture/Moto", 30.0), ("Voiture/Moto", 5.0),
      ("Vélo/Trottinette/Autres", 4.0))
      .toDF("Moyen de déplacement", "Distance_km_typical")
    val rep = WellnessMeasures.commuteReport(commute)
      .orderBy(col("Moyen de déplacement")).collect()
    val byMode = rep.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // marche: 2 employees = 40% of 5; both prime-eligible
    assert(byMode("Marche/running")._1 == 2)
    assert(byMode("Marche/running")._3 == 2)
    assert(byMode("Marche/running")._4 == 40.0)
    // car: no prime, 40%
    assert(byMode("Voiture/Moto")._1 == 0)
    assert(byMode("Voiture/Moto")._4 == 40.0)
    assert(byMode("Vélo/Trottinette/Autres")._4 == 20.0)
    // pct column covers the whole workforce
    assert(math.abs(rep.map(_.getDouble(4)).sum - 100.0) < 0.2)
  }
}
