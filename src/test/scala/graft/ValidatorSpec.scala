package graft

import java.sql.Timestamp
import java.time.Instant

import graft.etl.{ActivityValidator, Models}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Mirror of the reference's pytest suite (test_sport_benefits.py:7-59)
  * with the same 5-row planted-defect fixture. The reference's
  * test_validate_sport_distances is known-failing (expects {5} but the
  * implementation yields {2,5}: ID 2's −500 m run violates the range
  * rule too — process_activities.ipynb output); parity means matching
  * the implementation, so we assert the corrected {2,5}. */
class ValidatorSpec extends SparkSpec {
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private def ts(offsetDays: Int, offsetMin: Int = 0): Timestamp =
    Timestamp.from(Instant.now.plusSeconds(offsetDays * 86400L + offsetMin * 60L))

  private val schema = StructType(Seq(
    StructField("ID", IntegerType), StructField("ID_salarie", IntegerType),
    StructField("Date_de_debut", TimestampType),
    StructField("Sport_type", StringType),
    StructField("Distance_m", IntegerType),
    StructField("Date_de_fin", TimestampType)))

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)

  test("planted-defect fixture: exact offending-ID sets per rule") {
    val fixture = df(Seq(
      Row(1, 101, ts(-1), "Vélo", Integer.valueOf(10000), ts(-1, 60)),
      Row(2, 101, ts(1), "Course à pied", Integer.valueOf(-500), ts(1, 60)),
      Row(3, 102, ts(-2), "Escalade", null, ts(-2, 120)),
      Row(4, 103, ts(-3), "Marche", Integer.valueOf(5000), ts(-3, 60)),
      Row(5, 104, ts(-4), "Natation", Integer.valueOf(300), ts(-4, 30))))
    val r = ActivityValidator.validate(fixture)
    assert(r.futureDates == Seq(2))
    assert(r.negativeDistances == Seq(2))
    // corrected expectation (reference's known-failing assertion): {2, 5}
    assert(r.invalidSportDistances == Seq(2, 5))
  }

  test("clean fixture: empty report (test_valid_activities parity)") {
    val clean = df(Seq(
      Row(1, 101, ts(-1), "Vélo", Integer.valueOf(15000), ts(-1, 120))))
    assert(ActivityValidator.validate(clean) ==
      Models.ValidationReport(Nil, Nil, Nil))
  }

  test("null distance on a distance sport is negative (fillna(-1) rule)") {
    val fixture = df(Seq(
      Row(1, 101, ts(-1), "Vélo", null, ts(-1, 60)),
      Row(2, 101, ts(-1), "Yoga", null, ts(-1, 60))))
    val r = ActivityValidator.validate(fixture)
    assert(r.negativeDistances == Seq(1)) // Yoga has no distance rule
    assert(r.invalidSportDistances.isEmpty) // NaN<x is False in pandas
  }

  test("referential integrity report (find_unique_employee parity)") {
    val acts = df(Seq(
      Row(1, 101, ts(-1), "Vélo", Integer.valueOf(10000), ts(-1, 60)),
      Row(2, 999, ts(-1), "Vélo", Integer.valueOf(10000), ts(-1, 60))))
    val hr = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Integer.valueOf(101)))),
      StructType(Seq(StructField("ID salarié", IntegerType))))
    val rep = ActivityValidator.referentialIntegrity(acts, hr).collect()(0)
    assert(rep.getLong(0) == 1L) // one orphan employee (999)
    assert(rep.getLong(1) == 1L)
    assert(rep.getDouble(2) == 50.0)
  }
}
