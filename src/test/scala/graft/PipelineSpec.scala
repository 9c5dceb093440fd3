package graft

import java.nio.file.{Files, Paths}

import graft.etl._
import graft.streaming.BronzeIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The reference's full pipeline (SURVEY.md §3) end-to-end on generated
  * data: seeded generator → Debezium-envelope JSON files → streaming
  * bronze ingest → incremental gold enrichment → validation → wellness
  * measures → CSV dump. One test, every layer. */
class PipelineSpec extends SparkSpec {
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  test("generator → CDC stream → bronze → gold → measures, end to end") {
    val root = Files.createTempDirectory("graft_e2e").toString
    val n = 30

    // 1. source data (S20) rendered as Debezium envelopes (one JSON file
    //    = one CDC batch)
    val acts = DataGen.activities(spark, nEmployees = n, avgPerEmployee = 7)
    val envelopes = acts.select(to_json(struct(struct(
      lit("c").as("op"),
      struct(
        col("ID"), col("ID_salarie"),
        unix_micros(col("Date_de_debut")).as("Date_de_debut"),
        col("Sport_type"), col("Distance_m"),
        unix_micros(col("Date_de_fin")).as("Date_de_fin"),
        col("Commentaire")).as("after"),
      lit(1724069978000L).as("ts_ms")).as("payload"))).as("v"))
      .collect().map(_.getString(0))
    new java.io.File(s"$root/cdc").mkdirs()
    envelopes.grouped(50).zipWithIndex.foreach { case (batch, i) =>
      Files.write(Paths.get(s"$root/cdc/batch_$i.json"),
        batch.mkString("\n").getBytes)
    }

    // 2. bronze ingest (§3.1): stream → decode → parquet
    val q = BronzeIngest.start(
      BronzeIngest.fileSource(spark, s"$root/cdc"),
      s"$root/bronze", s"$root/ckpt", trigger = Trigger.AvailableNow())
    q.awaitTermination(180000)
    val bronze = spark.read.parquet(s"$root/bronze")
    assert(bronze.count() == n * 7)

    // 3. gold enrichment (§3.2), incremental from empty gold
    val hr = DataGen.hr(spark, n)
    val sportive = DataGen.sportive(spark, n)
    val gold = GoldEnrich.incremental(bronze, sportive, hr, gold = None)
    assert(gold.count() == n * 7)
    assert(GoldEnrich.joinMissReport(gold).head.getLong(2) == 0)

    // round-trip µs timestamps survived json+stream+parquet exactly
    val src = acts.agg(sum(unix_micros(col("Date_de_debut")))).head.getLong(0)
    val got = bronze.agg(sum(unix_micros(col("Date_de_debut")))).head.getLong(0)
    assert(src == got)

    // 4. validation (§3.3) on the generated corpus
    val report = ActivityValidator.validate(bronze)
    assert(report.futureDates.isEmpty) // generator emits past dates only

    // 5. measures (§2.5 A9-A12) compute and are internally consistent
    val qual = WellnessMeasures.employeesQualification(
      gold, hr.withColumnRenamed("Salaire brut", "Salaire brut"))
    val m = WellnessMeasures.measures(qual).head
    val qualifying = qual.filter(col("QualifySport")).count()
    assert(m.getLong(0) == 5 * qualifying)

    // 6. gold sinks (S6/S13): partitioned parquet + CSV mirror
    GoldEnrich.writeGold(gold, s"$root/gold")
    GoldEnrich.writeCsvMirror(gold.drop("gold_processing_timestamp",
      "Date_de_debut", "Date_de_fin"), s"$root/gold_csv")
    assert(spark.read.parquet(s"$root/gold").count() == n * 7)
    assert(spark.read.option("header", "true").csv(s"$root/gold_csv")
      .count() == n * 7)

    // 7. Slack formatting (§3 honorable-mention entry point): messages
    //    built for every row; replay tail bounded (ST6)
    val msgs = SlackFormatter.messages(
      bronze.withColumn("Sport_type", lit("V")))
    val (skipped, tail) = SlackFormatter.replayTail(msgs, k = 5)
    assert(tail.size == 5 && skipped == n * 7 - 5)
    assert(tail.forall(_.startsWith("🚴 Bravo ")))
  }
}
