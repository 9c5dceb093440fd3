package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gold-layer enrichment (SURVEY.md §3.2): activities ⟕ sportive ⟕ HR,
  * metadata columns, full-refresh and incremental (high-watermark) modes —
  * gold/bronzeToGold.py and bronzeToGold2.py semantics, Spark-first.
  *
  * Scale design: both dimensions are tiny (≤ a few thousand rows even at
  * 1000× the reference) → explicit broadcast() so the fact table never
  * shuffles; output partitioned by gold_processing_date so downstream
  * reads prune; dropDuplicates-by-key hygiene replaces the reference's
  * duplicate-column cleanup (P3) by never producing duplicates at all
  * (Seq-key joins). */
object GoldEnrich {

  /** Full refresh: overwrite gold with enriched bronze. */
  def fullRefresh(activities: DataFrame, sportive: DataFrame, hr: DataFrame)
      : DataFrame = enrich(activities, sportive, hr)

  /** Incremental: only bronze rows newer than gold's high watermark
    * (A4 + P8; gold/bronzeToGold2.py:38-50,92-114). `gold` may be empty. */
  def incremental(activities: DataFrame, sportive: DataFrame, hr: DataFrame,
      gold: Option[DataFrame], watermarkCol: String = "processing_timestamp")
      : DataFrame = {
    val fresh = gold match {
      case Some(g) if g.columns.contains(watermarkCol) =>
        val wm = g.agg(max(col(watermarkCol))).first()
        if (wm.isNullAt(0)) activities
        else activities.filter(col(watermarkCol) > lit(wm.get(0)))
      case _ => activities
    }
    enrich(fresh, sportive, hr)
  }

  private def enrich(activities: DataFrame, sportive: DataFrame,
      hr: DataFrame): DataFrame = {
    // key-hygiene: align dim keys to the fact key name so Seq-joins
    // produce a single key column (no _delta/_xlsx suffix cleanup needed)
    val sp = sportive.withColumnRenamed("ID salarié", "ID_salarie")
    val h = hr.withColumnRenamed("ID salarié", "ID_salarie")
    activities
      .join(broadcast(sp), Seq("ID_salarie"), "left")
      .join(broadcast(h), Seq("ID_salarie"), "left")
      .withColumn("gold_processing_timestamp", current_timestamp())
      .withColumn("gold_processing_date",
        date_format(current_timestamp(), "yyyy-MM-dd"))
  }

  /** Join-miss diagnostics (A5): null counts for the dim columns after
    * enrichment — gold/bronzeToGold.py:216-223. */
  def joinMissReport(gold: DataFrame): DataFrame =
    gold.agg(
      count(lit(1)).as("rows"),
      count(when(col("`Pratique d'un sport`").isNull, 1))
        .as("missing_sportive"),
      count(when(col("Nom").isNull, 1)).as("missing_hr"))

  /** Write gold partitioned by processing date (partition pruning for
    * incremental consumers). */
  def writeGold(gold: DataFrame, path: String,
      mode: String = "overwrite"): Unit =
    gold.write.mode(mode).partitionBy("gold_processing_date").parquet(path)

  /** CSV mirror sink (S13) — single file, headered. */
  def writeCsvMirror(gold: DataFrame, path: String): Unit =
    gold.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)
}

/** Activity validation (SURVEY.md §3.3, A13) — sport_benefits.py:21-60
  * with the corrected expectation for the reference's known-failing test
  * (IDs violating BOTH the negative and the range rule appear in both
  * lists — process_activities.ipynb output). One distributed pass
  * computes all three flags; only violating IDs are collected. */
object ActivityValidator {

  def validate(activities: DataFrame)(implicit spark: SparkSession)
      : Models.ValidationReport = {
    import Schemas._
    // sport_benefits.py:45 — fillna(-1) < 0: a NULL distance on a
    // distance sport counts as negative
    val dist = coalesce(col("Distance_m").cast("double"), lit(-1.0))
    val flagged = activities.select(
      col("ID"),
      (col("Date_de_debut") > current_timestamp()).as("f_future"),
      (col("Sport_type").isin(distanceSports: _*) && dist < 0).as("f_neg"),
      // sport_benefits.py:50-58 — pandas NaN comparisons are False, so
      // NULL distances are NOT range violations (isNotNull guard)
      sportDistanceRanges.foldLeft(lit(false)) { case (acc, (s, (lo, hi))) =>
        acc || (col("Sport_type") === s && col("Distance_m").isNotNull &&
          (col("Distance_m") < lo || col("Distance_m") > hi))
      }.as("f_range"))
      .filter(col("f_future") || col("f_neg") || col("f_range"))
    val r = flagged.agg(
      sort_array(collect_list(when(col("f_future"), col("ID")))).as("fut"),
      sort_array(collect_list(when(col("f_neg"), col("ID")))).as("neg"),
      sort_array(collect_list(when(col("f_range"), col("ID")))).as("rng"))
      .first()
    Models.ValidationReport(
      r.getSeq[Int](0), r.getSeq[Int](1), r.getSeq[Int](2))
  }

  /** Referential-integrity check (P9/P10 as a report):
    * activity employee ids ⊄ HR ids → violating ids + percentage. */
  def referentialIntegrity(activities: DataFrame, hr: DataFrame)
      : DataFrame = {
    val hrIds = hr.select(col("ID salarié").as("employee_id"))
    val total = activities.count().max(1L)
    val orphans = activities
      .select(col("ID_salarie").as("employee_id"))
      .join(hrIds, Seq("employee_id"), "left_anti")
    orphans.agg(
      countDistinct(col("employee_id")).as("orphan_employees"),
      count(lit(1)).as("orphan_activities"),
      round(count(lit(1)) * 100.0 / total, 2).as("orphan_pct"))
  }
}
