package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The Power BI semantic layer (FormulaePowerBI.txt:1-47) as DataFrame
  * queries — SURVEY.md §2.5 A9-A12. All DAX iterators decorrelate to
  * grouped aggregations + broadcast joins; no per-row driver logic. */
object WellnessMeasures {

  /** A9: SUMMARIZE — per (employee, transport mode) activity counts. */
  def employeesQualification(enriched: DataFrame, commute: DataFrame)
      : DataFrame = {
    val counts = enriched
      .groupBy(col("ID_salarie"), col("`Moyen de déplacement`"))
      .agg(count(lit(1)).as("TotalLineCount"))
    // A10: per-employee salary via the commute table (CALCULATE SUM)
    val salary = commute
      .groupBy(col("`ID salarié`").as("ID_salarie"))
      .agg(sum(col("`Salaire brut`")).as("Salary"))
    counts
      .join(broadcast(salary), Seq("ID_salarie"), "left")
      // A11: qualification flags
      .withColumn("QualifySport", col("TotalLineCount") > 5)
      .withColumn("QualifyCommute",
        lower(trim(col("`Moyen de déplacement`")))
          .isin("marche/running", "vélo/trottinette/autres",
            "velo/trottinette/autres"))
  }

  /** A12: the three SUMX measures over the qualification table. */
  def measures(qualification: DataFrame): DataFrame =
    qualification.agg(
      sum(when(col("QualifySport"), lit(5)).otherwise(0))
        .as("TotalJourneesBienEtre"),
      round(sum(when(col("QualifySport"), col("Salary") * 5.0 / 251.0)
        .otherwise(0.0)), 2).as("TotalEquivalentSalaire"),
      round(sum(when(col("QualifyCommute"), col("Salary") * 0.05)
        .otherwise(0.0)), 2).as("TotalPrimeSportive"))

  /** Commute analytics flags + grouped report (gold/2test1.py:151-200):
    * Prime_Sportive / Commute_long per employee, then per-mode stats. */
  def commuteReport(commute: DataFrame): DataFrame = {
    import graft.functions.ScalarFunctions._
    val flagged = commute
      .withColumn("Prime_Sportive", primeSportive(col("`Moyen de déplacement`")))
      .withColumn("Commute_long",
        commuteLong(col("`Moyen de déplacement`"), col("Distance_km_typical")))
    // workforce total folded in via a broadcast cross join of the 1-row
    // agg over the (tiny) grouped result — one pass over the input, no
    // separate count() job recomputing the flag pipeline, and no
    // single-partition global WindowExec
    val grouped = flagged
      .groupBy(col("`Moyen de déplacement`"))
      .agg(
        sum(col("Prime_Sportive").cast("int")).as("n_prime"),
        sum(col("Commute_long").cast("int")).as("n_long"),
        count(lit(1)).as("n_employees"))
    val total = grouped.agg(sum(col("n_employees")).as("total_n"))
    grouped.crossJoin(broadcast(total))
      .withColumn("pct_of_workforce",
        round(col("n_employees") * 100.0 / greatest(col("total_n"), lit(1L)), 1))
      .drop("total_n")
  }
}

/** Slack notification formatting (SURVEY.md §2.4 F8-F12 + §2.7 ST6) —
  * pure message building behind a pluggable sink so tests capture
  * messages and production would post them. */
object SlackFormatter {
  import graft.functions.ScalarFunctions._

  val sportNames: Map[String, String] = Map(
    "V" -> "vélo", "C" -> "course à pied", "N" -> "natation", "M" -> "marche")
  val sportEmojis: Map[String, String] = Map(
    "V" -> "🚴", "C" -> "🏃", "N" -> "🏊", "M" -> "🚶")

  /** Build the per-activity message column (insert-only rows assumed
    * pre-filtered by the caller — P11). Distance uses the
    * reference-exact python-%.3g UDF: Java's format_string("%.3g")
    * keeps trailing zeros ("1.50 km" vs the reference's "1.5 km"). */
  def messages(activities: DataFrame): DataFrame = {
    val pyFmt = org.apache.spark.sql.functions.udf(
      (m: java.lang.Double) =>
        graft.functions.RefUdfs.formatDistance(Option(m).map(_.doubleValue)))
    val dur = elapsedSeconds(col("Date_de_debut"), col("Date_de_fin"))
    activities.withColumn("slack_message",
      activityMessage(
        codeLookup(col("Sport_type"), sportEmojis, "🏃"),
        col("ID_salarie"),
        codeLookup(col("Sport_type"), sportNames, "activité sportive"),
        when(col("Distance_m") > 0, pyFmt(col("Distance_m").cast("double"))),
        frenchDuration(dur),
        col("Commentaire")))
  }

  /** ST6 startup replay: banner + last K messages by id, with skipped
    * count — slack_bot/slack_notifier.py:206-244. Driver-bounded: only
    * the K tail rows are collected. */
  def replayTail(messages: DataFrame, k: Int = 5)
      (implicit spark: SparkSession): (Long, Seq[String]) = {
    val total = messages.count()
    val tail = messages.orderBy(col("ID").desc).limit(k)
      .select(col("slack_message")).collect().map(_.getString(0)).reverse.toSeq
    (math.max(0L, total - k), tail)
  }

  /** Side-effect boundary (S19): console implementation for tests;
    * a real Slack client would implement the same trait. */
  trait MessageSink extends Serializable { def post(message: String): Unit }
  final class CollectingSink extends MessageSink {
    val posted = scala.collection.mutable.ArrayBuffer.empty[String]
    def post(message: String): Unit = posted += message
  }

  /** Streaming side-effect sink (S19 proper): one sink instance per
    * partition per epoch, messages posted as rows arrive —
    * `messages(df).writeStream.foreach(new SlackForeachWriter(mk))`.
    * The factory runs on executors, so the client is constructed where
    * it is used (never serialized live connections). */
  final class SlackForeachWriter(mkSink: () => MessageSink)
      extends org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
    @transient private var sink: MessageSink = _
    override def open(partitionId: Long, epochId: Long): Boolean = {
      sink = mkSink(); true
    }
    override def process(row: org.apache.spark.sql.Row): Unit =
      sink.post(row.getAs[String]("slack_message"))
    override def close(errorOrNull: Throwable): Unit = ()
  }
}
