package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver's correctness gate.
  *
  * @param name   stable query id (key in SparkEntry.queries)
  * @param run    Spark-side implementation; `dir` is a testdata sf dir
  *               containing one parquet file per table (TESTDATA.md)
  * @param oracle equivalent ANSI SQL for DuckDB over the same tables;
  *               None for ops not expressible in SQL (driver then does a
  *               weaker rows-only check)
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Central registry of every gate query. Each module contributes a Seq. */
object Catalog {
  lazy val all: Seq[GQuery] =
    queries.Relational.all ++
      queries.TpcH.all ++
      queries.Scalars.all ++
      queries.Analytics.all ++
      queries.Advanced.all ++
      queries.Text.all ++
      queries.Dedup.all ++
      queries.Similarity.all ++
      queries.EtlShape.all

  lazy val byName: Map[String, GQuery] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in Catalog")
    m
  }
}

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** The `events.parquet` timestamp column has shipped in two physical
    * encodings across testdata generations: TIMESTAMP(NANOS) (which
    * Spark's vectorized reader only accepts as raw int64 via the
    * nanosAsLong legacy conf) and plain µs TIMESTAMP_NTZ. Normalize both
    * to the SAME logical schema so every downstream query/oracle pair is
    * encoding-independent:
    *   - `ts_ns`: epoch nanoseconds as BIGINT — exact ordering/compare
    *     parity with DuckDB's ns precision (µs data is ×1000, lossless);
    *   - `ts`: proper µs timestamp (F1 semantics — SURVEY.md §2.4). NTZ
    *     is cast under the engine-wide UTC session timezone, so the
    *     instant matches DuckDB's naive-as-UTC reading (epoch_ms etc.). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        val asTs = col("ts").cast(TimestampType)
        raw.withColumn("ts_ns", unix_micros(asTs) * 1000L)
          .withColumn("ts", asTs)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
