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
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects. Read nanos as long (legacy conf), keep the
    * exact value as `ts_ns` for ordering/compare parity with DuckDB's ns
    * precision, and expose `ts` as a µs-truncated proper timestamp
    * (F1 semantics: epoch → timestamp, µs-preserving — SURVEY.md §2.4). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts_ns div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
