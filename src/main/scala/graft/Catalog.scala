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
      queries.DedupGates.all ++
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
    *     instant matches DuckDB's naive-as-UTC reading (epoch_ms etc.).
    *
    * Both branches end in the same canonical `.select`: the raw column
    * order with the normalized `ts` in its original slot and `ts_ns`
    * appended — a `select *` downstream is encoding-independent. An
    * int64 `ts` is only trusted as nanoseconds when the parquet footer's
    * logical type annotation SAYS nanos (a plain BIGINT-µs/ms column
    * would otherwise be silently misread with a ×1000 scale error);
    * any third encoding fails fast instead of degrading to cast. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    // canonical output order: every raw column in place, ts_ns appended
    val canonical = raw.columns.toSeq.map(col) :+ col("ts_ns")
    raw.schema("ts").dataType match {
      case LongType =>
        val unit = tsFooterUnit(s, d)
        require(unit == "NANOS",
          s"events.ts decoded as int64 but the parquet logical type is " +
            s"$unit — refusing to guess the epoch scale")
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
          .select(canonical: _*)
      case TimestampNTZType | TimestampType =>
        val asTs = col("ts").cast(TimestampType)
        raw.withColumn("ts_ns", unix_micros(asTs) * 1000L)
          .withColumn("ts", asTs)
          .select(canonical: _*)
      case other => throw new IllegalStateException(
        s"unsupported events.ts encoding $other — expected " +
          "TIMESTAMP(NANOS) (int64 under nanosAsLong) or µs TIMESTAMP[_NTZ]")
    }
  }

  /** The parquet logical-type unit of `events.ts` straight from one
    * file footer (no data pages read), e.g. "NANOS"/"MICROS", or the
    * raw annotation string for non-timestamp columns. Cached per dir —
    * testdata is immutable for a session. */
  private val tsUnitCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def tsFooterUnit(s: SparkSession, d: String): String =
    tsUnitCache.computeIfAbsent(d, _ => {
      import org.apache.hadoop.fs.{Path => HPath}
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val conf = s.sessionState.newHadoopConf()
      val root = new HPath(s"$d/events.parquet")
      val fs = root.getFileSystem(conf)
      val file =
        if (fs.getFileStatus(root).isDirectory)
          fs.listStatus(root).map(_.getPath)
            .find(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
            .getOrElse(throw new IllegalStateException(s"no parquet part under $root"))
        else root
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try (reader.getFooter.getFileMetaData.getSchema: org.apache.parquet.schema.GroupType)
        .getType("ts").getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit.toString
          case other => String.valueOf(other)
        }
      finally reader.close()
    })
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
