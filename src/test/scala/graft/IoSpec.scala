package graft

import java.nio.file.{Files, Paths}

import graft.io.{CsvSources, ManagedParquetTable, XlsxSource}
import graft.etl.Schemas
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

/** io/ surface: CSV dialect sniffing, managed parquet table lifecycle
  * (append/overwrite/health/repair/delete), XLSX contract. */
class IoSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("S14: dialect sniffing picks semicolon and comma correctly") {
    val d = tmp("csv")
    Files.writeString(Paths.get(s"$d/semi.csv"),
      "ID salarié;Nom;Prénom\n1;Colin;Audrey\n2;Dupont;Jean\n")
    val semi = CsvSources.readSniffed(spark, s"$d/semi.csv")
    assert(semi.columns.toSeq == Seq("ID salarié", "Nom", "Prénom"))
    assert(semi.count() == 2)

    Files.writeString(Paths.get(s"$d/comma.csv"), "a,b\n1,2\n")
    assert(CsvSources.readSniffed(spark, s"$d/comma.csv").columns.length == 2)
  }

  test("S15: TSV with empty-string nulls") {
    val d = tmp("tsv")
    Files.writeString(Paths.get(s"$d/t.tsv"), "a\tb\n1\t\n2\tx\n")
    val got = CsvSources.readTsv(spark, s"$d/t.tsv")
    assert(got.filter(col("b").isNull).count() == 1)
  }

  test("managed parquet table: append, overwrite, health, delete-where") {
    val t = new ManagedParquetTable(spark, tmp("mpt") + "/tbl")
    assert(!t.exists && !t.isHealthy)
    t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    t.append(Seq((3, "c")).toDF("id", "v"))
    assert(t.isHealthy && t.read().count() == 3)
    // W1 shape: delete last entries by key
    t.deleteWhere(col("id") >= 3)
    assert(t.read().count() == 2)
    t.overwrite(Seq((9, "z")).toDF("id", "v"))
    assert(t.read().count() == 1)
  }

  test("S16: XLSX contract binds preconverted fixtures with the HR schema") {
    val d = tmp("xlsx")
    Files.writeString(Paths.get(s"$d/rh.csv"),
      "ID salarié,Nom,Prénom,Adresse du domicile,Moyen de déplacement," +
        "Date de naissance,Date d'embauche,Salaire brut," +
        "Nombre de jours de CP,BU,Type de contrat\n" +
        "1,Colin,Audrey,12 rue X,Marche/running,1990-01-01,2020-01-01," +
        "42000.0,27,Tech,CDI\n")
    val hr = XlsxSource.readConverted(spark, s"$d/rh.csv", Schemas.hr)
    assert(hr.count() == 1)
    assert(hr.select(col("`Salaire brut`")).head.getDouble(0) == 42000.0)
  }

  test("S16: readXlsx decodes a real .xlsx (zip+XML) without POI") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val f = Files.createTempFile("graft_hr", ".xlsx").toFile
    val z = new ZipOutputStream(new java.io.FileOutputStream(f))
    def part(name: String, xml: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(xml.getBytes("UTF-8")); z.closeEntry()
    }
    part("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
        |</Types>""".stripMargin)
    part("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="RH" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="5" uniqueCount="5">
        |<si><t>ID salarié</t></si><si><t>Nom</t></si><si><t>Salaire brut</t></si>
        |<si><r><t>Du</t></r><r><t>pont</t></r></si><si><t>Durand</t></si></sst>""".stripMargin)
    // row 2: dense; row 3: sparse (no Nom) + inline string salary comment
    part("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2"><v>7</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>42000.5</v></c></row>
        |<row r="3"><c r="A3"><v>8</v></c><c r="C3"><v>39000</v></c></row>
        |<row r="4"><c r="A4"><v>9</v></c><c r="B4" t="inlineStr"><is><t>Durand</t></is></c><c r="C4"><v>31000</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()

    val df = XlsxSource.readXlsx(spark, f.getAbsolutePath)
    assert(df.columns.toSeq == Seq("ID salarié", "Nom", "Salaire brut"))
    val rows = df.orderBy(col("`ID salarié`")).collect()
    assert(rows.length == 3)
    assert(rows(0).getString(1) == "Dupont") // rich-text runs concatenated
    assert(rows(1).getString(1) == null)     // sparse cell
    assert(rows(2).getString(1) == "Durand") // inline string
    // typed read through the schema-cast overload
    val typed = XlsxSource.readXlsx(spark, f.getAbsolutePath,
      StructType(Seq(StructField("ID salarié", IntegerType),
        StructField("Salaire brut", DoubleType))))
    assert(typed.agg(sum(col("`Salaire brut`"))).head.getDouble(0) == 112000.5)
    f.delete()
  }

  test("S17/S18: JDBC read + append + partitioned read, end-to-end (Derby)") {
    import graft.io.Jdbc
    import java.sql.DriverManager
    val url = "jdbc:derby:memory:graft_io;create=true"
    val props = Map.empty[String, String] // derby autoloads via ServiceLoader
    // warehouse side: schema owned by the database (Spark's default
    // dialect maps string to TEXT, which Derby rejects — creating the
    // table first is also the realistic production pattern)
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE activity (id INT NOT NULL, emp VARCHAR(32), km DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO activity VALUES (?, ?, ?)")
      (1 to 50).foreach { i =>
        ins.setInt(1, i); ins.setString(2, s"emp_${i % 7}")
        ins.setDouble(3, i * 1.5); ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()

    // S17 single read
    val df = Jdbc.read(spark, url, "activity", props)
    assert(df.count() == 50)
    assert(df.agg(sum(col("km"))).head.getDouble(0) == (1 to 50).map(_ * 1.5).sum)

    // S18 sink: append 10 more rows through Spark, verify on the DB side
    import spark.implicits._
    val extra = (51 to 60).map(i => (i, s"emp_x", i * 1.5))
      .toDF("id", "emp", "km")
    Jdbc.append(extra, url, "activity", props = props)
    val c2 = DriverManager.getConnection(url)
    try {
      val rs = c2.createStatement()
        .executeQuery("SELECT COUNT(*) FROM activity")
      rs.next()
      assert(rs.getInt(1) == 60)
    } finally c2.close()

    // S17 scale path: range-partitioned parallel read — same rows,
    // actually split into the requested partitions
    val part = Jdbc.readPartitioned(spark, url, "activity",
      partitionColumn = "id", lowerBound = 1, upperBound = 60,
      numPartitions = 3, props = props)
    assert(part.rdd.getNumPartitions == 3)
    assert(part.count() == 60)
    assert(part.select(sum(col("id"))).head.getLong(0) == (1 to 60).sum)
  }
}
