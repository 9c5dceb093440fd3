package graft

import java.nio.file.{Files, Paths}

import graft.io.{CsvSources, ManagedParquetTable, XlsxSource}
import graft.etl.Schemas
import org.apache.spark.sql.functions._

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
    intercept[UnsupportedOperationException] {
      XlsxSource.readXlsx(spark, "whatever.xlsx")
    }
  }
}
