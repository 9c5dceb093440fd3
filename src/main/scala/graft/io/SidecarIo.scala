package graft.io

import java.nio.file.{Files, Path}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport, GroupWriteSupport}
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetReader}
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

/** Driver-direct parquet IO for the table-metadata SIDECARS (file-stats
  * rows, dv tombstone sets). These artifacts are planning state — tiny
  * by contract (O(files × cols) stats rows; size-gated dv sets) — and
  * routing them through a Spark job costs a full plan/codegen/schedule
  * round-trip (~100–300 ms each) that dominates commit latency on every
  * managed-table write. Guide §1.2: fix the per-task work only after
  * the job shape is right — here the right shape is NO job at all.
  * Writes produce a single standard parquet file that `spark.read
  * .parquet` (and the distributed pruning scans) read unchanged. */
object SidecarIo {

  private val statsSchema: MessageType = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  required binary file (UTF8);
      |  required int64 rows;
      |  required binary col (UTF8);
      |  required binary kind (UTF8);
      |  optional int64 minL;
      |  optional int64 maxL;
      |  optional double minD;
      |  optional double maxD;
      |  optional binary minS (UTF8);
      |  optional binary maxS (UTF8);
      |  optional int64 nulls;
      |}""".stripMargin)

  /** Write one segment's ColStats rows as `<dir>/part-00000.parquet`
    * without a Spark job. Replaces any existing dir content (the
    * overwrite semantics the Spark write had). */
  def writeStats(dir: Path, stats: Seq[FileStats.ColStats]): Unit = {
    if (Files.isDirectory(dir)) {
      val s = Files.list(dir)
      try s.forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }
    Files.createDirectories(dir)
    writeStatsFile(dir.resolve("part-00000.parquet"), stats)
  }

  /** Append-mode sibling of [[writeStats]]: add one fresh uniquely
    * named parquet part to `dir` (keeping whatever is there — the
    * incremental postings-stats contract), again without a Spark job. */
  def appendStats(dir: Path, stats: Seq[FileStats.ColStats]): Unit = {
    Files.createDirectories(dir)
    writeStatsFile(dir.resolve(s"part-${System.nanoTime()}.parquet"), stats)
  }

  private def writeStatsFile(dest: Path,
      stats: Seq[FileStats.ColStats]): Unit = {
    val conf = new Configuration(false)
    GroupWriteSupport.setSchema(statsSchema, conf)
    val factory = new SimpleGroupFactory(statsSchema)
    val w = ExampleParquetWriter
      .builder(new HadoopPath(dest.toString))
      .withConf(conf)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    try stats.foreach { s =>
      val g = factory.newGroup()
      g.append("file", s.file)
      g.append("rows", s.rows)
      g.append("col", s.col)
      g.append("kind", s.kind)
      s.minL.foreach(v => g.append("minL", v))
      s.maxL.foreach(v => g.append("maxL", v))
      s.minD.foreach(v => g.append("minD", v))
      s.maxD.foreach(v => g.append("maxD", v))
      s.minS.foreach(v => g.append("minS", v))
      s.maxS.foreach(v => g.append("maxS", v))
      s.nulls.foreach(v => g.append("nulls", v))
      w.write(g)
    } finally w.close()
  }

  /** Total bytes of the .parquet files directly under `dirs` — the
    * size gate for the driver-local dv read. */
  def parquetBytes(dirs: Seq[Path]): Long =
    dirs.map { d =>
      if (!Files.isDirectory(d)) 0L
      else {
        val s = Files.list(d)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(Files.size(_)).sum
        } finally s.close()
      }
    }.sum

  /** Read (file, row) tombstone pairs from dv sidecar dirs on the
    * driver — no Spark job. Caller gates on [[parquetBytes]]; the
    * distributed scan remains the path for large tombstone sets. */
  def readDvPairs(dirs: Seq[Path], conf: Configuration): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    val out = Seq.newBuilder[(String, Long)]
    for (dir <- dirs if Files.isDirectory(dir)) {
      val parts = {
        val s = Files.list(dir)
        try s.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toList
        finally s.close()
      }
      for (p <- parts) {
        val r: ParquetReader[Group] = ParquetReader
          .builder(new GroupReadSupport(), new HadoopPath(p.toString))
          .withConf(conf).build()
        try {
          var g = r.read()
          while (g != null) {
            out += ((g.getString(0, 0), g.getLong(1, 0)))
            g = r.read()
          }
        } finally r.close()
      }
    }
    out.result()
  }
}
