package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Source/sink surface (SURVEY.md §2.1).
  *
  * The runtime image carries no Delta/Kafka/POI jars (verified against
  * /opt/spark/jars), so:
  *  - Delta tables → [[ManagedParquetTable]]: parquet + a versioned
  *    commit manifest giving append/overwrite atomicity and a health
  *    check (S5-S11 semantics), with every commit mirrored as a
  *    Delta-protocol `_delta_log` entry so real Delta readers can
  *    resolve the same snapshots.
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

/** The loud single-writer violation: another writer claimed the
  * version this commit was derived from (or raced it to the CAS).
  * Extends IllegalStateException so pre-existing handlers keep
  * working; typed so the ONE sanctioned reaction — [[ManagedParquetTable.append]]'s
  * blind-append auto-rebase — can retry exactly this failure and
  * nothing else (an IO error must never be "retried" into a double
  * publish). Read-modify-write commits (overwrite / delete / merge /
  * compact / dv) surface it to the caller: their staged result was
  * derived FROM the snapshot that just changed, so only the caller
  * can re-derive. */
final class ConcurrentWriteException(msg: String)
  extends IllegalStateException(msg)

/** Delta-semantics table on plain parquet: a delta-log-lite commit
  * protocol (S5-S10 semantics, reference gold/bronzeToGold.py:17-42).
  *
  * Layout: immutable parquet segment dirs (`seg-<nano>/`) plus ONE
  * manifest file naming the committed snapshot's segments. Every write
  * lands in a FRESH segment, then the manifest is swapped in with an
  * atomic rename — so a concurrent reader resolves either the old or the
  * new snapshot, never a partial one (old segments are never mutated and
  * only reclaimed by an explicit [[vacuum]], the Delta VACUUM analogue).
  *
  * Scale note: the manifest is O(commits), data files are plain parquet —
  * readers prune partitions/columns exactly as any parquet scan; at real
  * deployment Delta/Iceberg replace this class behind the same calls
  * (object stores swap the rename for a putIfAbsent/conditional-put). */
final class ManagedParquetTable(spark: SparkSession, val path: String) {
  import java.nio.file.{Files, Paths, StandardCopyOption}

  private def manifest = Paths.get(path, "_graft_manifest")
  private def commitsDir = Paths.get(path, "_graft_commits")
  private def commitFile(v: Long) = commitsDir.resolve(f"$v%020d.json")

  /** Directory listing that CLOSES the stream (a bare Files.list leaks
    * one directory fd per call until GC — a long-lived ingest writer
    * checkpointing every 10 commits creeps toward the ulimit) and
    * treats a missing directory as empty. */
  private def listDir(dir: java.nio.file.Path): Seq[java.nio.file.Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(dir)
      try s.iterator().asScala.toList
      finally s.close()
    }

  def exists: Boolean =
    Files.exists(manifest) || resolvedManifest().isDefined

  /** The committed manifest JSON and its version, resolved CAS-first:
    * `_graft_manifest` is a POINTER CACHE of the newest per-version
    * commit file under `_graft_commits/` (the CAS device [[commit]]
    * publishes through). A writer that died between its CAS publish
    * and the pointer rewrite leaves the pointer one-or-more versions
    * behind; the commit files are authoritative, so resolution walks
    * forward from the pointer (one `Files.exists` in the common
    * up-to-date case) and the next successful commit heals the
    * pointer. At EQUAL versions the pointer wins — a retention pass
    * ([[applyRetention]]) rewrites it in place at the same version
    * with reduced dv bookkeeping, which the version-stamped commit
    * file does not see. */
  private def resolvedManifest(): Option[(Long, String)] = {
    def verOf(s: String): Long = """"version":(\d+)""".r
      .findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L)
    var cur: Option[(Long, String)] =
      if (!Files.exists(manifest)) None
      else { val s = Files.readString(manifest); Some((verOf(s), s)) }
    if (cur.isEmpty && Files.isDirectory(commitsDir)) {
      // very-first-commit crash window: CAS landed, pointer never did
      val max = listDir(commitsDir).map(_.getFileName.toString)
        .filter(_.matches("\\d{20}\\.json")).map(_.dropRight(5).toLong)
        .maxOption
      cur = max.map(v => (v, Files.readString(commitFile(v))))
    }
    while (cur.exists { case (v, _) => Files.exists(commitFile(v + 1)) }) {
      val v = cur.get._1 + 1
      cur = Some((v, Files.readString(commitFile(v))))
    }
    cur
  }

  /** Committed snapshot version (0 when the table does not exist yet).
    * Each append/overwrite/delete commit increments it by exactly one,
    * which lets writers detect whether an in-flight commit landed
    * before a crash (see BufferedFlushSink's recovery protocol).
    * ONE documented exception: a retention pass ([[vacuum]] with
    * `retainVersions`) rewrites the manifest IN PLACE at the same
    * version (mode "vacuum") — it changes only dv BOOKKEEPING
    * (dropping entries provably inert for every retained version),
    * never segments, schema, or any row a retained version can see,
    * so version-keyed caches of table CONTENT stay valid; only the
    * byte identity of the manifest is not version-stable. */
  def version: Long = snapshot().map(_._1).getOrElse(0L)

  /** Committed snapshot: (version, segment dir names). */
  private def snapshot(): Option[(Long, Seq[String])] =
    resolvedManifest().map { case (ver, s) => (ver, parseSegments(s)) }

  /** The "segments" array of a commit/manifest JSON — the ONE parser
    * shared by [[snapshot]] and the mirror backfill, so the two can
    * never disagree on the same bytes. */
  private def parseSegments(s: String): Seq[String] =
    """"segments":\[([^\]]*)\]""".r.findFirstMatchIn(s)
      .map(_.group(1).split(",").toSeq.map(_.trim.stripPrefix("\"")
        .stripSuffix("\"")).filter(_.nonEmpty))
      .getOrElse(Seq.empty)

  /** Deletion-vector entries ("mirrorVer:dvDir:seg1;seg2" — the third
    * field records the segment dirs the entry's tombstones touch;
    * entries written before that upgrade lack it). Entries accumulate
    * across the table's life (bounded only by [[vacuum]]'s retention
    * horizon): an entry whose rows' files have since been rewritten or
    * dropped is inert (its (file, row) keys can never match a live
    * scan — segment names are nanotime-unique), and keeping it is what
    * lets [[readAt]] apply the tombstones that were active at ANY
    * retained historical version. The HOT read path never pays for
    * history: see [[liveDvEntries]]. The COMMIT path doesn't either:
    * entries live in `_graft_dvlog/` files the manifest only NAMES
    * (consolidated every [[DvlogConsolidateAt]] dv commits), so a
    * non-dv commit rewrites no dv history and a dv commit appends one
    * tiny file — manifest size tracks live segments, not CDC history. */
  private[graft] def dvEntries: Seq[String] = {
    val (inline, files) = dvState
    inline ++ files.flatMap(readDvlogFile)
  }

  /** Committed dv bookkeeping: (legacy inline entries, dvlog file
    * names). Inline entries exist only on manifests written before the
    * dvlog upgrade; the first dv commit or retention pass migrates
    * them into a consolidated dvlog file. */
  private def dvState: (Seq[String], Seq[String]) =
    resolvedManifest() match {
      case None => (Seq.empty, Seq.empty)
      case Some((_, s)) =>
        def field(name: String): Seq[String] =
          (s""""$name":\\[([^\\]]*)\\]""").r.findFirstMatchIn(s)
            .map(_.group(1).split(",").toSeq.map(_.trim.stripPrefix("\"")
              .stripSuffix("\"")).filter(_.nonEmpty))
            .getOrElse(Seq.empty)
        (field("dvs"), field("dvfiles"))
    }

  private def dvlogDir = Paths.get(path, "_graft_dvlog")

  /** Consolidation cadence: a dv commit folding the named files into
    * one when their count reaches this keeps manifest-referenced dvlog
    * files O(1) — same shape as the delta mirror's checkpoint-10. */
  private val DvlogConsolidateAt = 10

  /** Entry lines of one committed dvlog file. A referenced-but-missing
    * file is corruption and fails loudly. */
  private def readDvlogFile(name: String): Seq[String] =
    Files.readString(dvlogDir.resolve(name)).linesIterator
      .map(_.trim).filter(_.nonEmpty).toSeq

  /** Write entries to a fresh dvlog file; returns its name. Invisible
    * to readers until a manifest commit names it (a crash before that
    * leaves unreferenced garbage that [[vacuum]] reclaims). */
  private def writeDvlogFile(entries: Seq[String]): String = {
    Files.createDirectories(dvlogDir)
    val name = s"dv-${System.nanoTime()}.log"
    Files.writeString(dvlogDir.resolve(name), entries.mkString("\n"))
    name
  }

  /** Mark dvlog files just superseded by a consolidation/retention
    * rewrite: mtime = unreference time, so [[vacuum]]'s unreferenced-
    * dvlog sweep grants a reader holding the previous manifest the
    * full graceMs window — the same contract dropped segments get
    * (see [[commit]]'s segment touch). Never deleted on the commit
    * path: a reader that resolved the pre-consolidation manifest must
    * keep resolving these files. */
  private def touchDvlogFiles(names: Seq[String]): Unit =
    names.foreach { f =>
      val p = dvlogDir.resolve(f)
      if (Files.exists(p)) Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis()))
    }

  /** Parsed dv entry. `touched` is None for legacy entries (unknown
    * touch set → conservatively treated as always-live). */
  private[io] final case class DvEntry(ver: Long, dir: String,
      touched: Option[Set[String]])

  private[io] def parseDv(e: String): DvEntry = {
    val parts = e.split(":", 3)
    DvEntry(parts(0).toLong, parts(1),
      if (parts.length < 3) None
      else Some(parts(2).split(";").filter(_.nonEmpty).toSet))
  }

  /** The dv entries that can still affect a scan of `segs`: an entry
    * whose recorded touch set no longer intersects them is INERT (its
    * (file, row) keys cannot match any scanned row — segment names are
    * nanotime-unique) and its sidecar is never opened. This is what
    * bounds scan cost by LIVE tombstones on a CDC-heavy table whose
    * manifest holds years of dv commits: rewrites (delete / merge /
    * compact / [[compactDeletes]]) retire entries from the hot path
    * automatically, while [[readAt]] alone consults the full
    * historical list. */
  private[graft] def liveDvEntries(segs: Seq[String]): Seq[String] =
    touchingDv(dvEntries, segs.toSet)

  /** [[liveDvEntries]] narrowed further to the segments of the given
    * table-relative files — for callers scanning a file subset. */
  private[io] def liveDvEntriesFor(relFiles: Seq[String]): Seq[String] =
    touchingDv(dvEntries, relFiles.map(_.split("/")(0)).toSet)

  /** Of `entries`, those whose touch set intersects `segs` (legacy
    * entries with no recorded touch set are conservatively kept). */
  private def touchingDv(entries: Seq[String],
      segs: Set[String]): Seq[String] =
    entries.filter(e => parseDv(e).touched.forall(_.exists(segs.contains)))

  /** Atomically publish a new snapshot and return its committed
    * version. `dv` replaces the dv bookkeeping (inline entries, dvlog
    * file names) when given; by default both carry forward VERBATIM —
    * no dv commit, no dv rewrite, so commit cost is O(live segments +
    * referenced dvlog names), never O(table history).
    *
    * SELF-ENFORCING single-writer contract: `base` is the snapshot
    * version the caller derived `segments` from (0 for a new table).
    * The publish is a compare-and-swap on `base + 1`: the full
    * manifest JSON is written to a temp file and HARD-LINKED into
    * `_graft_commits/{base+1}.json` — link creation is an atomic
    * put-if-absent on POSIX (an object-store deployment swaps in a
    * conditional put), so of two writers racing the same version
    * exactly one wins and the loser throws [[ConcurrentWriteException]]
    * LOUDLY with nothing published — which for a BLIND APPEND the
    * engine itself absorbs by rebasing onto the new head (see
    * [[commitBlindAppend]]); read-modify-write commits surface it to
    * the caller. A plain REPLACE-rename onto one
    * pointer file would let the second writer silently erase the
    * first's commit; threading the caller's `base` (rather than
    * re-reading the head here) also catches the wider read-modify-
    * write race where another commit landed while this one was
    * staging its segments. The `_graft_manifest` pointer is rewritten
    * AFTER the CAS as a read cache — a crash in between is healed by
    * [[resolvedManifest]]'s forward walk.
    *
    * `tag` is the caller's idempotence mark (see [[append]]); it lands
    * IN the commit file so the commit and its tag are one atomic CAS —
    * a crash between the commit and the delta-log mirror write can
    * never strand a committed-but-unrecognizable append (the mirror's
    * userMetadata copy is only the fast scan path; [[hasCommitTagged]]
    * consults both). */
  private def commit(segments: Seq[String], mode: String,
      dv: Option[(Seq[String], Seq[String])] = None,
      base: Long, tag: String = ""): Long = {
    Files.createDirectories(Paths.get(path))
    val snap = snapshot()
    val cur = snap.map(_._1).getOrElse(0L)
    if (cur != base) throw new ConcurrentWriteException(
      s"concurrent writer detected at $path: this commit was derived " +
        s"from version $base but the table is now at $cur — the " +
        "single-writer contract is violated; nothing was published " +
        "(the table still serves the other writer's commit)")
    val prevSegs = snap.map(_._2).getOrElse(Seq.empty)
    val ver = base + 1
    val (inline, dvFiles) = dv.getOrElse(dvState)
    val json = manifestJson(ver, mode, segments, inline, dvFiles, tag)
    Files.createDirectories(commitsDir)
    val ctmp = commitsDir.resolve(s".tmp.${System.nanoTime()}")
    Files.writeString(ctmp, json)
    try Files.createLink(commitFile(ver), ctmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentWriteException(
          s"concurrent writer detected at $path: version $ver was " +
            "claimed by another writer while this commit was being " +
            "prepared — the single-writer contract is violated; this " +
            "commit was NOT published (the table stays consistent)")
    } finally Files.deleteIfExists(ctmp)
    val tmp = Paths.get(path, s"_graft_manifest.tmp.${System.nanoTime()}")
    Files.writeString(tmp, json)
    Files.move(tmp, manifest, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // touch segments that just became unreferenced: vacuum's grace
    // window must run from the moment a reader could last have resolved
    // them (now), not from their creation time — else a long-lived
    // segment dies the instant it is dropped
    (prevSegs.toSet -- segments.toSet).foreach { s =>
      val p = Paths.get(path, s)
      if (Files.exists(p)) Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis()))
    }
    ver
  }

  private def manifestJson(ver: Long, mode: String, segments: Seq[String],
      inlineDvs: Seq[String], dvFiles: Seq[String],
      tag: String = ""): String =
    s"""{"version":$ver,"mode":"$mode","segments":[""" +
      segments.map("\"" + _ + "\"").mkString(",") +
      s"""],"dvs":[""" + inlineDvs.map("\"" + _ + "\"").mkString(",") +
      s"""],"dvfiles":[""" + dvFiles.map("\"" + _ + "\"").mkString(",") +
      // field emitted only when tagged: untagged commits keep the
      // pre-tag byte format (every parser here is field-extracting)
      (if (tag.isEmpty) "]}"
       else s"""],"tag":"${jsonEsc(tag)}"}""")

  /** Write df into a fresh immutable segment dir; return its name. */
  private def writeSegment(df: DataFrame): String = {
    val seg = s"seg-${System.nanoTime()}"
    df.write.mode("overwrite").parquet(s"$path/$seg")
    writeStatsSidecar(seg)
    seg
  }

  // ---- per-file statistics (file-skipping index) -------------------------

  private def statsDir = Paths.get(path, "_graft_stats")

  /** Footer-only statistics sweep of a freshly written segment, stored
    * as a tiny parquet sidecar (`_graft_stats/<seg>`): per (file,
    * column) min/max/nullCount — the same information real Delta puts
    * in `add.stats`. Collected from the parquet footers the writer
    * just produced, so no data page is ever read. */
  private def writeStatsSidecar(seg: String): Seq[FileStats.ColStats] = {
    val stats = segmentFiles(seg).flatMap { case (rel, _) =>
      FileStats.footerStats(spark, s"$path/$rel", rel)
    }
    // sidecar rows are planning state (O(files × cols)); write them on
    // the driver — a Spark job here costs a full plan/schedule round
    // trip per COMMIT for a one-row-group file
    SidecarIo.writeStats(statsDir.resolve(seg), stats)
    stats
  }

  /** S22: statistics-pruned read. Plans the scan over ONLY the files
    * whose footer min/max could satisfy `pred` (simple comparison
    * conjuncts; see [[FileStats.prunableConjuncts]]), then re-applies
    * the full predicate to the scanned rows — pruning can only drop
    * provably-dead files, never change the result. Returns the frame;
    * [[pruneFiles]] exposes the planning decision for tests/metrics. */
  def readWhere(pred: org.apache.spark.sql.Column): DataFrame = {
    val (kept, total) = pruneFiles(pred)
    if (kept.isEmpty && total > 0) read().filter(pred).filter(lit(false))
    else if (kept.size == total) read().filter(pred)
    else scanPaths(kept.map(f => s"$path/$f"), liveDvEntriesFor(kept),
      keepPos = false).filter(pred)
  }

  /** (files kept after stats pruning, total live files). Both pruning
    * tiers evaluate DISTRIBUTEDLY over their sidecars and ship only
    * proven-dead file names to the driver — planning state is O(dead
    * files), never O(files × cols), at any table size. A file with no
    * stats rows (segment predating the sidecar, or a lost sidecar) is
    * simply never skipped; the bloom tier likewise only ever proves
    * absence (negative membership on an equality conjunct — blooms
    * have no false negatives). */
  def pruneFiles(pred: org.apache.spark.sql.Column): (Seq[String], Int) = {
    val segs = snapshot().map(_._2).getOrElse(Seq.empty)
    require(segs.nonEmpty, s"no committed snapshot at $path")
    val files = segs.flatMap(segmentFiles).map(_._1)
    val conjuncts = FileStats.prunableConjuncts(read(), pred)
    if (conjuncts.isEmpty) return (files, files.size)
    val statsDirs = segs.map(s => statsDir.resolve(s))
      .filter(Files.isDirectory(_)).map(_.toString)
    val statsDead: Set[String] =
      if (statsDirs.isEmpty) Set.empty
      else FileStats.deadFiles(spark, statsDirs, conjuncts)
    val bloomDead = bloomDeadFiles(conjuncts)
    val kept = files.filter(f => !statsDead(f) && !bloomDead(f))
    (kept, files.size)
  }

  // leaf dir deliberately NOT underscore-prefixed (the parent hides it
  // from recursive root scans; an underscore LEAF would make Spark log
  // a spurious "All paths were ignored" on every sidecar read)
  private def bloomDir = Paths.get(path, "_graft_blooms", "idx")

  /** Bloom sidecar to probe: `idx/` when present, else the pre-idx
    * layout that wrote part files directly under `_graft_blooms` — a
    * table indexed by the older code keeps its skipping (instead of it
    * silently turning off) until [[buildBloomIndex]] re-runs. */
  private def bloomProbeDir: Option[java.nio.file.Path] = {
    if (Files.isDirectory(bloomDir)) return Some(bloomDir)
    val legacy = Paths.get(path, "_graft_blooms")
    if (Files.isDirectory(legacy) &&
        listDir(legacy).exists(_.getFileName.toString.endsWith(".parquet")))
      Some(legacy)
    else None
  }

  /** Per-(file, column) BLOOM file-skipping tier — the equality
    * complement of the min/max sidecar: after an overlapping ingest or
    * without clustering, every file's [min,max] can span the whole key
    * domain and range pruning keeps everything; a per-file Bloom of the
    * column's values still proves `col = v` dead for files that never
    * saw v (no false negatives — a negative probe is a proof). This is
    * Delta's bloom-filter index / parquet bloom in sidecar form.
    *
    * Opt-in and rebuilt by ONE table scan per call regardless of how
    * many columns are indexed (unlike the footer stats, values must
    * actually be read): a single distributed pass aggregates every
    * column's BloomFilterAggregate over xxhash64 per file, and the
    * (file, column, sketch) sidecar rows are shaped and written on the
    * executors — no sketch byte ever reaches the driver. Call after
    * (re)writes; files written later simply have no bloom and are
    * never skipped. */
  def buildBloomIndex(cols: Seq[String],
      expectedItemsPerFile: Long = 1L << 20, fpp: Double = 0.01): Unit = {
    require(cols.nonEmpty, "buildBloomIndex requires at least one column")
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{XxHash64, Literal => CatLit}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val segs = snapshot().map(_._2).getOrElse(Seq.empty)
    require(segs.nonEmpty, s"no committed snapshot at $path")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItemsPerFile, fpp)
    val aggs = cols.map { c =>
      val agg = new BloomFilterAggregate(
        expression(column(new XxHash64(Seq(expression(col(c)))))),
        CatLit(expectedItemsPerFile), CatLit(numBits))
      column(agg.toAggregateExpression()).as(s"_bf_$c")
    }
    // group on the provenance column (input_file_name is undefined
    // through the dv anti-join); sketches then cover only LIVE rows,
    // so a fully-tombstoned value proves dead — correct skipping
    val perFile = scanSegments(segs, liveDvEntries(segs), keepPos = true)
      .groupBy(col("__graft_f").as("_rel"))
      .agg(aggs.head, aggs.tail: _*)
    val lcCols = cols.map(_.toLowerCase)
    val sidecarRows = perFile.rdd.flatMap { r =>
      val rel = r.getString(0)
      lcCols.indices.flatMap { i =>
        Option(r.getAs[Array[Byte]](i + 1)).map(sk => Row(rel, lcCols(i), sk))
      }
    }
    spark.createDataFrame(sidecarRows, bloomSchema)
      .coalesce(8).write.mode("overwrite").parquet(bloomDir.toString)
    // a rebuild retires any pre-idx-layout sidecar files lingering at
    // the legacy root (idx/ shadows them on probe, but leaving them
    // invites a stale fallback if idx/ is ever lost)
    listDir(Paths.get(path, "_graft_blooms"))
      .filterNot(Files.isDirectory(_))
      .foreach(Files.deleteIfExists(_))
  }

  private val bloomSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("file",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("col",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("sketch",
      org.apache.spark.sql.types.BinaryType, nullable = false)))

  /** Distributed bloom probe: the set of live files PROVEN dead for the
    * given conjuncts. Sketches are deserialized and probed on the
    * executors; only the (short) list of dead file names is collected —
    * the driver never materializes the sidecar, so probe memory is
    * O(dead files), not O(files × cols × numBits). Missing/unreadable
    * sidecar → empty set → no bloom skipping. */
  private def bloomDeadFiles(
      conjuncts: Seq[FileStats.Conjunct]): String => Boolean = {
    val probes = conjuncts.filter(_.op == "=")
      .map(c => c.colName.toLowerCase -> FileStats.hashLiteral(c))
    val probeDir = bloomProbeDir
    if (probes.isEmpty || probeDir.isEmpty)
      return (_: String) => false
    val byCol = probes.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val byColBc = spark.sparkContext.broadcast(byCol)
    val dead: Set[String] =
      try spark.read.parquet(probeDir.get.toString)
        .filter(org.apache.spark.sql.functions.col("col")
          .isin(byCol.keys.toSeq: _*))
        .select("file", "col", "sketch")
        .rdd.flatMap { r =>
          val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
          val hashes = byColBc.value.getOrElse(r.getString(1), Nil)
          // negative membership on ANY equality conjunct proves absence
          if (hashes.exists(h => !bf.mightContainLong(h))) Some(r.getString(0))
          else None
        }.distinct().collect().toSet
      catch { case _: Throwable => Set.empty[String] }
    dead
  }

  /** Z-order layout shaping shared by clustered overwrite/compact. */
  private def clusterShape(df: DataFrame, zCols: Seq[String],
      numFiles: Int, bits: Int): DataFrame = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val zName = s"_graft_z_${System.nanoTime()}"
    df.withColumn(zName, ZOrder.zvalue(df, zCols, bits))
      .repartitionByRange(numFiles, col(zName))
      .sortWithinPartitions(zName)
      .select(df.columns.map(col): _*)
  }

  /** Z-order-clustered overwrite: range-partition on the interleaved
    * [[ZOrder.zvalue]] of `zCols` and sort within partitions, so each
    * of the ~`numFiles` output files covers a tight range in EVERY
    * clustered dimension — which is what makes the per-file min/max
    * index selective for [[readWhere]] on any of those columns. */
  def overwriteClustered(df: DataFrame, zCols: Seq[String],
      numFiles: Int, bits: Int = 12): Unit =
    overwrite(clusterShape(df, zCols, numFiles, bits))

  /** OPTIMIZE-style compaction: rewrite the CURRENT snapshot into
    * ~`targetFiles` files (z-ordered when `zCols` given) as one
    * commit. Readers of the pre-compaction snapshot keep their
    * immutable segments until vacuum; the delta-log mirror records the
    * rewrite with `dataChange: false` (per the Delta protocol, so
    * streaming readers of the mirror know no rows changed). The
    * small-file problem this solves is a first-order 100 TB concern:
    * a long-lived ingest writer produces one file per micro-batch, and
    * scan/listing cost degrades linearly with file count until
    * compacted. */
  def compact(targetFiles: Int = 1, zCols: Seq[String] = Nil,
      bits: Int = 12): Unit = {
    val snap = snapshot()
    val prev = snap.map(_._2).getOrElse(Seq.empty)
    require(prev.nonEmpty, s"no committed snapshot at $path")
    val cur = read()
    val shaped =
      if (zCols.nonEmpty) clusterShape(cur, zCols, targetFiles, bits)
      else cur.repartition(targetFiles)
    val seg = writeSegment(shaped)
    val v = commit(Seq(seg), "compact", base = snap.map(_._1).getOrElse(0L))
    mirrorDeltaLog(v, "compact", added = segmentFiles(seg),
      removed = prev.flatMap(segmentFiles).map(_._1),
      schemaJson = shaped.schema.json, dataChange = false)
  }

  /** S7: append tolerating evolving schemas (mergeSchema on read).
    * `tag` is the caller's idempotence mark (real Delta's
    * txn/appId device) so a crashed writer can later tell whether
    * THIS append committed — version arithmetic alone cannot
    * distinguish it from an unrelated commit (compact, merge) that
    * raced into the crash window. The tag lands ATOMICALLY in the CAS
    * commit file itself (commit and tag are one event — a crash
    * anywhere after [[commit]] returns can never strand a committed
    * append whose tag is missing everywhere) and is COPIED into the
    * mirrored commit's commitInfo.userMetadata as the fast scan path.
    * Returns the committed manifest version (1-based; the commit's
    * mirror file number is this minus one) so a caller's idempotence
    * bookkeeping can name ITS OWN commit instead of re-reading
    * `version` after the fact — a re-read races any other commit
    * landing in between. */
  def append(df: DataFrame, tag: Option[String] = None): Long = {
    val seg = writeSegment(df)
    val v = commitBlindAppend(seg, tag.getOrElse(""))
    mirrorDeltaLog(v, "append", added = segmentFiles(seg), removed = Nil,
      schemaJson = df.schema.json, userMetadata = tag.getOrElse(""))
    v
  }

  /** Optimistic-concurrency rebase for BLIND appends (Delta/Iceberg
    * OCC, the append-only special case): an append reads nothing from
    * the snapshot it lands on — its segment is staged before any head
    * is consulted — so when the CAS loses to a concurrent commit the
    * append is ALWAYS safe to re-derive as "new head's segments + my
    * segment" and re-CAS, whatever the interleaver was (another
    * append, an overwrite, a compaction: serializing this append
    * after it is a correct history in every case). The loop re-reads
    * the head fresh each attempt and retries ONLY the typed
    * [[ConcurrentWriteException]]; exactly-once holds because a lost
    * CAS by definition published nothing. Read-modify-write commits
    * get no such loop — their staged segments were derived FROM a
    * snapshot that is now stale, so they keep failing loudly.
    * Jittered backoff breaks symmetric races; the attempt bound turns
    * pathological contention (or a commit-dir permission wall
    * masquerading as contention) into the loud failure rather than a
    * livelock. */
  private def commitBlindAppend(seg: String, tag: String): Long = {
    val MaxRebases = 64
    var attempt = 0
    while (true) {
      val snap = snapshot()
      try return commit(snap.map(_._2).getOrElse(Seq.empty) :+ seg,
        "append", base = snap.map(_._1).getOrElse(0L), tag = tag)
      catch {
        case e: ConcurrentWriteException =>
          attempt += 1
          if (attempt >= MaxRebases) throw new ConcurrentWriteException(
            s"blind-append rebase at $path gave up after $MaxRebases " +
              s"lost races — contention is pathological or the commit " +
              s"dir is failing CAS for a non-race reason; last: " +
              e.getMessage)
          // full jitter, capped: desynchronizes herds without making
          // a quiet two-writer race pay a long sleep
          Thread.sleep(
            java.util.concurrent.ThreadLocalRandom.current()
              .nextLong(1L + math.min(attempt.toLong * 4L, 64L)))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** See [[append]] for the tag and return-value contract. */
  def overwrite(df: DataFrame, tag: Option[String] = None): Long = {
    val snap = snapshot()
    val prev = snap.map(_._2).getOrElse(Seq.empty)
    val seg = writeSegment(df)
    val v = commit(Seq(seg), "overwrite",
      base = snap.map(_._1).getOrElse(0L), tag = tag.getOrElse(""))
    mirrorDeltaLog(v, "overwrite", added = segmentFiles(seg),
      removed = prev.flatMap(segmentFiles).map(_._1),
      schemaJson = df.schema.json, userMetadata = tag.getOrElse(""))
    v
  }

  /** True iff some commit made at-or-after manifest version
    * `sinceVersion` carries `tag` (see [[append]]). Two homes are
    * consulted: the mirror's commitInfo.userMetadata (fast path,
    * subject to mirror-log retention) and the CAS commit files — the
    * tag's ATOMIC home, which still answers for an append whose
    * mirror write was lost to a crash (the head commit file also
    * survives [[vacuum]]'s superseded-commit sweep, so the LAST
    * append's tag outlives mirror retention). Mirror file numbers are
    * 0-based while manifest versions are 1-based, so the first commit
    * AFTER manifest version V is mirror file V = commit file V+1 —
    * the floors are an optimization only (tags are unique); if log
    * files were cleaned away the answer degrades to false and the
    * caller re-does its work (at-least-once), never loses it. */
  def hasCommitTagged(tag: String, sinceVersion: Long): Boolean = {
    val mirrorNeedle = s""""userMetadata":"${jsonEsc(tag)}""""
    val mirrorHit = Files.exists(deltaLogDir) && listDir(deltaLogDir)
      .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
      .filter(_.getFileName.toString.dropRight(5).toLong >= sinceVersion)
      .exists(p => try Files.readString(p).contains(mirrorNeedle)
        catch { case _: Throwable => false })
    if (mirrorHit) return true
    // commit files, probed by NUMBER from the floor to the resolved
    // head when the window is narrow (the per-batch norm: floor is
    // last trigger's append) — O(commits since the floor), the same
    // bound as the mirror scan. A WIDE window (floor 0 on a long
    // table: fresh checkpoint, untrusted legacy floor) would pay one
    // stat per number, so it falls back to a single listing instead —
    // O(retained files), tiny after vacuum. Files vacuumed away skip
    // either way.
    val commitNeedle = s""""tag":"${jsonEsc(tag)}""""
    def readHas(p: java.nio.file.Path): Boolean =
      try Files.readString(p).contains(commitNeedle)
      catch { case _: Throwable => false }
    val head = version
    val lo = sinceVersion + 1
    if (head - lo < 256) {
      var v = lo
      while (v <= head) {
        if (Files.exists(commitFile(v)) && readHas(commitFile(v)))
          return true
        v += 1
      }
      false
    } else Files.isDirectory(commitsDir) && listDir(commitsDir)
      .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
      .filter(_.getFileName.toString.dropRight(5).toLong >= lo)
      .exists(readHas)
  }

  def read(): DataFrame = {
    val segs = snapshot().map(_._2).getOrElse(Seq.empty)
    require(segs.nonEmpty, s"no committed snapshot at $path")
    scanSegments(segs, liveDvEntries(segs), keepPos = false)
  }

  // ---- deletion vectors --------------------------------------------------

  private def dvRoot = Paths.get(path, "_graft_dv")

  /** Hidden per-row provenance columns used to apply deletion vectors:
    * table-relative file path + row position within the file. Both
    * sides of the tombstone join derive them with the SAME expressions,
    * so equality is representation-stable. */
  private def posCols: Seq[(String, org.apache.spark.sql.Column)] = {
    import org.apache.spark.sql.functions.{col, regexp_replace}
    val abs = Paths.get(path).toAbsolutePath.toString
    Seq(
      "__graft_f" -> regexp_replace(col("_metadata.file_path"),
        "^(file:(//)?)?" + java.util.regex.Pattern.quote(abs) + "/", ""),
      "__graft_r" -> col("_metadata.row_index"))
  }

  /** Distinct table-relative files named by the given dv entries —
    * the files whose visibility a tombstone commit changed. Driver-
    * bounded by live file count, like every file list here. Served
    * from the driver-local pair read when the set is size-gated small
    * (no Spark job at all); the distributed distinct remains for
    * large sets. */
  private[io] def dvTouchedFiles(entries: Seq[String]): Seq[String] =
    dvLocalPairs(entries) match {
      case Some(pairs) => pairs.map(_._1).distinct.sorted
      case None => dvFrame(entries).select("__graft_f").distinct()
        .collect().map(_.getString(0)).toSeq.sorted
    }

  /** The dv entries' (file, row) pairs read driver-side, when the
    * sidecar bytes pass the [[ManagedParquetTable.DvLocalBytes]] gate;
    * None → caller uses the distributed scan. */
  private def dvLocalPairs(entries: Seq[String]): Option[Seq[(String, Long)]] = {
    val dirs = entries.map(e => Paths.get(path, "_graft_dv", parseDv(e).dir))
    if (SidecarIo.parquetBytes(dirs) <= ManagedParquetTable.DvLocalBytes)
      Some(SidecarIo.readDvPairs(dirs, spark.sessionState.newHadoopConf()))
    else None
  }

  /** Tombstone set of the given dv entries as (__graft_f, __graft_r).
    * Size-gated driver-local load: a small tombstone set (the common
    * case — dv commits are O(matched rows) and compactDeletes folds
    * them) comes back as a LocalRelation, so the read path's anti-join
    * broadcasts it WITHOUT the separate broadcast-build Spark job a
    * parquet-scan child needs (BroadcastExchange over LocalTableScan
    * collects driver-side). Every managed read with live tombstones
    * was paying that ~100-300 ms job; large dv sets keep the
    * distributed scan unchanged. */
  private def dvFrame(entries: Seq[String]): DataFrame =
    dvLocalPairs(entries) match {
      case Some(pairs) =>
        import scala.jdk.CollectionConverters._
        val rows: java.util.List[Row] =
          pairs.map(p => Row(p._1, p._2): Row).asJava
        spark.createDataFrame(rows, ManagedParquetTable.dvSchema)
      case None =>
        val dirs = entries.map(e =>
          Paths.get(path, "_graft_dv", parseDv(e).dir))
        spark.read.parquet(dirs.map(_.toString): _*)
          .toDF("__graft_f", "__graft_r")
    }

  /** Scan segment dirs with deletion vectors applied (anti-join on the
    * (file, row) tombstone set — AQE broadcasts it when small). With
    * `keepPos` the provenance columns stay in the output. */
  private[io] def scanSegments(segs: Seq[String], dvs: Seq[String],
      keepPos: Boolean): DataFrame =
    scanPaths(segs.map(s => s"$path/$s"), dvs, keepPos)

  /** Merged read schema of an immutable path set, inferred once and
    * cached process-wide (segment dirs are nanotime-unique and never
    * mutate, so the key can never alias different content). The
    * mergeSchema footer sweep is O(files) DRIVER work; every read()
    * was re-paying it — a lifecycle gate doing dozens of reads spent
    * seconds re-merging identical footers. Metadata cache only (the
    * snapshot-cache Delta/Iceberg keep); no data or results cached. */
  private def mergedSchemaOf(paths: Seq[String]): StructType = {
    val cache = ManagedParquetTable.schemaCache
    if (cache.size > 4096) cache.clear()
    cache.computeIfAbsent(paths.sorted.mkString(" "), _ =>
      try driverMergedSchema(paths)
      catch {
        case scala.util.control.NonFatal(_) => spark.read
          .option("mergeSchema", "true").parquet(paths: _*).schema
      })
  }

  /** The footer-merge inference performed WHOLLY on the driver: Spark's
    * own `mergeSchemasInParallel` submits a Spark job unconditionally
    * (even for a two-file set), and cache misses here happen once per
    * fresh snapshot — a lifecycle gate was paying ~12 schema-inference
    * jobs per run. Fidelity matches Spark's inference exactly: each
    * footer's serialized Spark schema property is preferred (what
    * Spark's own `readSchemaFromFooter` prefers), falling back to
    * converting the parquet MessageType under the session conf; the
    * fold is the same `StructType.merge`. Large file sets throw and
    * keep the distributed inference (driver footer IO stays bounded
    * the same way the stats-sidecar sweep is). */
  private def driverMergedSchema(paths: Seq[String]): StructType = {
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = spark.sessionState.newHadoopConf()
    val files: Seq[HPath] = paths.flatMap { p =>
      val hp = new HPath(p)
      val fs = hp.getFileSystem(conf)
      val st = fs.getFileStatus(hp)
      if (st.isDirectory)
        fs.listStatus(hp).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")
            && !s.getPath.getName.startsWith("_")
            && !s.getPath.getName.startsWith("."))
          .map(_.getPath)
      else Seq(hp)
    }
    require(files.nonEmpty, s"no parquet files under $paths")
    require(files.size <= 64,
      "large file set: use the distributed inference")
    val schemas = files.map { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try {
        val fm = r.getFooter.getFileMetaData
        Option(fm.getKeyValueMetaData
            .get("org.apache.spark.sql.parquet.row.metadata")) match {
          case Some(json) =>
            org.apache.spark.sql.types.DataType.fromJson(json)
              .asInstanceOf[StructType]
          case None => org.apache.spark.sql.graft.SchemaBridge
            .convert(spark, fm.getSchema)
        }
      } finally r.close()
    }
    schemas.distinct
      .reduceLeft(org.apache.spark.sql.graft.SchemaBridge.merge(spark, _, _))
  }

  /** As [[scanSegments]] for explicit file/dir paths under the table. */
  private[io] def scanPaths(paths: Seq[String], dvs: Seq[String],
      keepPos: Boolean): DataFrame = {
    val base = spark.read.schema(mergedSchemaOf(paths)).parquet(paths: _*)
    if (dvs.isEmpty && !keepPos) return base
    val withPos = posCols.foldLeft(base) { case (df, (n, c)) =>
      df.withColumn(n, c)
    }
    val filtered =
      if (dvs.isEmpty) withPos
      else dvLocalPairs(dvs) match {
        case Some(pairs)
            if pairs.size <= ManagedParquetTable.DvPredicateMaxEntries =>
          // a TINY tombstone set applies as a row-local literal
          // predicate — no join node, no broadcast build (even a
          // LocalTableScan broadcast child submits a collect job), no
          // exchange for AQE to materialize. Strictly equivalent to
          // the anti-join: drop a row iff its (file, row) pair is
          // tombstoned (try_element_at → null on an untouched file →
          // coalesce keeps the row). The entry gate bounds the
          // per-row probe cost (GetMapValue is a linear scan): above
          // it the hash-building anti-join below stays the plan.
          import org.apache.spark.sql.functions.{array_contains, coalesce, not, try_element_at}
          import org.apache.spark.sql.types.{ArrayType, LongType, MapType, StringType}
          val byFile = pairs.groupBy(_._1).view
            .mapValues(_.map(_._2)).toMap
          val mLit = org.apache.spark.sql.graft.ColumnBridge.column(
            org.apache.spark.sql.catalyst.expressions.Literal.create(
              byFile, MapType(StringType,
                ArrayType(LongType, containsNull = false),
                valueContainsNull = false)))
          withPos.filter(not(coalesce(
            array_contains(try_element_at(mLit, col("__graft_f")),
              col("__graft_r")),
            lit(false))))
        case _ =>
          withPos.join(dvFrame(dvs), Seq("__graft_f", "__graft_r"),
            "left_anti")
      }
    if (keepPos) filtered else filtered.drop("__graft_f", "__graft_r")
  }

  /** DELETE as row tombstones — the deletion-vector form: ONE scan
    * finds the doomed (file, row) positions, which persist as a tiny
    * sidecar the read path anti-joins; NO segment is rewritten, ever.
    * This is the scattered-delete answer [[deleteWhere]] cannot give
    * (a predicate touching every file forces it to rewrite the whole
    * table — exactly real Delta without deletion vectors): cost is
    * O(matched rows), not O(table). Reads, time travel, the change
    * feed and downstream rewrites all honor the tombstones; a
    * rewriting commit (delete/merge/compact/overwrite) reads through
    * them, so its output has the tombstoned rows physically removed
    * and the then-inert entries are kept only for time travel. A
    * delete matching nothing commits nothing. NULL predicates follow
    * SQL DELETE (only IS TRUE deletes). */
  def deleteWhereDV(condition: org.apache.spark.sql.Column): Unit = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    deleteDVCore(_.filter(coalesce(condition, lit(false))))
  }

  /** Key-set DV delete: tombstone every row whose key appears in
    * `keys` — [[deleteMatching]]'s semantics at [[deleteWhereDV]]'s
    * cost, the shape a STREAMING CDC delete needs (a micro-batch of
    * scattered tombstones must not rewrite the table it trickles
    * into). Semi-join, never collected; O(matched rows) like every
    * dv commit. */
  def deleteMatchingDV(keys: DataFrame, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "deleteMatchingDV requires at least one key column")
    import org.apache.spark.sql.functions.col
    val k = keys.select(keyCols.map(col): _*)
    deleteDVCore(_.join(k, keyCols, "left_semi"))
  }

  /** Shared dv-delete core; `doomed` must be a pure row filter. */
  private def deleteDVCore(doomed: DataFrame => DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    val snap = snapshot()
    val segs = snap.map(_._2).getOrElse(Seq.empty)
    require(segs.nonEmpty, s"no committed snapshot at $path")
    val doomedRows = doomed(scanSegments(segs, liveDvEntries(segs),
        keepPos = true))
      .select(col("__graft_f"), col("__graft_r"))
    if (doomedRows.isEmpty) return
    Files.createDirectories(dvRoot)
    val dir = s"dv-${System.nanoTime()}"
    doomedRows.write.mode("overwrite").parquet(s"$path/_graft_dv/$dir")
    // the touched segments are recorded in the entry so later reads
    // can prove it inert once every one of them is rewritten/dropped;
    // same size-gated driver-local read as dvFrame (one less job per
    // dv commit in the common small-tombstone case)
    val dvDirPath = Paths.get(path, "_graft_dv", dir)
    val touched =
      if (SidecarIo.parquetBytes(Seq(dvDirPath)) <=
          ManagedParquetTable.DvLocalBytes)
        SidecarIo.readDvPairs(Seq(dvDirPath),
            spark.sessionState.newHadoopConf())
          .map(_._1.split("/")(0)).distinct.sorted.toArray
      else spark.read.parquet(dvDirPath.toString)
        .select(col("__graft_f")).distinct()
        .collect().map(_.getString(0).split("/")(0)).distinct.sorted
    // the entry records the MIRROR version this commit creates (commit
    // files are 0-based and count manifest commits), so readAt can
    // scope tombstones to any historical version
    val mirrorVer = snap.map(_._1).getOrElse(0L) // = next mirror file no.
    val entry = s"$mirrorVer:$dir:${touched.mkString(";")}"
    // the entry rides a fresh dvlog file the commit NAMES — never the
    // manifest body, so a CDC-heavy table's commit never rewrites its
    // dv history. At the consolidation cadence (or on the first dv
    // commit after a legacy inline-dvs manifest) all named files fold
    // into one, keeping the referenced-file list O(1); the superseded
    // files are NOT deleted here — a concurrent reader holding the
    // pre-consolidation manifest still resolves them — they are only
    // mtime-touched (unreference time, mirroring commit's segment
    // touch) and left for vacuum's unreferenced-dvlog sweep, which
    // applies the same graceMs contract segments get.
    val (inline, dvFiles) = dvState
    val base = snap.map(_._1).getOrElse(0L)
    // the mirror's userMetadata (graft-dv:<dir>) doubles as the commit
    // tag so a lost-mirror backfill ([[repairMirror]]) can reproduce
    // the sidecar pointer a graft-aware replay needs
    val v =
      if (inline.nonEmpty || dvFiles.size >= DvlogConsolidateAt) {
        val all = inline ++ dvFiles.flatMap(readDvlogFile) :+ entry
        val consolidated = writeDvlogFile(all)
        val cv = commit(segs, "delete-dv",
          Some((Seq.empty, Seq(consolidated))),
          base = base, tag = s"graft-dv:$dir")
        touchDvlogFiles(dvFiles)
        cv
      } else {
        val nf = writeDvlogFile(Seq(entry))
        commit(segs, "delete-dv", Some((Seq.empty, dvFiles :+ nf)),
          base = base, tag = s"graft-dv:$dir")
      }
    // structural mirror: the protocol's DV form needs reader-version-3
    // feature flags; this mirror stays at reader v1, so a DV delete is
    // a data-changing commit with no file actions (external FILE-level
    // replays see an unchanged file set). The sidecar dir is named in
    // commitInfo.userMetadata — informational per the protocol (real
    // Delta readers ignore commitInfo), but it lets a graft-aware
    // replay (tools/DeltaLogReplay) apply the tombstones and agree
    // with the writer's row counts at every version.
    mirrorDeltaLog(v, "delete", added = Nil, removed = Nil,
      schemaJson = read().schema.json, userMetadata = s"graft-dv:$dir")
  }

  /** REORG-style tombstone purge: rewrite every live segment whose
    * tombstoned-row fraction reaches `threshold`, folding its deletion
    * vectors into a physical rewrite (one commit). The rewritten
    * segments' dv entries drop out of [[liveDvEntries]] automatically
    * — after a purge the hot read path anti-joins ONLY tombstones of
    * still-live segments, so scan cost tracks live deletes, not table
    * history ([[readAt]] keeps the full list). The mirror emits the
    * remove+add actions with dataChange=false (the logical content is
    * unchanged), which is also where a footer-based external replay
    * re-converges with reality for rows it could not see leave
    * (reader-v1 mirrors carry no dv file actions).
    * Returns the number of segments rewritten. */
  def compactDeletes(threshold: Double = 0.3): Int = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    import org.apache.spark.sql.functions.{col, count, lit, split}
    val snap = snapshot()
    val segs = snap.map(_._2).getOrElse(Seq.empty)
    if (segs.isEmpty) return 0
    val live = liveDvEntries(segs)
    if (live.isEmpty) return 0
    // tombstones per segment (sidecars are tiny; one distributed pass)
    val tombs = dvFrame(live)
      .groupBy(split(col("__graft_f"), "/").getItem(0).as("seg"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // physical rows per candidate segment from parquet FOOTERS only
    val affected = segs.filter { s =>
      val tn = tombs.getOrElse(s, 0L)
      tn > 0 && {
        val rows = segmentFiles(s).map(f => footerRowCount(f._1)).sum
        rows > 0 && tn.toDouble / rows >= threshold
      }
    }
    if (affected.isEmpty) return 0
    val survivors = scanSegments(affected, live, keepPos = false)
    val kept = segs.filterNot(affected.contains)
    // a fully-tombstoned segment set still commits one (possibly
    // empty) segment when nothing else remains, keeping the schema
    if (!survivors.isEmpty || kept.isEmpty) {
      val seg = writeSegment(survivors)
      val v = commit(kept :+ seg, "reorg",
        base = snap.map(_._1).getOrElse(0L))
      mirrorDeltaLog(v, "reorg", added = segmentFiles(seg),
        removed = affected.flatMap(segmentFiles).map(_._1),
        schemaJson = survivors.schema.json, dataChange = false)
    } else {
      val v = commit(kept, "reorg", base = snap.map(_._1).getOrElse(0L))
      mirrorDeltaLog(v, "reorg", added = Nil,
        removed = affected.flatMap(segmentFiles).map(_._1),
        schemaJson = survivors.schema.json, dataChange = false)
    }
    affected.size
  }

  /** Footer-only row count of one table-relative parquet file. */
  private def footerRowCount(rel: String): Long = {
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.{Path => HadoopPath}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new HadoopPath(s"$path/$rel"), spark.sessionState.newHadoopConf()))
    try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    finally reader.close()
  }

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

  /** Telemetry-driven maintenance recommendations for THIS table — the
    * busiest artifact finally gets the same policy surface its derived
    * indexes got (`InvertedIndex.maintenancePlan`,
    * `IncrementalIvfPqIndex.maintenancePlan`): one
    * [[MaintenanceAction]] per threshold crossed, empty when the table
    * needs nothing, so compact / compactDeletes / vacuum /
    * repairMirror cadence is a measured decision instead of the
    * operator's guesswork. Every signal is metadata-only — manifest
    * resolution, directory listings, and parquet FOOTER row counts
    * (the same cost class [[compactDeletes]]' own planning pays; no
    * data page is ever read), and the footer sweeps only run when a
    * cheaper listing says they could matter (a delete-free table pays
    * pure listings). Ordering: a mirror gap is reported FIRST — the
    * change feed and every basis-tracked maintainer fail loudly on
    * one, and checkpoint freshness follows the mirror — but it does
    * not preempt the file/tombstone rows (reads and commits are
    * unaffected by a lagging mirror, unlike an index's torn swap).
    * An unreadable table (manifest naming segment dirs that are gone)
    * preempts as the only row: sizing signals over a table in doubt
    * are garbage. */
  def maintenancePlan(
      policy: TableMaintenancePolicy = TableMaintenancePolicy()):
      Seq[MaintenanceAction] = {
    val snap = snapshot()
    if (snap.isEmpty) return Seq.empty // nothing committed: no upkeep
    val (ver, segs) = snap.get
    // corruption preempts as the only row (metadata-only check: a
    // manifest naming a segment dir that is gone means the snapshot
    // cannot read — no sizing signal over it is trustworthy)
    val missingSegs = segs.count(s => !Files.isDirectory(Paths.get(path, s)))
    if (missingSegs > 0)
      return Seq(MaintenanceAction("repair", "missing_segments",
        missingSegs.toLong, 0L, 0L,
        s"$missingSegs live segment dir(s) named by the manifest are " +
          "gone; repair() moves the table aside"))
    val out = Seq.newBuilder[MaintenanceAction]
    // mirror/checkpoint staleness: newest mirror entry vs the newest
    // expected number (manifest version - 1; mirror numbers are
    // 0-based). Entries below the retention floor were pruned, not
    // lost, so only the head-side gap counts as lag.
    val newestMirror = listDir(deltaLogDir).map(_.getFileName.toString)
      .filter(_.matches("\\d{20}\\.json")).map(_.dropRight(5).toLong)
      .maxOption.getOrElse(-1L)
    val mirrorLag = (ver - 1L) - newestMirror
    if (mirrorLag > policy.maxMirrorLag)
      out += MaintenanceAction("repairMirror", "mirror_lag", mirrorLag,
        policy.maxMirrorLag, 0L,
        "delta-log mirror trails the manifest (writer died between " +
          "commit and mirror write); change-feed consumers and " +
          "basis-tracked maintainers fail loudly on the gap, and " +
          "checkpoints only advance with the mirror")
    // live-file pressure: count + small-file histogram from the
    // segment listings (sizes come with the listing; no file opened)
    val files = segs.flatMap(segmentFiles)
    val nFiles = files.size
    val small = files.count(_._2 < policy.smallFileBytes)
    val smallPerm = if (nFiles == 0) 0L else 1000L * small / nFiles
    if (nFiles >= policy.maxLiveFiles ||
        (nFiles > 1 && smallPerm >= policy.maxSmallFilePermille)) {
      val totalBytes = files.map(_._2).sum
      val target = math.max(1L,
        (totalBytes + policy.targetFileBytes - 1) / policy.targetFileBytes)
      if (target < nFiles)
        out += MaintenanceAction("compact", "live_files", nFiles.toLong,
          if (nFiles >= policy.maxLiveFiles) policy.maxLiveFiles.toLong
          else policy.maxSmallFilePermille, target,
          s"$nFiles live files ($smallPerm‰ under " +
            s"${policy.smallFileBytes} B); every scan plan, stats " +
            s"prune, and footer sweep pays per file — compact to " +
            s"~$target files of ~${policy.targetFileBytes} B")
    }
    // tombstone pressure: entry count from the manifest alone; the
    // footer sweep (dv rows / live rows) runs only when entries exist
    val liveDv = liveDvEntries(segs)
    if (liveDv.nonEmpty) {
      val dvRows = liveDv.map(parseDv).map(_.dir).distinct.map { d =>
        listDir(dvRoot.resolve(d))
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(p => footerRowCount(s"_graft_dv/$d/${p.getFileName}")).sum
      }.sum
      val liveRows = files.map(f => footerRowCount(f._1)).sum
      val perm = if (liveRows == 0) 1000L else 1000L * dvRows / liveRows
      if (liveDv.size >= policy.maxLiveDvEntries ||
          perm >= policy.maxTombstonePermille)
        out += MaintenanceAction("compactDeletes",
          if (liveDv.size >= policy.maxLiveDvEntries) "live_dv_entries"
          else "tombstone_permille",
          if (liveDv.size >= policy.maxLiveDvEntries) liveDv.size.toLong
          else perm,
          if (liveDv.size >= policy.maxLiveDvEntries)
            policy.maxLiveDvEntries.toLong
          else policy.maxTombstonePermille, 0L,
          s"${liveDv.size} live dv entries / $dvRows tombstoned rows " +
            s"($perm‰ of $liveRows physical): every scan opens each " +
            "entry's sidecar and reads-then-drops the dead rows")
    }
    // reclaimable dead weight: everything vacuum() would delete today
    // (grace elided — the plan reports pressure, vacuum enforces age)
    val liveSet = segs.toSet
    val staleSegs = listDir(Paths.get(path))
      .map(_.getFileName.toString)
      .count(n => n.startsWith("seg-") && !liveSet(n))
    val ptrVer =
      if (!Files.exists(manifest)) -1L
      else """"version":(\d+)""".r
        .findFirstMatchIn(Files.readString(manifest))
        .map(_.group(1).toLong).getOrElse(-1L)
    val staleCommits = listDir(commitsDir).map(_.getFileName.toString)
      .count(n => n.startsWith(".tmp.") ||
        (n.matches("\\d{20}\\.json") && n.dropRight(5).toLong < ptrVer))
    val (_, refFiles) = dvState
    val refSet = refFiles.toSet
    val staleDvlog = listDir(dvlogDir)
      .count(p => !refSet(p.getFileName.toString))
    val refDvDirs = dvEntries.map(parseDv(_).dir).toSet
    val staleDvDirs = listDir(dvRoot)
      .count(p => !refDvDirs(p.getFileName.toString))
    val stale = staleSegs + staleCommits + staleDvlog + staleDvDirs
    if (stale >= policy.maxStaleObjects)
      out += MaintenanceAction("vacuum", "stale_objects", stale.toLong,
        policy.maxStaleObjects.toLong, 0L,
        s"$staleSegs dead segment dirs + $staleCommits superseded " +
          s"commit files + ${staleDvlog + staleDvDirs} orphaned dv " +
          "artifacts: unreferenced weight every listing walks past")
    out.result()
  }

  /** W1's DELETE shape, narrowed to the segments that actually contain
    * matching rows (real Delta's file-granular copy-on-write): one scan
    * finds the hit files, only THEIR segments are rewritten, and a
    * segment whose rows all match is dropped from the snapshot with no
    * rewrite at all. Untouched segments stay live under their original
    * identity — what keeps downstream file-diff consumers (change feed
    * s27, incremental MV refresh) O(delta). A scattered predicate still
    * rewrites everything, exactly as real Delta without deletion
    * vectors; an aligned/ranged one touches only what it must. A delete
    * matching nothing commits nothing. Rows where the predicate is
    * NULL survive (SQL DELETE semantics: only condition IS TRUE
    * deletes). The scan reads the old snapshot's immutable segments
    * while writing the new one, so concurrent readers stay consistent
    * throughout. */
  def deleteWhere(condition: org.apache.spark.sql.Column): Unit = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    val doomed = coalesce(condition, lit(false))
    deleteCore(_.filter(doomed), _.filter(not(doomed)))
  }

  /** Shared narrow-delete core. `doomed` selects the rows to delete,
    * `survivors` their complement; both must be pure row filters. */
  private def deleteCore(doomed: DataFrame => DataFrame,
      survivors: DataFrame => DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    val snap = snapshot()
    val prev = snap.map(_._2).getOrElse(Seq.empty)
    require(prev.nonEmpty, s"no committed snapshot at $path")
    val dvs = liveDvEntries(prev)
    // one scan, bounded output: at most one rel path per live data file
    // (position columns, not input_file_name: the latter is undefined
    // through the deletion-vector anti-join)
    val hitFiles = doomed(scanSegments(prev, dvs, keepPos = true))
      .select(col("__graft_f")).distinct()
      .collect().map(_.getString(0)).toSet
    val affected = prev.filter(seg => hitFiles.exists(_.startsWith(s"$seg/")))
    if (affected.isEmpty) return // nothing matched: no commit, no rewrite
    // rewrite reads THROUGH the tombstones: a dv-deleted row of an
    // affected segment must never be resurrected by the survivor copy
    val affectedRead = scanSegments(affected, dvs, keepPos = false)
    val surv = survivors(affectedRead)
    // a fully-matched segment set with no survivors still commits one
    // empty segment so the table keeps a readable schema
    val keepSeg = !surv.isEmpty || affected == prev
    val kept = prev.filterNot(affected.contains)
    if (keepSeg) {
      val seg = writeSegment(surv)
      val v = commit(kept :+ seg, "delete",
        base = snap.map(_._1).getOrElse(0L))
      mirrorDeltaLog(v, "delete", added = segmentFiles(seg),
        removed = affected.flatMap(segmentFiles).map(_._1),
        schemaJson = surv.schema.json)
    } else {
      val v = commit(kept, "delete", base = snap.map(_._1).getOrElse(0L))
      mirrorDeltaLog(v, "delete", added = Nil,
        removed = affected.flatMap(segmentFiles).map(_._1),
        schemaJson = surv.schema.json)
    }
  }

  /** Delta-style MERGE (upsert): rows of `updates` REPLACE current rows
    * sharing their key; update rows with no current match INSERT. The
    * whole statement is one atomic commit — readers see the old
    * snapshot until the new one swaps in, exactly like overwrite.
    * Column contract: `updates` has the table's schema (whenMatched
    * update-all + whenNotMatched insert-all semantics, the common Delta
    * MERGE form). NARROWED like [[deleteWhere]] (real Delta's
    * file-granular copy-on-write): one scan finds the files holding
    * matched keys, only THEIR segments rewrite — survivors (read
    * through any tombstones) land in the same fresh segment as the
    * updates, untouched segments keep their identity. A micro-batch
    * upsert into a 100 TB table therefore costs O(matched files +
    * batch), not O(table) — and downstream file-diff consumers (change
    * feed, incremental MV refresh) stay O(delta). */
  def merge(updates: DataFrame, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "merge requires at least one key column")
    import org.apache.spark.sql.functions.col
    val snap = snapshot()
    val prev = snap.map(_._2).getOrElse(Seq.empty)
    require(prev.nonEmpty, s"no committed snapshot at $path")
    val dvs = liveDvEntries(prev)
    val k = updates.select(keyCols.map(col): _*)
    // one scan, bounded output: at most one rel path per live file
    val hitFiles = scanSegments(prev, dvs, keepPos = true)
      .join(k, keyCols, "left_semi")
      .select(col("__graft_f")).distinct()
      .collect().map(_.getString(0)).toSet
    val affected = prev.filter(seg => hitFiles.exists(_.startsWith(s"$seg/")))
    val kept = prev.filterNot(affected.contains)
    val merged =
      if (affected.isEmpty) updates
      else scanSegments(affected, dvs, keepPos = false)
        .join(k, keyCols, "left_anti")
        // allowMissingColumns: the affected segments may predate a
        // schema evolution (S7) — survivors null-fill columns only the
        // updates carry, and vice versa, instead of failing the merge
        .unionByName(updates, allowMissingColumns = true)
    val seg = writeSegment(merged)
    val v = commit(kept :+ seg, "merge", base = snap.map(_._1).getOrElse(0L))
    mirrorDeltaLog(v, "merge", added = segmentFiles(seg),
      removed = affected.flatMap(segmentFiles).map(_._1),
      schemaJson = merged.schema.json)
  }

  /** Key-set delete: remove every row whose key appears in `keys` —
    * the DELETE half of a CDC apply. Semi/anti-join, not isin: the key
    * set is a DataFrame of any size, never collected to the driver.
    * Narrowed like [[deleteWhere]]: only segments holding matched keys
    * rewrite; one atomic commit. */
  def deleteMatching(keys: DataFrame, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "deleteMatching requires at least one key column")
    import org.apache.spark.sql.functions.col
    val k = keys.select(keyCols.map(col): _*)
    deleteCore(_.join(k, keyCols, "left_semi"),
      _.join(k, keyCols, "left_anti"))
  }

  // ---- Delta-protocol commit mirror -------------------------------------

  /** Every commit is mirrored as a Delta-protocol transaction-log entry
    * under `_delta_log/` (ECMA-404 JSON actions per the public Delta
    * protocol: protocol + metaData at version 0, add/remove per commit,
    * relative data-file paths) — so a real Delta reader pointed at the
    * table root resolves the same snapshots this class serves. The
    * runtime image carries no delta jar (verified), so conformance is
    * asserted structurally in IoSpec rather than via a reader round-trip:
    * contiguous versions, every live file added exactly once, overwrites
    * remove the full prior snapshot. */
  private def deltaLogDir = Paths.get(path, "_delta_log")

  /** (relative path, size bytes) of a segment's parquet data files. */
  private def segmentFiles(seg: String): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    val segDir = Paths.get(path, seg)
    listDir(segDir)
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(p => (s"$seg/${p.getFileName}", Files.size(p)))
      .sortBy(_._1)
  }

  private def jsonEsc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"
    case '\n' => "\\n"; case '\r' => "\\r"; case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `committedVer` is the manifest version [[commit]] just RETURNED
    * for the commit this call mirrors — the mirror number is that
    * minus one (manifest 1-based, mirror 0-based). Threading the
    * return value is load-bearing three ways: a listing max+1 would
    * re-issue numbers after log retention; a file count would do the
    * same; and RE-READING `this.version` here would race any other
    * commit landing between the commit and its mirror (two CAS
    * commits can both succeed at consecutive versions — contract-
    * violating but undetected when they serialize cleanly — and the
    * re-read would then stamp this entry with the OTHER commit's
    * number, silently replacing its mirror). The caller's own version
    * is immune to all three; a crash before this call leaves a GAP,
    * which [[repairMirror]] backfills from the commit files (and an
    * unhealable one surfaces loudly in the contiguity checks instead
    * of shifting numbers). */
  private def mirrorDeltaLog(committedVer: Long, mode: String,
      added: Seq[(String, Long)], removed: Seq[String],
      schemaJson: String, dataChange: Boolean = true,
      userMetadata: String = ""): Unit = {
    Files.createDirectories(deltaLogDir)
    val version = committedVer - 1
    repairMirrorUpTo(version - 1)
    writeMirrorEntry(version, mode, added, removed, schemaJson,
      dataChange, userMetadata)
  }

  /** Backfill delta-log mirror entries whose manifest commit landed
    * but whose mirror write was lost to a crash. [[mirrorDeltaLog]]
    * derives every mirror number from its own just-committed manifest
    * version, so a commit→mirror crash leaves a numbering GAP, never
    * a silent desync — and a gap is healable: the CAS commit files
    * record each version's mode, idempotence tag and segment set, so
    * the missing entry's add/remove actions (and its userMetadata —
    * the append tag / dv-sidecar pointer) reconstruct exactly from
    * the segment diff against the prior version. Heals only what it
    * can prove: both commit files must still exist (vacuum keeps
    * superseded ones for graceMs — far longer than any crash→restart
    * window) and every diffed segment dir must still be on disk; an
    * unprovable gap stays and fails the contiguity checks loudly
    * instead of guessing. A healed entry re-emits no metaData action
    * (it reuses the last-emitted schema; if the lost commit evolved
    * the schema, the NEXT real commit re-emits it — the sidecar was
    * never advanced). Writer-side only, per the single-writer
    * contract: called by the streaming sink before index maintenance
    * (`BronzeIngest.indexedIngestBatch`) and by every mirror write
    * that notices its predecessor missing. */
  def repairMirror(): Unit = repairMirrorUpTo(version - 1, fastPath = false)

  /** `fastPath` skips the scan when the newest expected entry exists —
    * right for the inline per-commit call (its gaps are RECENT, at
    * `limit` itself). The public [[repairMirror]] always scans: an
    * interior gap whose first heal attempt failed TRANSIENTLY (a
    * backfill error is swallowed by design) must be retried — the
    * streaming sink calls repairMirror() every batch, so such a gap
    * self-heals on the next trigger; standalone writers can invoke it
    * after an incident. The scan is one directory listing — the same
    * cost class as every tag scan on these paths. */
  private def repairMirrorUpTo(limit: Long,
      fastPath: Boolean = true): Unit = {
    if (limit < 0) return
    if (fastPath &&
        Files.exists(deltaLogDir.resolve(f"$limit%020d.json"))) return
    Files.createDirectories(deltaLogDir)
    val existing = listDir(deltaLogDir).map(_.getFileName.toString)
      .filter(_.matches("\\d{20}\\.json")).map(_.dropRight(5).toLong)
    // entries below the oldest retained one were PRUNED by retention,
    // not lost to a crash — only fill above it
    val floor = existing.minOption.getOrElse(0L)
    val have = existing.toSet
    (floor to limit).filterNot(have.contains)
      .foreach(backfillMirrorEntry)
  }

  /** One gap entry, reconstructed from commit files g and g+1 (mirror
    * g records the transition INTO manifest version g+1). Best-effort
    * by contract: ANY failure (unreadable/corrupt commit file, torn
    * escape in a tag, IO error mid-write) means the gap is unprovable
    * and stays — swallowing here is what keeps a healing attempt from
    * wedging every future commit of the table, since this runs inside
    * each mirror write; the un-healed gap still fails the contiguity
    * checks loudly downstream. */
  private def backfillMirrorEntry(g: Long): Unit =
    try backfillMirrorEntryCore(g)
    catch { case scala.util.control.NonFatal(_) => () }

  private def backfillMirrorEntryCore(g: Long): Unit = {
    val after = commitFile(g + 1)
    if (!Files.exists(after)) return
    val (mode, segs, tag) = parseCommitFields(Files.readString(after))
    val prevSegs: Seq[String] =
      if (g == 0) Seq.empty
      else if (Files.exists(commitFile(g)))
        parseCommitFields(Files.readString(commitFile(g)))._2
      else return
    val addedSegs = segs.filterNot(prevSegs.contains)
    val removedSegs = prevSegs.filterNot(segs.contains)
    if ((addedSegs ++ removedSegs)
        .exists(s => !Files.isDirectory(Paths.get(path, s)))) return
    val added = addedSegs.flatMap(segmentFiles)
    val removed = removedSegs.flatMap(segmentFiles).map(_._1)
    // op + userMetadata exactly as the lost write would have emitted
    // them: dv deletes mirror as op "delete" whose userMetadata names
    // the sidecar dir (stored as the commit's tag for this purpose);
    // physical rewrites mirror with dataChange=false
    val op = if (mode == "delete-dv") "delete" else mode
    writeMirrorEntry(g, op, added, removed,
      schemaJson = backfillSchema(added),
      dataChange = mode != "compact" && mode != "reorg",
      userMetadata = tag, allowCheckpoint = false)
  }

  /** Schema for a backfilled mirror entry: the sidecar's last-emitted
    * schema when present (⇒ no spurious metaData action), else — a
    * first-commit backfill on a log with no sidecar yet — the parquet
    * footer schema of the entry's own files. */
  private def backfillSchema(added: Seq[(String, Long)]): String =
    readMetaSidecar().map(_._2).filter(_.nonEmpty).getOrElse {
      if (added.isEmpty) read().schema.json
      else spark.read.parquet(
        added.map { case (f, _) => s"$path/$f" }: _*).schema.json
    }

  private def metaSidecar = deltaLogDir.resolve(".graft_table_meta")

  /** (table id, last-emitted schema) from the mirror's meta sidecar —
    * the one reader [[writeMirrorEntry]] and [[backfillSchema]] share. */
  private def readMetaSidecar(): Option[(String, String)] =
    if (!Files.exists(metaSidecar)) None
    else {
      val ls = Files.readString(metaSidecar).split("\n", 2)
      Some((ls(0), if (ls.length > 1) ls(1) else ""))
    }

  /** (mode, segments, unescaped tag) of a commit/manifest JSON. */
  private def parseCommitFields(s: String): (String, Seq[String], String) = {
    val mode = """"mode":"([^"]*)"""".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse("")
    val tag = """"tag":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(s)
      .map(m => jsonUnesc(m.group(1))).getOrElse("")
    (mode, parseSegments(s), tag)
  }

  /** Inverse of [[jsonEsc]] (handles every escape it emits). */
  private def jsonUnesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb += '"'
          case '\\' => sb += '\\'
          case 'n' => sb += '\n'
          case 'r' => sb += '\r'
          case 't' => sb += '\t'
          case 'u' =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 4
          case o => sb += o
        }
        i += 2
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private def writeMirrorEntry(version: Long, mode: String,
      added: Seq[(String, Long)], removed: Seq[String],
      schemaJson: String, dataChange: Boolean, userMetadata: String,
      allowCheckpoint: Boolean = true): Unit = {
    val now = System.currentTimeMillis()
    // stable table id + last-emitted schema live in a sidecar so that
    // schema-evolving appends (S7) re-emit metaData — a Delta reader
    // resolves the LATEST metaData action, and without this an evolved
    // column would be silently dropped by readers of the mirror.
    // Fallback for logs predating the sidecar: recover both from the
    // newest metaData action already in the log (keeps the table id
    // stable — Delta requires one id for the log's lifetime).
    val fromSidecar = readMetaSidecar()
    val sidecarMissing = fromSidecar.isEmpty
    val (tableId, lastSchema) = fromSidecar.getOrElse(
      recoverMetaFromLog().getOrElse(
        (java.util.UUID.randomUUID().toString, "")))
    // the table's schema is the MERGE across live segments (read uses
    // mergeSchema), so an append whose frame lacks a previously-evolved
    // column must NOT narrow the emitted schemaString; overwrite/delete
    // replace the snapshot, so their frame schema IS the table schema
    val effectiveSchema =
      if (mode == "append") mergeSchemaJson(lastSchema, schemaJson)
      else schemaJson
    val sb = new StringBuilder
    if (version == 0)
      sb ++= s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}\n"""
    val emitMeta = version == 0 || effectiveSchema != lastSchema
    if (emitMeta) {
      sb ++= s"""{"metaData":{"id":"$tableId",""" +
        s""""format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${jsonEsc(effectiveSchema)}",""" +
        s""""partitionColumns":[],"configuration":{},""" +
        s""""createdTime":$now}}\n"""
    }
    val um = if (userMetadata.isEmpty) ""
      else s""","userMetadata":"${jsonEsc(userMetadata)}""""
    sb ++= s"""{"commitInfo":{"timestamp":$now,"operation":"${mode.toUpperCase}"$um}}\n"""
    removed.foreach { f =>
      sb ++= s"""{"remove":{"path":"${jsonEsc(f)}","deletionTimestamp":$now,""" +
        s""""dataChange":$dataChange}}\n"""
    }
    added.foreach { case (f, size) =>
      sb ++= s"""{"add":{"path":"${jsonEsc(f)}","partitionValues":{},""" +
        s""""size":$size,"modificationTime":$now,"dataChange":$dataChange}}\n"""
    }
    val tmp = deltaLogDir.resolve(s".tmp.$now.${System.nanoTime()}")
    Files.writeString(tmp, sb.toString)
    Files.move(tmp, deltaLogDir.resolve(f"$version%020d.json"),
      StandardCopyOption.ATOMIC_MOVE)
    // periodic checkpoint: real Delta readers (and the reference's own
    // health probe, gold/bronzeToGold.py:17-42) expect _last_checkpoint
    // beyond ~10 commits so recovery is O(commits since checkpoint),
    // not O(log). Written AFTER the commit file: a crash in between
    // costs only a missed checkpoint, never a dangling pointer.
    // Suppressed on backfill (allowCheckpoint=false): writeCheckpoint
    // snapshots the CURRENT manifest, which is ahead of a healed
    // historical version — a checkpoint stamped with its number would
    // claim future files.
    if (allowCheckpoint && version > 0 && version % CheckpointInterval == 0)
      writeCheckpoint(version, tableId, effectiveSchema, now)
    // sidecar update AFTER the commit file lands, and atomically: a
    // crash in between only re-emits a harmless duplicate metaData on
    // the next commit (a stale sidecar can never SUPPRESS one). Also
    // (re)write it when it was absent — a legacy table would otherwise
    // re-scan the whole log on EVERY commit
    if (emitMeta || sidecarMissing) {
      val sctmp = deltaLogDir.resolve(s".meta.tmp.${System.nanoTime()}")
      Files.writeString(sctmp, s"$tableId\n$effectiveSchema")
      Files.move(sctmp, metaSidecar, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Checkpoint cadence in commits (Delta's own default is 10). */
  private val CheckpointInterval = 10

  /** Delta-protocol checkpoint: ONE parquet file holding the full
    * reconstructed state at `version` (protocol + metaData + one add
    * per live data file), plus the `_last_checkpoint` pointer. Live
    * state comes from the manifest snapshot (committed immediately
    * before the mirror runs), so no log replay is needed to produce it. */
  private def writeCheckpoint(version: Long, tableId: String,
      schemaJson: String, now: Long): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType)))
    val metaType = StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType),
        StructField("options", MapType(StringType, StringType))))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))
    val protoType = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val ckptSchema = StructType(Seq(
      StructField("protocol", protoType),
      StructField("metaData", metaType),
      StructField("add", addType)))
    val live = snapshot().map(_._2).getOrElse(Seq.empty).flatMap(segmentFiles)
    val empty = Map.empty[String, String]
    val rows: Seq[Row] =
      Row(Row(1, 2), null, null) +:
      Row(null, Row(tableId, Row("parquet", empty), schemaJson,
        Seq.empty[String], empty, now), null) +:
      live.map { case (p, sz) =>
        Row(null, null, Row(p, empty, sz, now, true)) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), ckptSchema)
    // Delta expects ONE file named NNN.checkpoint.parquet: write via a
    // temp dir, then move the single part file into place atomically
    val tmpDir = deltaLogDir.resolve(s".ckpt.tmp.${System.nanoTime()}")
    df.write.mode("overwrite").parquet(tmpDir.toString)
    val part = listDir(tmpDir)
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("checkpoint write produced no parquet"))
    Files.move(part, deltaLogDir.resolve(f"$version%020d.checkpoint.parquet"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(tmpDir)
    val lcTmp = deltaLogDir.resolve(s".lc.tmp.${System.nanoTime()}")
    Files.writeString(lcTmp, s"""{"version":$version,"size":${rows.size}}""")
    Files.move(lcTmp, deltaLogDir.resolve("_last_checkpoint"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Live data-file paths resolved exactly the way a real Delta reader
    * would: `_last_checkpoint` → checkpoint parquet state, then replay
    * ONLY the JSON commits after the checkpoint version. The hot read
    * path stays on the manifest; this exists to prove (IoSpec deletes
    * every pre-checkpoint commit file and resolution still succeeds)
    * that recovery cost is bounded by the checkpoint cadence, not the
    * log length. */
  def deltaSnapshotFiles(): Seq[String] = deltaSnapshotFiles(None)

  /** As above, bounded at `asOfVersion` (inclusive) when given — the
    * TIME-TRAVEL resolver: the state is reconstructed from the newest
    * checkpoint at or before the target plus the commits up to it.
    * Fails loudly (rather than silently under-resolving) when the
    * needed commit files are gone — time travel is bounded by log and
    * segment retention, exactly as in real Delta. */
  def deltaSnapshotFiles(asOfVersion: Option[Long]): Seq[String] = {
    import scala.jdk.CollectionConverters._
    // newest checkpoint at or before the target, by LISTING checkpoint
    // files (what real Delta does) rather than trusting only the
    // `_last_checkpoint` pointer: after log retention the commits
    // before some historical checkpoint are gone, and a time travel
    // below the newest checkpoint must seed from an intermediate one
    // instead of replaying from version 0
    val ckptVer: Option[Long] = listDir(deltaLogDir)
      .map(_.getFileName.toString)
      .flatMap(n => """^(\d{20})\.checkpoint\.parquet$""".r
        .findFirstMatchIn(n).map(_.group(1).toLong))
      .filter(v => asOfVersion.forall(v <= _))
      .maxOption
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    ckptVer.foreach { v =>
      spark.read
        .parquet(deltaLogDir.resolve(f"$v%020d.checkpoint.parquet").toString)
        .select("add.path").na.drop("all")
        .collect().foreach(r => live += r.getString(0))
    }
    val addRe = """"add":\{"path":"((?:[^"\\]|\\.)*)"""".r
    val rmRe = """"remove":\{"path":"((?:[^"\\]|\\.)*)"""".r
    val commits = listDir(deltaLogDir)
      .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
      .map(p => (p.getFileName.toString.stripSuffix(".json").toLong, p))
      .filter { case (v, _) =>
        ckptVer.forall(v > _) && asOfVersion.forall(v <= _)
      }
      .sortBy(_._1)
    // contiguity: replay must cover (checkpoint, target] with no gaps,
    // else the reconstruction would silently miss adds/removes
    asOfVersion.foreach { target =>
      val expected = (ckptVer.getOrElse(-1L) + 1) to target
      val got = commits.map(_._1)
      require(got == expected,
        s"cannot reconstruct version $target: have commits " +
          s"${got.mkString(",")} after checkpoint $ckptVer " +
          s"(log retention window exceeded?)")
    }
    commits.foreach { case (_, p) =>
      Files.readString(p).linesIterator.foreach { line =>
        rmRe.findFirstMatchIn(line).foreach(m => live -= jsonUnesc(m.group(1)))
        addRe.findFirstMatchIn(line).foreach(m => live += jsonUnesc(m.group(1)))
      }
    }
    live.toSeq.sorted
  }

  /** File-granularity change feed between delta-log `version`
    * (exclusive) and the current snapshot: rows in files added since
    * are tagged `_change_type` 'insert', rows in files removed since
    * 'delete'. A rewriting commit (delete-where / merge / compact)
    * reports at file granularity — unchanged rows of a rewritten file
    * appear as a delete+insert pair — the same contract as Delta's
    * version diff without the change-data feed enabled. Downstream
    * consumers that need net-row changes anti-join the two sides;
    * consumers of append-only tables (the ingest norm) get exact row
    * inserts with no rewrite noise. */
  /** The newest delta-log version the MIRROR can prove: the largest
    * mirror entry number reachable contiguously from the retention
    * floor (one directory listing). With uncoordinated OCC writers a
    * just-landed foreign commit's mirror entry may still be IN FLIGHT
    * for a few milliseconds — a maintainer that derives its fold head
    * from the manifest in that window publishes a basis claiming rows
    * the change feed cannot yet serve, and the window is lost forever.
    * Folding to THIS head instead leaves the in-flight tail for the
    * next trigger (ST18 chaos-proves the protocol). −1 when no mirror
    * entry exists yet. */
  def mirrorStableVersion: Long = {
    val nums = listDir(deltaLogDir).map(_.getFileName.toString)
      .filter(_.matches("\\d{20}\\.json")).map(_.dropRight(5).toLong)
      .sorted
    if (nums.isEmpty) -1L
    else {
      var h = nums.head
      nums.drop(1).foreach(n => if (n == h + 1) h = n)
      h
    }
  }

  def changesSince(version: Long): DataFrame =
    changesSinceCore(version, None)

  /** [[changesSince]] bounded at mirror version `upTo` (inclusive) —
    * the window (version, upTo] exactly. The maintainer protocol:
    * fold `changesSince(basis, head)` with
    * `head = min(version - 1, mirrorStableVersion)` so the fold and
    * the basis it publishes name the SAME provable state even while
    * other writers are mid-commit. */
  def changesSince(version: Long, upTo: Long): DataFrame =
    changesSinceCore(version, Some(upTo))

  private def changesSinceCore(version: Long,
      upTo: Option[Long]): DataFrame = {
    val before = deltaSnapshotFiles(Some(version)).toSet
    val now = upTo match {
      case Some(h) => deltaSnapshotFiles(Some(h)).toSet
      case None => deltaSnapshotFiles().toSet
    }
    // tombstone visibility matches the bound: "current" means ≤ upTo
    // when bounded, so a dv commit landing above the bound stays in
    // its own later window
    val dvAll = dvEntries
    val dvs = upTo match {
      case Some(h) => dvAll.filter(_.split(":", 2)(0).toLong <= h)
      case None => dvAll
    }
    val dvAtV = dvs.filter(_.split(":", 2)(0).toLong <= version)
    val dvNew = dvs.filter(_.split(":", 2)(0).toLong > version)
    // inserts: rows of files added since, as visible NOW (all current
    // tombstones applied — a row added then dv-deleted inside the
    // window nets to nothing). deletes from removed files: rows as
    // visible at `version` (tombstones at-or-before it applied).
    // each scan covers a known file subset, so only the dv entries
    // whose touch set intersects it are opened (bounded like read())
    def segsOf(files: Iterable[String]) = files.map(_.split("/")(0)).toSet
    val addedF = (now -- before).toSeq.sorted
    val removedF = (before -- now).toSeq.sorted
    val inserts =
      if (addedF.isEmpty) None
      else Some(scanPaths(addedF.map(f => s"$path/$f"),
        touchingDv(dvs, segsOf(addedF)), keepPos = false)
        .withColumn("_change_type", lit("insert")))
    val fileDeletes =
      if (removedF.isEmpty) None
      else Some(scanPaths(removedF.map(f => s"$path/$f"),
        touchingDv(dvAtV, segsOf(removedF)), keepPos = false)
        .withColumn("_change_type", lit("delete")))
    // row-level deletes: tombstones committed inside the window on
    // files live at BOTH ends — the rows still exist physically, so
    // the feed can state them exactly (real Delta needs CDF for this)
    val common = (before & now).toSeq.sorted
    val dvNewTouching =
      if (common.isEmpty) Seq.empty else touchingDv(dvNew, segsOf(common))
    val dvDeletes =
      if (dvNewTouching.isEmpty || common.isEmpty) None
      else Some(scanPaths(common.map(f => s"$path/$f"),
          touchingDv(dvAtV, segsOf(common)), keepPos = true)
        .join(dvFrame(dvNewTouching), Seq("__graft_f", "__graft_r"),
          "left_semi")
        .drop("__graft_f", "__graft_r")
        .withColumn("_change_type", lit("delete")))
    alignToSnapshotSchema(Seq(inserts, fileDeletes, dvDeletes).flatten
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
      .getOrElse(read().withColumn("_change_type", lit("insert")).limit(0)))
  }

  /** Present a change-feed window in the TABLE's current merged schema
    * — exactly as [[read]] shows the same rows. A window's own files
    * see only their slice of an EVOLVED schema: a batch written before
    * a widening lacks the new column (a maintainer folding the raw
    * subset would throw on it, or worse, silently aggregate a frame
    * shaped differently from the table it mirrors), and a removed
    * file can carry a column no live file has. Null-fill the missing
    * ones (what mergeSchema does table-wide), project away the
    * obsolete ones, keep `_change_type`. No-op (and free) when the
    * window's schema already matches. An empty snapshot (nothing to
    * align to) passes through. */
  private def alignToSnapshotSchema(df: DataFrame): DataFrame = {
    if (snapshot().map(_._2).getOrElse(Seq.empty).isEmpty) return df
    val tbl = read().schema
    if (tbl.fields.map(_.name).toSeq == df.columns.toSeq.filter(_ != "_change_type"))
      return df
    val have = df.columns.toSet
    val filled = tbl.fields.foldLeft(df)((d, f) =>
      if (have(f.name)) d
      else d.withColumn(f.name, lit(null).cast(f.dataType)))
    filled.select(tbl.fields.map(f => col(f.name)).toSeq :+
      col("_change_type"): _*)
  }

  /** Time travel: the table as of delta-log `version` (0-based — the
    * n-th commit). Data files must still exist (vacuum's grace window
    * bounds how far back travel reaches, as in real Delta). */
  def readAt(version: Long): DataFrame = {
    val files = deltaSnapshotFiles(Some(version))
    require(files.nonEmpty,
      s"version $version of $path resolves to no data files")
    // tombstones are version-scoped: apply exactly the dv commits at or
    // before the target (entries for files dead at that version are
    // inert — their keys match nothing in the scan)
    val dvs = dvEntries.filter(_.split(":", 2)(0).toLong <= version)
    scanPaths(files.map(f => s"$path/$f"), dvs, keepPos = false)
  }

  /** The table's STABLE delta-log id (Delta requires one id for the
    * log's lifetime) — and therefore this table's LINEAGE identity: a
    * deleted-and-recreated table under the same path mints a fresh id.
    * The incremental index maintainers record it next to their basis so
    * a recreated source fails loudly even when the new lineage's head
    * has caught up past the recorded version (a version-only guard
    * cannot see that). None before the first commit. */
  def tableId: Option[String] = {
    val sidecar = deltaLogDir.resolve(".graft_table_meta")
    if (Files.exists(sidecar))
      Files.readString(sidecar).split("\n", 2).headOption.map(_.trim)
        .filter(_.nonEmpty)
    else recoverMetaFromLog().map(_._1)
  }

  /** Newest (table id, schemaString) already in the log, if any. */
  private def recoverMetaFromLog(): Option[(String, String)] = {
    import scala.jdk.CollectionConverters._
    if (!Files.isDirectory(deltaLogDir)) return None
    val metaRe =
      """"metaData":\{"id":"([^"]+)".*"schemaString":"((?:[^"\\]|\\.)*)"""".r
    // LAZY newest-first scan: stops at the first (newest) commit that
    // carries a metaData action — version 0 always does, so this is
    // bounded by the distance to the last schema change, not log size
    listDir(deltaLogDir)
      .filter(_.getFileName.toString.matches("\\d{20}\\.json"))
      .sortBy(_.getFileName.toString).reverseIterator
      .flatMap(p => Files.readString(p).linesIterator
        .flatMap(metaRe.findFirstMatchIn(_))
        .map(m => (m.group(1), jsonUnesc(m.group(2)))))
      .nextOption()
  }

  /** Field-union of two schema JSONs: fields of the newer win on name
    * clash, previously-evolved columns are retained — matching what a
    * mergeSchema read serves. */
  private def mergeSchemaJson(prevJson: String, nextJson: String): String =
    if (prevJson.isEmpty) nextJson
    else {
      import org.apache.spark.sql.types.{DataType, StructType}
      val prev = DataType.fromJson(prevJson).asInstanceOf[StructType]
      val next = DataType.fromJson(nextJson).asInstanceOf[StructType]
      val extra = prev.fields.filterNot(f => next.fieldNames.contains(f.name))
      StructType(next.fields ++ extra).json
    }

  /** Reclaim storage the committed snapshot no longer needs.
    *
    * Always (bounded by the `graceMs` window — commit touches a
    * segment's mtime when dropping it, so grace runs from the moment a
    * reader could last have resolved it; readers holding a
    * pre-overwrite snapshot within the window keep their files):
    *   - segment dirs no snapshot references (+ their stats sidecars);
    *   - `_graft_dvlog` files and `_graft_dv` sidecar dirs no committed
    *     dv entry references (crash garbage, and — after a retention
    *     pass — retired history).
    *
    * With `retainVersions = Some(r)`, ALSO retire table history beyond
    * a retention horizon — Delta's own VACUUM contract: [[readAt]] /
    * [[changesSince]] stay exact for (at least) the `r` newest mirror
    * versions and error CLEANLY below the horizon; dv entries provably
    * inert for every retained version leave the manifest (their
    * sidecars become unreferenced and are reclaimed by the same pass),
    * and mirror commits + checkpoints below the horizon are deleted.
    * The horizon snaps DOWN to the newest delta-log checkpoint at or
    * before `head - r + 1` so every retained version still resolves
    * from a checkpoint + contiguous tail (no checkpoint that old yet →
    * retention is a no-op). This is what bounds a CDC-heavy table's
    * manifest, dvlog and sidecar footprint by the retention window
    * instead of its lifetime. External FULL-log replays
    * (tools/DeltaLogReplay) need the pruned commits and are forfeited
    * beyond the horizon, exactly like readAt. */
  def vacuum(graceMs: Long = 15 * 60 * 1000L,
      retainVersions: Option[Long] = None): Unit = {
    retainVersions.foreach(applyRetention)
    val live = snapshot().map(_._2).getOrElse(Seq.empty).toSet
    // WALL-CLOCK file mtimes, not the nanoTime stamp in the segment
    // name: nanoTime origins are arbitrary per JVM, so a name-stamp
    // comparison across a writer restart could delete a seconds-old
    // segment (or never reclaim old ones)
    val cutoff = System.currentTimeMillis() - graceMs
    val dir = Paths.get(path)
    listDir(dir)
      .filter(p => p.getFileName.toString.startsWith("seg-"))
      .filterNot(p => live(p.getFileName.toString))
      .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
      .foreach { p =>
        deleteRecursively(p)
        // the segment's stats sidecar dies with it
        deleteRecursively(statsDir.resolve(p.getFileName.toString))
      }
    // unreferenced dv bookkeeping: dvlog files the manifest doesn't
    // name and tombstone sidecar dirs no committed entry names
    val (_, refFiles) = dvState
    val refSet = refFiles.toSet
    listDir(dvlogDir)
      .filterNot(p => refSet(p.getFileName.toString))
      .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
      .foreach(Files.deleteIfExists(_))
    val refDvDirs = dvEntries.map(parseDv(_).dir).toSet
    listDir(dvRoot)
      .filterNot(p => refDvDirs(p.getFileName.toString))
      .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
      .foreach(deleteRecursively)
    // superseded CAS commit files: resolution only walks FORWARD from
    // the POINTER, so only files strictly below the pointer's own
    // version are provably never consulted again. Bounding by the
    // RESOLVED head would be wrong: with the pointer lagging (a writer
    // died between CAS and pointer rewrite), files between pointer and
    // head are the very walk the next read performs — deleting one
    // would silently regress the table to the pointer AND let a later
    // commit re-claim the deleted version, forking history. Files at
    // or above the pointer stay; stranded .tmp link sources die too.
    val ptrVer =
      if (!Files.exists(manifest)) -1L
      else """"version":(\d+)""".r
        .findFirstMatchIn(Files.readString(manifest))
        .map(_.group(1).toLong).getOrElse(-1L)
    listDir(commitsDir)
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith(".tmp.") ||
          (n.matches("\\d{20}\\.json") && n.dropRight(5).toLong < ptrVer)
      }
      .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
      .foreach(Files.deleteIfExists(_))
  }

  /** Retention core (see [[vacuum]]): compute the horizon checkpoint,
    * drop dv entries inert for every retained version, and prune the
    * mirror log below the horizon. Rewrites the manifest IN PLACE
    * (same version — only dv bookkeeping changes; single-writer
    * contract, atomic rename). This is the one documented exception
    * to the version-increments-per-commit invariant — see [[version]]:
    * no retained version's visible rows change, so content caches
    * keyed by version stay valid. */
  private def applyRetention(retain: Long): Unit = {
    require(retain >= 1, s"retainVersions must be >= 1, got $retain")
    val snap = snapshot()
    if (snap.isEmpty) return
    val (ver, segs) = snap.get
    val head = ver - 1 // newest mirror version
    val requested = head - retain + 1 // oldest version asked to keep
    if (requested <= 0) return
    // snap the horizon DOWN to a checkpoint so every retained version
    // reconstructs from checkpoint + contiguous tail
    val ckpts = listDir(deltaLogDir)
      .map(_.getFileName.toString)
      .flatMap(n => """^(\d{20})\.checkpoint\.parquet$""".r
        .findFirstMatchIn(n).map(_.group(1).toLong))
    val cut = ckpts.filter(_ <= requested).maxOption.getOrElse(return)
    if (cut <= 0) return
    // dv entries needed by some retained version v >= cut: entries at
    // or after the cut, plus older entries whose touched segments are
    // live AT the cut (segment liveness is a contiguous interval, so a
    // file live at any v >= cut that an old entry touches is live at
    // the cut too). Legacy entries with no recorded touch set are
    // conservatively kept.
    val segsAtCut = deltaSnapshotFiles(Some(cut)).map(_.split("/")(0)).toSet
    val all = dvEntries
    val kept = all.filter { e =>
      val d = parseDv(e)
      d.ver >= cut || d.touched.forall(_.exists(segsAtCut.contains))
    }
    val (inline, dvFiles) = dvState
    if (kept.size != all.size || inline.nonEmpty || dvFiles.size > 1) {
      val consolidated =
        if (kept.isEmpty) Seq.empty[String]
        else Seq(writeDvlogFile(kept))
      val tmp = Paths.get(path, s"_graft_manifest.tmp.${System.nanoTime()}")
      Files.writeString(tmp,
        manifestJson(ver, "vacuum", segs, Seq.empty, consolidated))
      Files.move(tmp, manifest, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      // superseded dvlog files stay on disk for readers holding the
      // previous manifest; touched so vacuum's sweep (which runs right
      // after this, in the same call) grants them the full graceMs
      // window from unreference time
      touchDvlogFiles(dvFiles)
    }
    // prune the mirror log below the horizon checkpoint; readAt below
    // it now fails the contiguity check with a clean retention error
    listDir(deltaLogDir).foreach { p =>
      val n = p.getFileName.toString
      val v = """^(\d{20})\.json$""".r.findFirstMatchIn(n)
        .orElse("""^(\d{20})\.checkpoint\.parquet$""".r.findFirstMatchIn(n))
        .map(_.group(1).toLong)
      if (v.exists(_ < cut)) Files.deleteIfExists(p)
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}

object ManagedParquetTable {
  /** Process-wide merged-schema cache keyed by the (immutable,
    * nanotime-unique) path set of a scan — see `mergedSchemaOf`. */
  private[io] val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** Size gate for loading dv tombstone sidecars driver-side (see
    * `dvFrame`): below this total parquet size the set becomes a
    * LocalRelation; above it the distributed scan path is kept. */
  private[io] val DvLocalBytes = 8L << 20

  /** Entry gate for applying a dv tombstone set as a row-local literal
    * predicate instead of an anti-join (see `scanPaths`): GetMapValue
    * probes the literal map linearly per row, so only a tiny set may
    * ride as a predicate; between this and [[DvLocalBytes]] the set
    * anti-joins as a LocalRelation, above both it scans distributed. */
  private[io] val DvPredicateMaxEntries = 1024

  private[io] val dvSchema = StructType(Seq(
    StructField("__graft_f", StringType, nullable = false),
    StructField("__graft_r",
      org.apache.spark.sql.types.LongType, nullable = false)))
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

  /** Hardened StAX factory for untrusted workbook XML: DTDs and external
    * entities off → no XXE (local-file read / SSRF) and no entity-
    * expansion bombs at ingest. */
  private def secureFactory(): javax.xml.stream.XMLInputFactory = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(
      javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** All cells of sheet 1 as text, row-major, sparse cells = null. */
  private def parseSheet(path: String): Array[Array[String]] = {
    val zip = new java.util.zip.ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(Array.empty[String])
      val dateStyles = Option(zip.getEntry("xl/styles.xml"))
        .map(e => parseStyles(zip.getInputStream(e)))
        .getOrElse(Array.empty[Boolean])
      val sheetEntry = Option(zip.getEntry("xl/worksheets/sheet1.xml"))
        .orElse {
          import scala.jdk.CollectionConverters._
          zip.entries().asScala.find(e =>
            e.getName.startsWith("xl/worksheets/") && e.getName.endsWith(".xml"))
        }
        .getOrElse(throw new IllegalArgumentException(s"no worksheet in $path"))
      parseSheetXml(zip.getInputStream(sheetEntry), shared, dateStyles)
    } finally zip.close()
  }

  /** sharedStrings.xml: one entry per <si>, rich-text runs concatenated. */
  private def parseSharedStrings(in: java.io.InputStream): Array[String] = {
    val r = secureFactory().createXMLStreamReader(in)
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

  /** xl/styles.xml → per-cellXf "is a date/time format" flags, indexed by
    * the cell's s= attribute. Builtin date numFmtIds (ECMA-376 §18.8.30)
    * plus custom formatCodes matched by a date-token heuristic. */
  private def parseStyles(in: java.io.InputStream): Array[Boolean] = {
    val builtinDate = ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet
    val r = secureFactory().createXMLStreamReader(in)
    val customDate = scala.collection.mutable.Set.empty[Int]
    val xfs = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    var inCellXfs = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "numFmt" =>
              val id = Option(r.getAttributeValue(null, "numFmtId"))
                .map(_.toInt).getOrElse(-1)
              val code = Option(r.getAttributeValue(null, "formatCode"))
                .getOrElse("")
              if (isDateFormatCode(code)) customDate += id
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              val id = Option(r.getAttributeValue(null, "numFmtId"))
                .map(_.toInt).getOrElse(0)
              xfs += (builtinDate(id) || customDate(id))
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "cellXfs") inCellXfs = false
        case _ =>
      }
    }
    r.close()
    xfs.toArray
  }

  /** Date-token heuristic on a custom format code: strip quoted literals
    * and [..] blocks (colors, locale, elapsed markers), then any y/m/d/h
    * token marks a date/time format. Number formats (0.00, #,##0 $, 0%,
    * 0.00E+00, General) contain none of these. */
  private def isDateFormatCode(code: String): Boolean =
    code.replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
      .exists(c => c == 'y' || c == 'm' || c == 'd' || c == 'h' ||
        c == 'Y' || c == 'M' || c == 'D' || c == 'H')

  /** Excel serial-number date/time → ISO-8601 string (what the typed
    * schema overload's DateType/TimestampType casts expect). 1900 date
    * system, base 1899-12-30 (openpyxl's convention; the phantom
    * 1900-02-29 affects only serials < 61, prehistoric for real data).
    * Whole serials → yyyy-MM-dd; fractional → yyyy-MM-dd HH:mm:ss. */
  private def serialToIso(raw: String): String = {
    val d = raw.trim.toDouble
    val days = math.floor(d).toLong
    val secs = math.round((d - days) * 86400.0)
    val date = java.time.LocalDate.of(1899, 12, 30).plusDays(days)
    if (secs == 0L) date.toString
    else if (secs >= 86400L) date.plusDays(1).toString
    else date.atStartOfDay.plusSeconds(secs)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))
  }

  /** sheetData: rows of <c r="A1" s="3" t="s|str|inlineStr|b|n"><v>…</v></c>.
    * Numeric cells whose style is a date format are converted from Excel
    * serials to ISO strings; inline rich-text runs are concatenated
    * across <r><t>…</t></r> and emitted once per cell at </is>. */
  private def parseSheetXml(in: java.io.InputStream, shared: Array[String],
      dateStyles: Array[Boolean]): Array[Array[String]] = {
    val r = secureFactory().createXMLStreamReader(in)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellCol = 0
    var cellType = ""
    var cellDate = false
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
              cellDate = Option(r.getAttributeValue(null, "s"))
                .map(_.toInt).exists(i =>
                  i >= 0 && i < dateStyles.length && dateStyles(i))
              v.clear() // one accumulator per cell (multi-run inlineStr)
            case "v" | "t" => inV = true
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
                case _ if cellDate && cellType == "n" =>
                  try serialToIso(v.toString)
                  catch { case _: NumberFormatException => v.toString }
                case _ => v.toString
              })
            case "t" =>
              inV = false // accumulate; inlineStr cells emit at </is>
            case "is" =>
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
