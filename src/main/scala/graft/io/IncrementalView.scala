package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate materialized view over a [[ManagedParquetTable]].
  *
  * A warehouse-scale table cannot re-aggregate 100 TB on every ingest
  * batch. `refresh()` therefore diffs the table's delta-log file
  * snapshot against the file set the stored state was computed from
  * (its *basis*): appended files are partial-aggregated alone and
  * merged into the state — O(new data), never O(table). Any commit
  * that removed files (overwrite, delete, merge, compact) makes the
  * stored partials unattributable, so refresh falls back to ONE full
  * recompute and resumes incrementally from there.
  *
  * Only decomposable aggregates are offered — count / sum / min / max
  * (avg is sum÷count at read time), plus `hll` distinct-count SKETCH
  * state (exact distinct is not decomposable; its HLL sketch is) —
  * because exactly these merge by re-aggregating partials. The merge is the same `groupBy` the
  * engine runs everywhere else: union the state with the delta
  * partials and fold (sum of sums, sum of counts, min of mins, max of
  * maxes); Catalyst plans it as one map-side-combined shuffle of
  * |groups| rows, not |rows|.
  *
  * Crash safety mirrors the table itself (reference behavior:
  * `bronze/redPandaToDeltaLake.py` relies on Delta's atomic commit):
  * state parquet and its basis publish together through one
  * write-temp-then-rename manifest flip, so an interrupted refresh
  * leaves the previous consistent (state, basis) pair and re-running
  * refresh re-derives the same delta — idempotent, never
  * double-counted. Superseded state dirs are swept on later refreshes
  * after a grace window (vacuum semantics: a concurrent reader that
  * resolved the old manifest can still finish).
  *
  * The view *definition* (group keys + agg specs) lives with the
  * caller, as in code-defined-view systems: the manifest records only
  * state location and basis files.
  */
final class IncrementalAggView(
    spark: SparkSession,
    tablePath: String,
    viewPath: String,
    groupCols: Seq[String],
    aggs: Seq[IncrementalAggView.AggSpec]) {
  import IncrementalAggView._

  require(groupCols.nonEmpty, "at least one group column")
  require(aggs.nonEmpty, "at least one aggregate")
  require(aggs.map(_.outName).distinct.size == aggs.size,
    "aggregate output names must be unique")

  private def table = new ManagedParquetTable(spark, tablePath)
  private def manifest = Paths.get(viewPath, "_graft_view_manifest")

  /** How the last refresh() on this instance resolved:
    * "full" | "incremental" | "noop" | "" (never ran). */
  @volatile var lastRefresh: String = ""

  /** Current materialized state: groupCols ++ one column per AggSpec.
    * `hll` columns are raw binary sketches here — see [[readFinal]].
    * Fails if the view has never been refreshed. */
  def read(): DataFrame = {
    val (state, _) = loadManifest().getOrElse(
      sys.error(s"view at $viewPath has never been refreshed"))
    spark.read.parquet(s"$viewPath/$state")
  }

  /** [[read]] with sketch states finalized: `hll` columns become their
    * distinct-count estimates (long); all other columns pass through. */
  def readFinal(): DataFrame = {
    val cols = groupCols.map(col) ++ aggs.map {
      case AggSpec("hll", _, out) =>
        expr(s"hll_sketch_estimate(`$out`)").as(out)
      case a => col(a.outName)
    }
    read().select(cols: _*)
  }

  /** Bring the state up to the table's current snapshot. */
  def refresh(): Unit = {
    val nowFiles = table.deltaSnapshotFiles().toSet
    require(nowFiles.nonEmpty, s"table at $tablePath has no data files")
    loadManifest() match {
      case Some((state, basis)) if (basis -- nowFiles).isEmpty =>
        val added = (nowFiles -- basis).toSeq.sorted
        if (added.isEmpty) { lastRefresh = "noop"; return }
        val delta = partialAgg(readFiles(added))
        val merged = mergePartials(
          spark.read.parquet(s"$viewPath/$state"), delta)
        publish(merged, nowFiles)
        lastRefresh = "incremental"
      case _ =>
        // no state yet, or files were removed since the basis:
        // partials cannot be subtracted — recompute once from scratch
        publish(partialAgg(readFiles(nowFiles.toSeq.sorted)), nowFiles)
        lastRefresh = "full"
    }
  }

  // ---- internals ---------------------------------------------------------

  private def readFiles(rel: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(rel.map(f => s"$tablePath/$f"): _*)

  /** One partial-aggregation pass producing the state schema. */
  private def partialAgg(df: DataFrame): DataFrame = {
    val exprs = aggs.map {
      case AggSpec("count", _, out) => count(lit(1)).as(out)
      case AggSpec("sum", in, out) => sum(col(in)).as(out)
      case AggSpec("min", in, out) => min(col(in)).as(out)
      case AggSpec("max", in, out) => max(col(in)).as(out)
      // distinct counts are NOT decomposable exactly, but their HLL
      // sketches are: register-wise max union makes per-file partials
      // mergeable, which is how a 100 TB table keeps daily-unique
      // metrics without ever rescanning history
      case AggSpec("hll", in, out) =>
        expr(s"hll_sketch_agg(`$in`)").as(out)
      case AggSpec(kind, _, _) =>
        sys.error(s"unsupported aggregate kind '$kind' " +
          "(decomposable kinds: count, sum, min, max, hll)")
    }
    df.groupBy(groupCols.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Fold two partial states: counts and sums add, min/max fold. */
  private def mergePartials(a: DataFrame, b: DataFrame): DataFrame = {
    val exprs = aggs.map {
      case AggSpec("count", _, out) => sum(col(out)).as(out)
      case AggSpec("sum", _, out) => sum(col(out)).as(out)
      case AggSpec("min", _, out) => min(col(out)).as(out)
      case AggSpec("max", _, out) => max(col(out)).as(out)
      case AggSpec("hll", _, out) =>
        expr(s"hll_union_agg(`$out`)").as(out)
      case AggSpec(kind, _, _) => sys.error(s"unsupported kind '$kind'")
    }
    a.unionByName(b).groupBy(groupCols.map(col): _*)
      .agg(exprs.head, exprs.tail: _*)
  }

  /** Atomically flip (state dir, basis) and sweep superseded state. */
  private def publish(df: DataFrame, basis: Set[String]): Unit = {
    Files.createDirectories(Paths.get(viewPath))
    val stateDir = s"state-${System.nanoTime()}"
    df.write.mode("overwrite").parquet(s"$viewPath/$stateDir")
    val json = s"""{"state":"$stateDir","basis":[""" +
      basis.toSeq.sorted.map("\"" + _ + "\"").mkString(",") + "]}"
    val tmp = Paths.get(viewPath, s"_graft_view_manifest.tmp.${System.nanoTime()}")
    Files.writeString(tmp, json)
    Files.move(tmp, manifest, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    sweep(keep = stateDir)
  }

  /** Remove unreferenced state-* dirs older than the grace window. */
  private def sweep(keep: String, graceMs: Long = 15 * 60 * 1000L): Unit = {
    val cutoff = System.currentTimeMillis() - graceMs
    val dir = Paths.get(viewPath)
    if (!Files.isDirectory(dir)) return
    val it = Files.list(dir).iterator()
    while (it.hasNext) {
      val p = it.next()
      val n = p.getFileName.toString
      if (n.startsWith("state-") && n != keep &&
          Files.getLastModifiedTime(p).toMillis < cutoff)
        deleteRecursively(p)
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val it = Files.list(p).iterator()
      while (it.hasNext) deleteRecursively(it.next())
    }
    Files.deleteIfExists(p)
  }

  /** (state dir, basis file set) from the committed manifest, if any. */
  private def loadManifest(): Option[(String, Set[String])] =
    if (!Files.exists(manifest)) None
    else {
      val s = Files.readString(manifest)
      val state = """"state":"([^"]+)"""".r.findFirstMatchIn(s)
        .map(_.group(1)).getOrElse(return None)
      val basis = """"basis":\[([^\]]*)\]""".r.findFirstMatchIn(s)
        .map(_.group(1).split(",").toSeq.map(_.trim.stripPrefix("\"")
          .stripSuffix("\"")).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty[String])
      Some((state, basis))
    }
}

object IncrementalAggView {
  /** One decomposable aggregate: kind ∈ {count, sum, min, max, hll};
    * inputCol is ignored for count. `hll` stores a mergeable binary
    * sketch, finalized to an estimate by [[IncrementalAggView.readFinal]]. */
  final case class AggSpec(kind: String, inputCol: String, outName: String)
}
