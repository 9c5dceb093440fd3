package graft.similarity

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.ManagedParquetTable

/** Persisted, incrementally-maintained IVF-PQ index — the
  * billion-vector ANN architecture ([[VectorFunctions.ivfPqTopK]],
  * FAISS IVFPQ / Jégou et al. TPAMI 2011) as a STORED artifact instead
  * of a per-run derivation. At 100 TB the encode pass (assign every
  * vector to its inverted list + PQ-encode it) is the dominant cost of
  * an IVF-PQ query; re-deriving it per search is O(corpus) where
  * O(delta) maintenance is available. This is the same lifecycle
  * template [[IncrementalVectorIndex]] applies to the flat quantized
  * index, applied to the engine's flagship ANN form. (Reference
  * behavior anchor: the reference re-derives gold outputs per run —
  * gold/bronzeToGold.py — viable at notebook scale only.)
  *
  * Three stored pieces under `indexPath`:
  *   - the inverted lists: a [[ManagedParquetTable]] of
  *     [[VectorFunctions.ivfPqEncode]] rows `(id, centroid_id, codes)`
  *     — m bytes of code per vector instead of 4·dim floats. Bulk
  *     writes range-cluster by `centroid_id` so each file covers a
  *     tight centroid range and the per-file min/max statistics
  *     sidecar (io/Layout.FileStats, the s21/s22 machinery) makes a
  *     probe plan OPEN only the files whose range intersects the
  *     probed lists — file-level inverted-list access, not a full
  *     index scan;
  *   - the frozen training artifacts: coarse centroids (nlist × dim)
  *     and PQ codebooks (m × ksub × dim/m) as immutable parquet dirs,
  *     published by atomic rename. Freezing them is what makes
  *     incremental maintenance EXACTLY rebuild-equivalent: given fixed
  *     centroids + codebooks, assignment and encoding are row-local,
  *     so encode(delta) ∪ stored ≡ encode(full) row-for-row (the
  *     standard IVF-PQ operating contract — FAISS trains once and
  *     add()s forever; retraining is an explicit offline rebuild);
  *   - a basis file recording the SOURCE table's delta-log version the
  *     index is current to ([[graft.io.BasisTracker]] — the one
  *     protocol all three incremental index maintainers share).
  *
  * `refresh()` follows the v16 template: inserts from
  * [[ManagedParquetTable.changesSince]] encode-and-append, deletes
  * drop as deletion-vector key tombstones (O(batch), never an index
  * rewrite), rewritten source files net to replace, and
  * `compactDeletes` keeps the index's tombstone list bounded. Crash
  * safety: the basis publishes only AFTER the index commits; a
  * replayed window drops-then-re-encodes the same keys — idempotent.
  *
  * `topK()` serves probes from the stored lists: the probed
  * centroid-id set (≤ nlist ids — coarse-quantizer planning state,
  * same driver-size class as the centroids themselves) pushes down as
  * `centroid_id IN (…)` through [[ManagedParquetTable.readWhere]], so
  * unprobed lists' files are never opened; scoring is the identical
  * ADC fold [[VectorFunctions.ivfPqTopK]] computes, so stored search
  * ≡ per-run search on the same live rows (IvfPqIndexSpec proves
  * both equivalences).
  */
final class IncrementalIvfPqIndex(spark: SparkSession,
    sourcePath: String, indexPath: String, m: Int, ksub: Int, dim: Int,
    idCol: String = "vec_id", vecCol: String = "embedding",
    rowsPerFile: Long = 100000L,
    maintenancePolicy: IvfPqMaintenancePolicy = IvfPqMaintenancePolicy())
    extends graft.io.IndexMaintainer {

  private def source = new ManagedParquetTable(spark, sourcePath)

  /** The inverted lists as a managed table. */
  val table = new ManagedParquetTable(spark, indexPath + "/lists")

  // no underscore prefix: Spark's hidden-path glob filter warns on
  // explicit roots that look hidden (the read still works, but the
  // noise is per-probe); nothing ever globs indexPath itself
  private def centroidsDir = Paths.get(indexPath, "centroids")
  private def codebooksDir = Paths.get(indexPath, "codebooks")

  private val tracker = new graft.io.BasisTracker(indexPath, sourcePath)

  /** How the last refresh() on this instance resolved:
    * "full" | "incremental" | "noop" | "" (never ran). */
  @volatile var lastRefresh: String = ""

  def basis: Option[Long] = tracker.basis

  def read(): DataFrame = { requireNoReorg(); table.read() }

  def isTrained: Boolean =
    Files.exists(centroidsDir) && Files.exists(codebooksDir)

  /** Persist the frozen training artifacts (once, before the first
    * refresh). `centroids`: (idCol, vecCol) rows, e.g. kmeansFit
    * output re-labeled or sampled corpus vectors; `codebooks`:
    * pqTrain's (sub, code, centroid). Callers choose the training
    * sample; at 100 TB training runs on a sample while encode runs on
    * everything — which is precisely why the artifacts freeze. */
  def train(centroids: DataFrame, codebooks: DataFrame): Unit = {
    require(!isTrained, s"index at $indexPath is already trained; " +
      "retraining requires an explicit rebuild (new index path)")
    writeFrozen(centroids.select(col(idCol), col(vecCol)), centroidsDir)
    writeFrozen(codebooks.select(col("sub"), col("code"), col("centroid")),
      codebooksDir)
  }

  def centroids: DataFrame = {
    // guarded like every other entry point: between reorg's lists
    // overwrite and its artifact swap these dirs hold the OLD
    // artifacts while the lists hold NEW codes — a caller composing
    // them directly (ivfPqEncode/ivfPqProbes) must refuse too
    requireNoReorg()
    require(isTrained, s"index at $indexPath is not trained")
    frozenFrame(centroidsDir)
  }

  def codebooks: DataFrame = {
    requireNoReorg()
    require(isTrained, s"index at $indexPath is not trained")
    frozenFrame(codebooksDir)
  }

  /** The frozen artifacts are quantizer DRIVER state by design — every
    * consumer either collects them into a literal (codebooks →
    * collectCodebook) or broadcasts them (centroids into the assign
    * cross-join) — yet a `spark.read.parquet` here made each refresh/
    * probe pay a scan job per read plus a broadcast-build job per
    * consuming join. Size-gated driver-local load into a LocalRelation
    * (same device as the dv/tombstone sidecars): the collect becomes
    * job-free and a BroadcastExchange over LocalTableScan builds
    * driver-side with no job. The gate (32 MB — generous for nlist×dim
    * + m·ksub·(dim/m) doubles) keeps a distributed fallback, though an
    * artifact that large would already be breaking the broadcast
    * consumers. Values are bit-identical: same parquet bytes, same
    * IEEE floats, row order immaterial to every consumer (codebooks
    * key by (sub, code); centroid joins are argmax-by-id). */
  private def frozenFrame(dir: Path): DataFrame =
    graft.io.SidecarIo.readLocalRows(Seq(dir),
        spark.sessionState.newHadoopConf(), maxBytes = 32L << 20) match {
      case Some((schema, rows)) =>
        import scala.jdk.CollectionConverters._
        spark.createDataFrame(rows.asJava, schema)
      case None => spark.read.parquet(dir.toString)
    }

  /** Immutable-publish: write to a temp dir, atomic-rename into place.
    * A crash mid-write leaves only the temp dir (never a half-visible
    * artifact); train() is not concurrent with itself by contract. */
  private def writeFrozen(df: DataFrame, dest: Path): Unit = {
    val tmp = Paths.get(s"$dest.tmp.${System.nanoTime()}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
  }

  private def reorgMarker = Paths.get(indexPath, "_graft_reorg_inflight")

  /** Every read/maintenance entry point refuses while a reorg marker
    * is up: inside the swap window, codes and codebooks can disagree —
    * serving ADC scores from that state would be silently WRONG, not
    * merely stale. The window is the six renames only (staging runs
    * before the marker goes up), and a death inside it is recovered by
    * [[recoverReorg]] — discard staging, restore the committed
    * pre-reorg index — never a rebuild. */
  private def requireNoReorg(): Unit =
    require(!Files.exists(reorgMarker),
      s"index at $indexPath has an interrupted reorg (marker " +
        s"$reorgMarker) — call recoverReorg() (or re-run reorg()) to " +
        "roll back to the committed pre-reorg index; no rebuild needed")

  private def rmDir(p: Path): Unit = {
    val hp = new org.apache.hadoop.fs.Path(p.toString)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
    ()
  }

  /** REORG the index against the live source distribution: retrain
    * the coarse centroids (same nlist) and the PQ codebooks from the
    * CURRENT live rows (or `trainOn`, e.g. a sample — at 100 TB
    * training always runs on a sample while the re-encode pass runs
    * on everything), re-encode the whole live table, and swap the
    * frozen artifacts — the sanctioned retrain path that [[train]]
    * deliberately refuses. Appends encode against frozen artifacts
    * (what makes incremental maintenance rebuild-exact), so as the
    * live distribution drifts from the training sample, assignments
    * go lopsided and quantization error grows — recall decays
    * (IvfPqIndexSpec measures the decay and the recovery). reorg()
    * restores recall at one full-encode cost: the FAISS
    * retrain-offline operating model, in place.
    *
    * Crash contract — CRASH-RECOVERABLE, never a rebuild: training,
    * codebook staging AND the full re-encode all run BEFORE the marker
    * goes up, into staging paths the live index never reads — probes
    * serve the committed pre-reorg state through the whole expensive
    * phase. The re-encoded lists stage as their OWN managed table
    * (`lists.reorg`), mirroring how the artifacts already staged. The
    * `_graft_reorg_inflight` marker then brackets only the six renames
    * of the swap; a death inside that window is rolled back by
    * [[recoverReorg]] (staging discarded, any piece already swapped
    * restored from its `.old` twin — the reverse of the swap order),
    * after which the index serves the pre-reorg state exactly as
    * committed and `reorg()` can simply re-run. The basis publishes
    * AFTER the marker clears: a death between them leaves the new
    * index with the old basis, and the next refresh re-folds windows
    * the re-encode already covered — drop-then-re-encode converges
    * (a stale basis merely replays; publishing a too-new basis before
    * a possible rollback would silently skip windows forever). The
    * re-encode covers the source HEAD snapshot read BEFORE the data
    * (the same order refresh() relies on), so windows committed
    * DURING a long reorg replay instead of being skipped. */
  def reorg(iters: Int = 5, trainOn: Option[DataFrame] = None): Unit = {
    // a leftover marker from a mid-swap death rolls back FIRST:
    // staging is discarded, the committed pre-reorg index returns to
    // service, and this run re-stages from scratch
    if (Files.exists(reorgMarker)) recoverReorg()
    require(isTrained, s"index at $indexPath is not trained")
    moveCount = 0
    // mirror-proven head (see refresh): read() below may serve a few
    // rows past it — they replay idempotently on the next refresh
    val headV = math.min(source.version - 1, source.mirrorStableVersion)
    val lineage = source.tableId
    val live = source.read()
    val sample = trainOn.getOrElse(live)
    val nlist = centroids.count().toInt
    val newCents = VectorFunctions.kmeansFit(sample, nlist, iters,
      idCol, vecCol)
      .select(col("centroid_id").as(idCol), col("centroid").as(vecCol))
    val newCbs = VectorFunctions.pqTrain(sample, m, ksub, iters, dim,
      idCol, vecCol)
    // stage both artifacts fully before anything visible changes, then
    // encode from the STAGED parquet (never the in-memory frames) so
    // the swapped-in artifacts are bit-identical to what encoded the
    // lists; a pre-marker death leaves only stale staging dirs, which
    // the next run clears here
    val stageC = stageOf(centroidsDir)
    val stageB = stageOf(codebooksDir)
    rmDir(stageC); rmDir(stageB); rmDir(stageOf(listsDir))
    // stale .old twins are garbage from a COMPLETED reorg whose tail
    // cleanup died (marker already cleared, so the live pieces are
    // authoritative). They must go BEFORE this run's marker goes up:
    // a crash inside this run's swap would otherwise leave a mix of
    // fresh and stale .old dirs, and recoverReorg — which restores
    // every piece whose .old exists — would roll different pieces
    // back to DIFFERENT reorgs (codes and codebooks from different
    // trainings: silently wrong ADC scores, the one state this whole
    // protocol exists to prevent)
    rmDir(oldOf(listsDir)); rmDir(oldOf(centroidsDir))
    rmDir(oldOf(codebooksDir))
    writeFrozen(newCents, stageC)
    writeFrozen(newCbs.select(col("sub"), col("code"), col("centroid")),
      stageB)
    val cents2 = frozenFrame(stageC)
    val cbs2 = frozenFrame(stageB)
    val nFull = live.select(col(idCol)).count()
    // the expensive pass: re-encode the whole live table into the
    // STAGED lists table — the live lists keep serving probes
    val staged = new ManagedParquetTable(spark,
      stageOf(listsDir).toString)
    staged.overwrite(clustered(VectorFunctions.ivfPqEncode(
      live, cents2, cbs2, m, ksub, dim, idCol, vecCol), nFull))
    // marker brackets ONLY the swap renames; not cleared in a finally —
    // a failure must LEAVE it so entry points refuse the mixed state
    // until recoverReorg rolls it back
    Files.createDirectories(Paths.get(indexPath))
    Files.createFile(reorgMarker)
    swap(listsDir)
    swap(centroidsDir)
    swap(codebooksDir)
    // marker down = the swap committed; basis AFTER (see contract)
    Files.delete(reorgMarker)
    tracker.publish(headV, lineage)
    rmDir(oldOf(listsDir)); rmDir(oldOf(centroidsDir))
    rmDir(oldOf(codebooksDir))
  }

  private def listsDir = Paths.get(indexPath, "lists")
  private def oldOf(p: Path) = Paths.get(s"$p.old")
  private def stageOf(p: Path) = Paths.get(s"$p.reorg")

  /** Forged-crash test seam: when ≥ 0, [[moveAtomic]] throws before
    * performing rename number `crashBeforeMove` (0-based, counted per
    * reorg call) — how the spec kills a reorg inside the swap window. */
  private[graft] var crashBeforeMove: Int = -1
  private var moveCount = 0

  private def moveAtomic(a: Path, b: Path): Unit = {
    if (crashBeforeMove >= 0 && moveCount >= crashBeforeMove)
      throw new RuntimeException(
        s"forged crash before reorg rename #$moveCount")
    moveCount += 1
    Files.move(a, b, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Two-rename swap of one index piece: live → .old, staged → live.
    * Recovery reverses it from whichever rename a death left behind. */
  private def swap(live: Path): Unit = {
    rmDir(oldOf(live))
    moveAtomic(live, oldOf(live))
    moveAtomic(stageOf(live), live)
  }

  /** Roll BACK an interrupted reorg ("discard staging"): every piece
    * whose `.old` twin exists is restored from it (covering a death
    * between the two renames of a swap, or after both), staging dirs
    * are removed, the marker clears. The index then serves the
    * committed pre-reorg state exactly as it was — lists, artifacts
    * AND basis (the basis only publishes after a completed swap), so
    * refresh()/topK() resume immediately and `reorg()` can re-run. */
  def recoverReorg(): Unit = {
    require(Files.exists(reorgMarker),
      s"no interrupted reorg at $indexPath")
    // reverse swap order
    for (live <- Seq(codebooksDir, centroidsDir, listsDir)) {
      val old = oldOf(live)
      if (Files.exists(old)) {
        rmDir(live) // the staged piece already moved in (or nothing)
        Files.move(old, live, StandardCopyOption.ATOMIC_MOVE)
      }
      rmDir(stageOf(live))
    }
    Files.delete(reorgMarker)
  }

  /** Range-cluster an encode batch by centroid_id so each parquet file
    * covers a tight centroid range — what makes the stats sidecar
    * prune probe scans to the probed lists' files. File count scales
    * with batch size (≈ one file per `rowsPerFile` rows), so a trickle
    * append stays one small file while a bulk build fans out.
    * `rows` is counted by the CALLER on the cheap pre-encode frame (an
    * id-only scan) — counting `enc` here would run the whole
    * assign+encode job twice, once for the count and once for the
    * write. File count scales with the batch (capped at 10k files per
    * commit — an operational ceiling against listing/task-overhead
    * blowups, far above any per-batch fan-out pruning needs). */
  private def clustered(enc: DataFrame, rows: Long): DataFrame = {
    val n = math.min(10000L, math.max(1L, rows / rowsPerFile + 1)).toInt
    enc.repartitionByRange(n, col("centroid_id"), col(idCol))
      .sortWithinPartitions("centroid_id", idCol)
  }

  /** Bring the index up to the source table's mirror-proven version
    * (head clamped to `mirrorStableVersion` — see
    * IncrementalInvertedIndex.refresh for the OCC race this closes). */
  def refresh(): Unit = {
    requireNoReorg()
    require(isTrained, s"index at $indexPath must be trained before refresh")
    val (cents, cbs) = (centroids, codebooks)
    val head = math.min(source.version - 1, source.mirrorStableVersion)
    if (head < 0) { lastRefresh = "noop"; return }
    lastRefresh = tracker.refreshTo(head, source.tableId) {
      val full = source.read()
      val nFull = full.select(col(idCol)).count()
      table.overwrite(clustered(VectorFunctions.ivfPqEncode(
        full, cents, cbs, m, ksub, dim, idCol, vecCol), nFull))
    } { b =>
      val ch = source.changesSince(b, head)
      val ins = ch.filter(col("_change_type") === "insert")
        .drop("_change_type")
      val delKeys = ch.filter(col("_change_type") === "delete")
        .select(col(idCol))
      // ONE aggregate answers the emptiness probe AND the insert count
      // (the isEmpty + count pair each re-ran the change-feed subtree,
      // broadcast builds included — guide §1.2: fewer actions)
      val counts = ch.groupBy(col("_change_type")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val nIns = counts.getOrElse("insert", 0L)
      val nDel = counts.getOrElse("delete", 0L)
      // window keys drop FIRST (deletes ∪ re-inserted ids, one dv
      // commit), then fresh encodings append — pure appends delete
      // nothing, rewrites net to replace, a crash-replayed window
      // converges (same protocol as IncrementalVectorIndex)
      val dropKeys = delKeys.union(ins.select(col(idCol))).distinct()
      if (nDel + nIns > 0) table.deleteMatchingDV(dropKeys, Seq(idCol))
      if (nIns > 0)
        table.append(clustered(VectorFunctions.ivfPqEncode(
          ins, cents, cbs, m, ksub, dim, idCol, vecCol), nIns))
      table.compactDeletes(0.3)
    }
  }

  /** Probe-pruned ADC top-k from the STORED lists — identical scoring
    * to [[VectorFunctions.ivfPqTopK]], but stage 1 reads only the
    * index files whose centroid_id range intersects the probed lists
    * (stats-sidecar file skipping via readWhere; the probed-id set is
    * ≤ nlist values — planning state, not data). */
  def topK(queries: DataFrame, k: Int, nprobe: Int,
      shards: Int = 64): DataFrame = {
    requireNoReorg()
    val probes = VectorFunctions.ivfPqProbes(queries, centroids,
      codebooks, m, ksub, dim, nprobe, idCol, vecCol)
    val probedIds = probes.select(col("centroid_id"))
      .distinct().collect().map(_.get(0))
    val lists = table.readWhere(col("centroid_id").isin(probedIds: _*))
    VectorFunctions.storedIvfPqTopK(lists, probes, m, ksub, k,
      idCol, shards)
  }

  /** Telemetry-driven maintenance recommendations — one
    * [[graft.io.MaintenanceAction]] per policy threshold crossed,
    * empty when the index needs nothing; the IVF-PQ sibling of
    * [[graft.text.InvertedIndex.maintenancePlan]]. Signals come from
    * the lists table's own manifest (segment count — per-window
    * appends accumulate dirs whose listing/stats overhead every probe
    * plan pays) and dv bookkeeping (live tombstone entries — each
    * one's sidecar is opened per scan); a torn reorg preempts as the
    * only row. No code scan, pollable per ingest window. */
  def maintenancePlan(
      policy: IvfPqMaintenancePolicy = IvfPqMaintenancePolicy()):
      Seq[graft.io.MaintenanceAction] = {
    import graft.io.MaintenanceAction
    if (Files.exists(reorgMarker))
      return Seq(MaintenanceAction("recoverReorg", "reorg_marker", 1L,
        0L, 0L, "interrupted reorg: roll back to the committed " +
          "pre-reorg index (re-running reorg() also recovers on entry)"))
    val out = Seq.newBuilder[MaintenanceAction]
    if (table.exists) {
      val segs = table.deltaSnapshotFiles()
        .map(_.split("/")(0)).distinct
      if (segs.size >= policy.maxListSegments)
        out += MaintenanceAction("compactLists", "list_segments",
          segs.size.toLong, policy.maxListSegments.toLong, 0L,
          "per-window appends accumulated segment dirs; " +
            "table.compact() folds them in one dataChange=false commit")
      val dvn = table.liveDvEntries(segs).size
      if (dvn >= policy.maxLiveDvEntries)
        out += MaintenanceAction("compactDeletes", "live_dv_entries",
          dvn.toLong, policy.maxLiveDvEntries.toLong, 0L,
          "every live tombstone entry's sidecar is opened per probe " +
            "scan; compactDeletes folds over-threshold segments")
    }
    out.result()
  }

  /** The trait-surfaced form against this instance's
    * `maintenancePolicy` — what a sink's policy loop polls
    * (`BronzeIngest.indexedIngestBatch(maintenanceEvery = N)`). */
  override def maintenancePlan(): Seq[graft.io.MaintenanceAction] =
    maintenancePlan(maintenancePolicy)

  override def runMaintenance(a: graft.io.MaintenanceAction): Unit =
    a.action match {
      case "recoverReorg" => recoverReorg()
      case "compactLists" =>
        // fold segments but KEEP the lists centroid-clustered: a flat
        // repartition would merge every centroid into every file and
        // quietly turn probe-time file skipping off
        val rows = table.read().count()
        table.compact(
          targetFiles = math.max(1L, (rows + rowsPerFile - 1)
            / rowsPerFile).toInt,
          zCols = Seq("centroid_id"))
      case "compactDeletes" => table.compactDeletes()
      case other => super.runMaintenance(a)
    }

  /** O(1) marker probe — see [[graft.io.IndexMaintainer.needsRecovery]]. */
  override def needsRecovery(): Boolean = Files.exists(reorgMarker)

  /** The probe plan's file-skipping decision for `queries` at
    * `nprobe`: (files the scan opens, total live index files) —
    * exposed so tests/metrics can assert probes stay list-local. */
  def probeFilePlan(queries: DataFrame, nprobe: Int): (Int, Int) = {
    requireNoReorg()
    val probes = VectorFunctions.ivfPqProbes(queries, centroids,
      codebooks, m, ksub, dim, nprobe, idCol, vecCol)
    val probedIds = probes.select(col("centroid_id"))
      .distinct().collect().map(_.get(0))
    val (kept, total) =
      table.pruneFiles(col("centroid_id").isin(probedIds: _*))
    (kept.size, total)
  }
}

/** Thresholds for [[IncrementalIvfPqIndex.maintenancePlan]]. Defaults
  * size for a large deployment; tests pass tighter bounds.
  * `maxListSegments` bounds the lists table's segment-dir count (probe
  * planning lists every live segment's stats sidecar);
  * `maxLiveDvEntries` bounds the tombstone entries a scan must open
  * (refresh() already folds them at its own 0.3 threshold — the plan
  * surfaces a table whose refresh cadence has not kept up). */
final case class IvfPqMaintenancePolicy(
    maxListSegments: Int = 32,
    maxLiveDvEntries: Int = 16)
