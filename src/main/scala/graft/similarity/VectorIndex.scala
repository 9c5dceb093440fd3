package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{BasisTracker, ManagedParquetTable}

/** Incrementally-maintained quantized ANN index over an embeddings
  * table — the lifecycle half v9's build-once index lacks: a
  * training-data pipeline ingests continuously, and rebuilding a
  * billion-vector index per ingest batch is O(corpus) where O(delta)
  * is available. (Reference behavior anchor: the reference re-derives
  * its gold outputs per run — gold/bronzeToGold.py — because its data
  * is notebook-scale; at 100 TB derived artifacts must maintain, not
  * rebuild.)
  *
  * The index is itself a [[ManagedParquetTable]] at `indexPath`
  * holding [[VectorFunctions.buildQuantizedIndex]] rows
  * (id, codes, vmin, vmax — the 4×-compressed scan table
  * [[VectorFunctions.storedQuantizedTopK]] searches), plus a tiny
  * basis file recording the SOURCE table's delta-log version the
  * index is current to.
  *
  * `refresh()` diffs the source through its change feed
  * ([[ManagedParquetTable.changesSince]]):
  *
  *  - inserted rows ENCODE and append — quantizeU8 is per-vector
  *    (row-local, no training pass), so incremental maintenance is
  *    EXACTLY rebuild-equivalent, not approximately;
  *  - deleted rows (file-granular deletes, dv tombstones alike) drop
  *    from the index as a deletion-vector key delete — O(batch),
  *    never an index rewrite; `compactDeletes` keeps the index's own
  *    tombstone list bounded across the stream's life;
  *  - a rewritten source file surfaces as delete+insert pairs and
  *    nets to replace.
  *
  * Crash safety: the basis version publishes (atomic rename) only
  * AFTER the index table commits. A crash in between replays the same
  * change window, which is idempotent: the window's keys are dropped
  * first (a re-delete of already-tombstoned keys matches no live rows
  * and commits nothing), then re-encoded — same ids, same codes. */
final class IncrementalVectorIndex(spark: SparkSession,
    sourcePath: String, indexPath: String, idCol: String = "vec_id",
    vecCol: String = "embedding") extends graft.io.IndexMaintainer {

  private def source = new ManagedParquetTable(spark, sourcePath)

  /** The index as a managed table (searchable via
    * [[VectorFunctions.storedQuantizedTopK]] with `table.read()`). */
  val table = new ManagedParquetTable(spark, indexPath)

  private val tracker = new BasisTracker(indexPath, sourcePath)

  /** How the last refresh() on this instance resolved:
    * "full" | "incremental" | "noop" | "" (never ran). */
  @volatile var lastRefresh: String = ""

  def basis: Option[Long] = tracker.basis

  def read(): DataFrame = table.read()

  /** Bring the index up to the source table's mirror-proven version
    * (head clamped to `mirrorStableVersion` — see
    * IncrementalInvertedIndex.refresh for the OCC race this closes). */
  def refresh(): Unit = {
    // newest delta-log mirror version: manifest versions are 1-based,
    // mirror file numbers 0-based, so head mirror = manifest - 1
    val head = math.min(source.version - 1, source.mirrorStableVersion)
    if (head < 0) { lastRefresh = "noop"; return }
    lastRefresh = tracker.refreshTo(head, source.tableId) {
      table.overwrite(
        VectorFunctions.buildQuantizedIndex(source.read(), idCol, vecCol))
    } { b =>
      val ch = source.changesSince(b, head)
      val ins = ch.filter(col("_change_type") === "insert")
        .drop("_change_type")
      val delKeys = ch.filter(col("_change_type") === "delete")
        .select(col(idCol))
      // ONE aggregate answers both emptiness probes (the two isEmpty
      // calls each re-ran the change-feed subtree, broadcast builds
      // included — guide §1.2: fewer actions over the same subtree)
      val counts = ch.groupBy(col("_change_type")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val nIns = counts.getOrElse("insert", 0L)
      val nDel = counts.getOrElse("delete", 0L)
      // the window's keys drop FIRST (deletes ∪ re-inserted ids, one
      // dv commit), then fresh encodings append: pure appends delete
      // nothing (new keys match no live row → no commit), rewrites
      // net to replace, and a crash-replayed window converges
      val dropKeys = delKeys.union(ins.select(col(idCol))).distinct()
      if (nDel + nIns > 0) table.deleteMatchingDV(dropKeys, Seq(idCol))
      if (nIns > 0)
        table.append(
          VectorFunctions.buildQuantizedIndex(ins, idCol, vecCol))
      table.compactDeletes(0.3)
    }
  }
}
