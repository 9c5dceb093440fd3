package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2: turn a change feed
  * `(key, attrs…, ts)` into a versioned dimension with one row per
  * contiguous run of equal attribute values —
  * `(key, attrs…, change_id, valid_from, valid_to, is_current)` —
  * the table a warehouse joins facts against "as of" any instant.
  * The natural consumer of this engine's own outgoing change feed
  * (`ManagedParquetTable.changesSince`, s27) and the complement of
  * the incoming CDC apply (s25): apply folds to LATEST state, SCD2
  * keeps EVERY state with its validity interval.
  *
  * Scale design:
  *   - [[scd2]] is ONE shuffle: both window passes (run-collapse,
  *     then valid_to) partition by the key, so Catalyst plans a
  *     single Exchange; the second Window reuses the first's
  *     hash-partitioning (a re-sort, never a re-shuffle) — locked by
  *     ScdSpec's plan assertion.
  *   - [[applyDelta]] is O(touched keys): the delta's key set
  *     semi-joins the affected history out of the current dimension,
  *     rebuilds only those keys, and anti-join-unions the untouched
  *     rows back — at 100 TB a trickle of CDC rows never rescans the
  *     dimension's full history. Rebuilding from the current SCD2
  *     rows (the change POINTS) instead of the raw feed is lossless
  *     because a collapsed duplicate is by construction equal to its
  *     run's head: re-deriving runs from heads + new rows yields the
  *     same runs the full feed would.
  *
  * Late-data contract: the fast path ([[applyDelta]]) is exact iff
  * delta rows for a key timestamp at-or-after that key's last OBSERVED
  * ts — strictly stronger than "after the last change point", because
  * observations equal to their predecessor collapse into the stored
  * run and leave no witness: a late row landing among them splits
  * history at a position the stored points cannot re-derive. Two
  * defenses, graded by what the caller can afford:
  *   - [[LatePolicy.Fail]] detects every delta row landing inside
  *     CLOSED history (ts before the key's newest stored valid_from —
  *     the provably-wrong-under-the-fast-path class; see [[lateRows]])
  *     and aborts the batch loudly. A row that reorders inside the
  *     OPEN current run against collapsed duplicates is
  *     indistinguishable from an on-time row using the dimension
  *     alone and is NOT caught — feeds that can produce those need
  *     the raw-feed path below.
  *   - [[applyDeltaFromRaw]] rebuilds every touched key from the
  *     caller-provided raw feed — exact under ANY delivery order, at
  *     O(touched keys' raw history) instead of O(touched keys' change
  *     points).
  *
  * The reference's pipeline keeps only latest state
  * (gold/bronzeToGold.py upsert shape); SCD2 is part of the
  * beyond-reference warehouse brief (Kimball, The Data Warehouse
  * Toolkit ch. 5 — public methodology, no code to port).
  */
object Scd {

  /** Build the SCD2 dimension from a full change feed.
    *
    * @param changes  one row per observed state `(key…, attrs…, ts,
    *                 tieBreak…)`; extra columns are dropped
    * @param keyCols  business key
    * @param attrCols tracked attributes — a new row opens whenever any
    *                 of them changes (null-safe comparison)
    * @param tsCol    change timestamp (any orderable type)
    * @param idCol    unique per-row id used to (a) break equal-ts
    *                 ordering deterministically and (b) surface as
    *                 `change_id`, giving the output a total order even
    *                 when a key changes twice at one timestamp
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      tsCol: String, idCol: String): DataFrame = {
    val key = keyCols.map(col)
    val attrs = struct(attrCols.map(col): _*)
    val w = Window.partitionBy(key: _*).orderBy(col(tsCol), col(idCol))
    val points = changes
      .select((keyCols ++ attrCols ++ Seq(tsCol, idCol)).map(col): _*)
      .withColumn("__prev", lag(attrs, 1).over(w))
      // null-safe: first row of a key (prev null) is always a point
      .where(!(col("__prev") <=> attrs))
      .drop("__prev")
    points
      .withColumn("change_id", col(idCol))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tsCol, idCol)
  }

  /** How [[applyDelta]] treats delta rows that violate the late-data
    * contract (see object doc). */
  sealed trait LatePolicy
  object LatePolicy {
    /** Trust the feed (the default, and the right choice for ordered
      * CDC streams): no detection pass is spent. */
    case object Assume extends LatePolicy
    /** Abort the batch with the late-row count if any delta row lands
      * inside closed history — quarantine-by-failure: the caller still
      * holds the batch and routes it to [[applyDeltaFromRaw]] or a
      * dead-letter store. Costs one aggregate over delta ⋈ per-key
      * newest-valid_from. */
    case object Fail extends LatePolicy
  }

  /** The delta rows that land inside CLOSED history: ts strictly
    * before their key's newest stored `valid_from` — or ts NULL, which
    * [[scd2]]'s `orderBy(ts, id)` sorts FIRST, i.e. to the very start
    * of closed history: the exact silent-corruption class this
    * detector exists for, so a null ts on a key with any stored
    * history is always flagged. Rows at-or-after the newest point are
    * indistinguishable from on-time rows here.
    * One aggregate of `current` + one join, both key-partitioned. */
  def lateRows(current: DataFrame, delta: DataFrame, keyCols: Seq[String],
      tsCol: String): DataFrame = {
    val latest = current.groupBy(keyCols.map(col): _*)
      .agg(max(col("valid_from")).as("__latest_from"))
    delta.join(latest, keyCols, "inner")
      .where(col(tsCol).isNull || col(tsCol) < col("__latest_from"))
      .drop("__latest_from")
  }

  /** Fold a new batch of change rows into an existing SCD2 dimension,
    * touching only the keys the delta mentions (see object doc for the
    * late-data contract; `onLate` picks the enforcement). `current`
    * must have [[scd2]]'s output schema for the same (keyCols,
    * attrCols); `delta` has the raw feed schema. Untouched keys pass
    * through without a window pass. */
  def applyDelta(current: DataFrame, delta: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], tsCol: String, idCol: String,
      onLate: LatePolicy = LatePolicy.Assume): DataFrame = {
    val batch = onLate match {
      case LatePolicy.Assume => delta
      case LatePolicy.Fail =>
        // pin the batch before the gate so the gated frame and the
        // folded frame are the SAME data — a non-deterministic delta
        // source evaluated twice could otherwise pass the gate yet
        // deliver late rows to the fold. localCheckpoint is eager and
        // batch-sized (a Fail caller is a trickle-CDC caller; bulk
        // backfills use Assume or applyDeltaFromRaw). The checkpoint
        // BACKS the returned plan, so an explicit PlanBridge-style
        // release is impossible here: it lives until driver GC after
        // the caller consumes the result — fine for this one-shot API,
        // which is why the per-micro-batch sinks (BronzeIngest
        // .scd2Batch/scd2BatchFromRaw) deliberately do not route
        // through this gate and own their pins explicitly.
        val pinned = delta.localCheckpoint()
        val n = lateRows(current, pinned, keyCols, tsCol).count()
        require(n == 0,
          s"$n delta row(s) land inside closed SCD2 history; " +
            "re-route the batch through applyDeltaFromRaw or drop the " +
            "late rows explicitly")
        pinned
    }
    // no forced broadcast on the touched-key set: a trickle batch
    // broadcasts under AQE anyway, and a bulk backfill's key set must
    // be allowed to degrade to a shuffle join instead of OOMing the
    // driver at 100 TB. ONE touched-key frame feeds both the anti-join
    // and the rebuild so the two branches can never disagree on which
    // keys are kept vs rebuilt (a non-deterministic delta source
    // evaluated twice could otherwise leave a key in both sets)
    val touched = batch.select(keyCols.map(col): _*).distinct()
    val keep = current.join(touched, keyCols, "left_anti")
    keep.unionByName(
      rebuildTouched(current, batch, touched, keyCols, attrCols, tsCol, idCol))
  }

  /** [[applyDelta]] for feeds that can deliver ARBITRARILY late rows:
    * every key the delta touches is rebuilt from `raw` — the key's
    * full observed history (delta rows may but need not be included;
    * an exact duplicate observation collapses into its run and cannot
    * change the result) — so the fold equals [[scd2]] over the full
    * feed under ANY delivery order, proven by ScdSpec's randomized
    * out-of-order differential. Untouched keys still pass through
    * without a window pass; the price of exactness is reading the
    * touched keys' raw history (semi-join-pruned, key-partitioned)
    * instead of their collapsed change points. */
  def applyDeltaFromRaw(current: DataFrame, delta: DataFrame,
      raw: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      tsCol: String, idCol: String): DataFrame = {
    val touched = delta.select(keyCols.map(col): _*).distinct()
    val keep = current.join(touched, keyCols, "left_anti")
    keep.unionByName(
      rebuildFromRaw(touched, delta, raw, keyCols, attrCols, tsCol, idCol))
  }

  /** Just the raw-rebuilt rows for the keys `delta` mentions — the
    * raw-path analogue of [[rebuildKeys]], for a streaming sink that
    * swaps touched keys in place (one MERGE) and must stay exact under
    * ANY delivery order: the touched keys' full observed history comes
    * from `raw` (the bronze feed table), not from the stored change
    * points. */
  def rebuildKeysFromRaw(delta: DataFrame, raw: DataFrame,
      keyCols: Seq[String], attrCols: Seq[String], tsCol: String,
      idCol: String): DataFrame =
    rebuildFromRaw(delta.select(keyCols.map(col): _*).distinct(),
      delta, raw, keyCols, attrCols, tsCol, idCol)

  private def rebuildFromRaw(touched: DataFrame, delta: DataFrame,
      raw: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      tsCol: String, idCol: String): DataFrame = {
    val cols = (keyCols ++ attrCols ++ Seq(tsCol, idCol)).map(col)
    val feed = raw.select(cols: _*).join(touched, keyCols, "left_semi")
      .unionByName(delta.select(cols: _*))
    scd2(feed, keyCols, attrCols, tsCol, idCol)
  }

  /** Just the rebuilt rows for the keys `delta` mentions — the piece a
    * streaming sink swaps in place (delete touched keys + append this)
    * without ever planning the untouched-rows branch. */
  def rebuildKeys(current: DataFrame, delta: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], tsCol: String, idCol: String): DataFrame =
    rebuildTouched(current, delta,
      delta.select(keyCols.map(col): _*).distinct(),
      keyCols, attrCols, tsCol, idCol)

  private def rebuildTouched(current: DataFrame, delta: DataFrame,
      touched: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      tsCol: String, idCol: String): DataFrame = {
    // affected history, re-expressed as change rows: every stored
    // change point IS an observed state (ts=valid_from, id=change_id).
    // AQE picks the semi-join strategy (see applyDelta's note)
    val history = current.join(touched, keyCols, "left_semi")
      .select((keyCols ++ attrCols).map(col) :+
        col("valid_from").as(tsCol) :+ col("change_id").as(idCol): _*)
    val feed = history.unionByName(
      delta.select((keyCols ++ attrCols ++ Seq(tsCol, idCol)).map(col): _*))
    scd2(feed, keyCols, attrCols, tsCol, idCol)
  }

  /** Point-in-time join helper: the dimension rows valid at `asOf`
    * (half-open intervals `[valid_from, valid_to)`; the current row's
    * open end matches everything at-or-after its start). */
  def snapshotAt(dim: DataFrame, asOf: Column): DataFrame =
    dim.where(col("valid_from") <= asOf &&
      (col("valid_to").isNull || col("valid_to") > asOf))
}
