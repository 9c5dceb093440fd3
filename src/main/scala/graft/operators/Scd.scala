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
  * Contract: `applyDelta` assumes the usual CDC monotonicity — delta
  * rows for a key timestamp at-or-after that key's last change point.
  * A LATE row that lands inside a collapsed historical run can split
  * it at a position the stored change points no longer witness; feeds
  * that can deliver late data should rebuild affected keys from the
  * raw feed ([[scd2]] over the key's full history) instead.
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

  /** Fold a new batch of change rows into an existing SCD2 dimension,
    * touching only the keys the delta mentions (see object doc for the
    * monotonicity contract). `current` must have [[scd2]]'s output
    * schema for the same (keyCols, attrCols); `delta` has the raw feed
    * schema. Untouched keys pass through without a window pass. */
  def applyDelta(current: DataFrame, delta: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], tsCol: String, idCol: String): DataFrame = {
    // no forced broadcast on the touched-key set: a trickle batch
    // broadcasts under AQE anyway, and a bulk backfill's key set must
    // be allowed to degrade to a shuffle join instead of OOMing the
    // driver at 100 TB. ONE touched-key frame feeds both the anti-join
    // and the rebuild so the two branches can never disagree on which
    // keys are kept vs rebuilt (a non-deterministic delta source
    // evaluated twice could otherwise leave a key in both sets)
    val touched = delta.select(keyCols.map(col): _*).distinct()
    val keep = current.join(touched, keyCols, "left_anti")
    keep.unionByName(
      rebuildTouched(current, delta, touched, keyCols, attrCols, tsCol, idCol))
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
