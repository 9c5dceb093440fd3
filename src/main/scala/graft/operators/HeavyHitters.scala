package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Exact frequent-items ("heavy hitters") without shuffling the key
  * domain.
  *
  * The stock Spark answer — `groupBy(key).count.filter(_ > t)` —
  * shuffles every distinct key. On a 100 TB corpus keyed by URL or
  * document fingerprint that shuffle IS the job: billions of
  * near-unique keys move so that a handful of frequent ones can be
  * kept. This operator never moves the key domain:
  *
  *   - pass 0: `count()` — column-pruned, no shuffle — fixes N;
  *   - pass 1: a per-partition Misra-Gries summary of capacity
  *     k = ceil(N / t) emits candidate keys. No shuffle: the summaries
  *     are a narrow `mapPartitions`. Soundness is the weighted
  *     pigeonhole: a key with global count C > t has local count
  *     C_p > t·(N_p/N) ≥ N_p/k in some partition p, and Misra-Gries
  *     with k counters retains every key whose local count exceeds
  *     N_p/k — so every true heavy hitter survives as a candidate
  *     (with possible false positives, never false negatives);
  *   - pass 2: a broadcast semi-join keeps only candidate rows
  *     (a vanishing fraction at scale) and recounts them EXACTLY, so
  *     the output carries true frequencies — the sketch only ever
  *     proposes, it never decides.
  *
  * Memory: the per-partition summary holds ≤ k entries; with
  * t = 0.001%·N that is 10^5 counters regardless of corpus size.
  * Nulls are excluded (a null key is not an item).
  *
  * Reference behavior anchor: the reference's duplicate-check report
  * (`gold/bronzeToGold.py` groupby-size filter) is the same
  * "keys above a count threshold" contract at notebook scale.
  */
object HeavyHitters {

  /** Value-equality holder for BinaryType summary keys (Array[Byte]
    * hashes by reference). Serializable: it travels inside the
    * mapPartitions closure's task scope only. */
  private final case class BinKey(s: Seq[Byte])

  /** All keys of `keyCol` with exact frequency strictly above
    * `minFreq`, as (key, freq) with the key's original name and type.
    * Output is sorted by key for deterministic export.
    *
    * `maxCandidateBound` guards the broadcast: the candidate union is
    * bounded by partitions × capacity, and when that bound exceeds it
    * the sketch cannot be selective enough to beat a plain aggregate
    * (the degenerate case is k ≥ rows-per-partition, where no summary
    * ever decrements and "candidates" is the whole key domain) — the
    * operator then falls back to the ordinary groupBy-HAVING plan,
    * which is exact and never worse than sketch-then-recount there. */
  def heavyHitters(df: DataFrame, keyCol: String, minFreq: Long,
      maxCandidateBound: Long = 1L << 22): DataFrame = {
    require(minFreq >= 1, s"minFreq must be >= 1, got $minFreq")
    val keyed = df.select(col(keyCol)).filter(col(keyCol).isNotNull)
    val exact = keyed.groupBy(col(keyCol))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") > minFreq)
      .orderBy(col(keyCol))
    val n = keyed.count()
    if (n == 0) return exact.limit(0)
    // capacity so that N_p/k <= t * N_p/N: every global-heavy key is
    // locally heavy enough somewhere to survive its partition summary
    val kL = math.max(2L, (n + minFreq - 1) / minFreq)
    val parts = math.max(1, keyed.rdd.getNumPartitions).toLong
    // candidate union is provably <= parts * k rows; past the bound
    // (or an Int-overflowing capacity) the sketch buys nothing — use
    // the plain exact plan instead of a degenerate broadcast
    if (kL > Int.MaxValue / 4 || parts * kL > maxCandidateBound) return exact
    val k = kL.toInt
    val schema = keyed.schema
    val candidates = keyed.mapPartitions { rows =>
      // Array[Byte] (BinaryType) compares by reference, so binary keys
      // wrap in a value-equality holder for summary identity
      // (Percentiles.keyOf convention); the wrapper is unambiguous, so
      // genuine Seq-typed (ArrayType) keys pass through untouched
      def keyOf(v: Any): Any = v match {
        case b: Array[Byte] => BinKey(b.toSeq)
        case x => x
      }
      def rawOf(v: Any): Any = v match {
        case BinKey(s) => s.toArray
        case x => x
      }
      val summary = new java.util.HashMap[Any, Long](
        math.min(k.toLong * 2, 1L << 29).toInt)
      rows.foreach { r =>
        val x = keyOf(r.get(0))
        val c = summary.get(x) // null unboxes to 0; stored counts are >= 1
        if (c != 0L) summary.put(x, c + 1L)
        else if (summary.size < k) summary.put(x, 1L)
        else {
          // Misra-Gries decrement step: charge one count to every
          // tracked key; drop the ones that reach zero. Amortized O(1)
          // per input row (each decrement cancels a prior increment).
          val it = summary.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      val keys = new scala.collection.mutable.ArrayBuffer[Row](summary.size)
      summary.keySet().forEach(x => keys += Row(rawOf(x)))
      keys.iterator
    }(Encoders.row(schema)).distinct()
    df.join(broadcast(candidates), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") > minFreq)
      .orderBy(col(keyCol))
  }
}
