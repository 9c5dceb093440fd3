package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.MisraGries.mg_summary

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
  *   - pass 1: ONE Misra-Gries aggregate ([[graft.expressions
  *     .MisraGriesAgg]], registered as `graft_heavy_hitters`) of
  *     capacity k = ceil(N / t) proposes candidates. Partial summaries
  *     fold map-side and MERGE with the (k+1)-th-largest-subtraction
  *     rule (Agarwal et al., PODS 2012), so the merged error stays
  *     ≤ N/(k+1) < t and every true heavy hitter survives as a
  *     candidate (false positives possible, false negatives never).
  *     What reaches the final reducer — and the candidate set itself —
  *     is ≤ k counters TOTAL, regardless of partition count;
  *   - pass 2: a broadcast semi-join keeps only candidate rows
  *     (a vanishing fraction at scale) and recounts them EXACTLY, so
  *     the output carries true frequencies — the sketch only ever
  *     proposes, it never decides.
  *
  * Memory: with t = 0.001%·N the summary is 10^5 counters regardless
  * of corpus size. Nulls are excluded (a null key is not an item).
  * Because the proposal stage is a registered aggregate, the same
  * summary also composes per-group / windowed in plain SQL:
  * `SELECT site, graft_heavy_hitters(url, 1000) FROM logs GROUP BY site`.
  *
  * Reference behavior anchor: the reference's duplicate-check report
  * (`gold/bronzeToGold.py` groupby-size filter) is the same
  * "keys above a count threshold" contract at notebook scale.
  */
object HeavyHitters {

  /** All keys of `keyCol` with exact frequency strictly above
    * `minFreq`, as (key, freq) with the key's original name and type.
    * Output is sorted by key for deterministic export.
    *
    * `maxCandidateBound` guards the summary/broadcast: the candidate
    * set is ≤ k = ceil(N/minFreq) entries, and when k exceeds the
    * bound the sketch cannot be selective enough to beat a plain
    * aggregate (the degenerate case is k ≈ distinct keys, where the
    * "candidates" are the whole key domain) — the operator then falls
    * back to the ordinary groupBy-HAVING plan, which is exact and
    * never worse than sketch-then-recount there. */
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
    // capacity so that the merged summary's error N/(k+1) < minFreq:
    // every key with true count > minFreq is guaranteed a candidate.
    // The sketch path is additionally capped at MisraGriesAgg's own
    // capacity ceiling (1<<22) regardless of maxCandidateBound — past
    // either bound the exact plan is the documented graceful fallback
    val kL = math.max(2L, (n + minFreq - 1) / minFreq)
    if (kL > math.min(maxCandidateBound, 1L << 22)) return exact
    val candidates = keyed
      .agg(mg_summary(col(keyCol), kL.toInt).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.key").as(keyCol))
    df.join(broadcast(candidates), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") > minFreq)
      .orderBy(col(keyCol))
  }
}
