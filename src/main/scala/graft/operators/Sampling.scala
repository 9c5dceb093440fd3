package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing.
  *
  * Content-hash (not RNG) sampling: a row is kept iff
  * `hash % denom < rate(stratum)`. This is the property a 100 TB
  * mixing pipeline needs — decisions are reproducible across runs and
  * engines, independent of partitioning (no per-partition RNG seed
  * coupling, unlike `df.sample`), and stable under re-sharding: the
  * same document always lands on the same side of the cut, so a rerun
  * or an incremental top-up selects a superset/subset by just moving
  * the rate. Rates are exact integer numerators out of `denom`
  * (cross-engine float-free).
  */
object Sampling {

  /** Per-stratum keep rates: `rates(stratum)` out of `denom`, falling
    * back to `defaultRate` for strata not in the map. `hashCol` must be
    * a non-negative integer column (e.g. a content fingerprint). */
  def stratifiedSample(df: DataFrame, stratumCol: Column, hashCol: Column,
      rates: Map[String, Int], defaultRate: Int,
      denom: Int = 1000): DataFrame = {
    require(denom > 0 && (defaultRate +: rates.values.toSeq)
      .forall(r => r >= 0 && r <= denom),
      s"rates must lie in [0, $denom]")
    val rateCol = rates.foldLeft(lit(defaultRate)) {
      case (acc, (k, v)) => when(stratumCol === lit(k), lit(v)).otherwise(acc)
    }
    df.filter(pmod(hashCol, lit(denom)) < rateCol)
  }

  /** Uniform (stratum-free) deterministic sample at rate/denom. */
  def hashSample(df: DataFrame, hashCol: Column, rate: Int,
      denom: Int = 1000): DataFrame =
    df.filter(pmod(hashCol, lit(denom)) < lit(rate))
}
