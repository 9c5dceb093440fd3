package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Exact integer-arithmetic money kernels shared by the gate queries.
  *
  * `round(sum(double), 2)` is cross-engine-unstable: fp summation order
  * differs between engines, and a last-ulp difference at a half-cent
  * boundary flips the rounded cent (round-1 x3 failure). Summing exact
  * integer cents and rounding with an integer formula is deterministic
  * in any engine at any scale — and the per-row `round(v * 100)` is
  * itself deterministic because both engines compute the identical
  * IEEE double `v * 100` and both round half-away-from-zero.
  */
object Exact {

  /** Exact integer cents of a 2-decimal-valued double column. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** BIGINT integral divide (truncating), exact at any magnitude —
    * unlike floor(a / b) on doubles, which misrounds past 2^53. */
  def idiv(a: Column, b: Column): Column =
    column(new IntegralDivide(expression(a.cast("long")), expression(b.cast("long"))))

  /** round-half-away-from-zero of the exact rational p/q (q > 0) as a
    * BIGINT, entirely in integer arithmetic. Matches Spark/DuckDB
    * round() semantics on the same rational. */
  def roundDiv(p: Column, q: Column): Column = {
    val pos = idiv(abs(p) * 2 + q, q * 2)
    when(p < 0, -pos).otherwise(pos)
  }

  /** Σ of a 2-decimal double column, exact: Σcents / 100.0. The final
    * division is a single double op on an exact integer — identical in
    * every IEEE engine. Replaces round(sum(c), 2).
    *
    * Headroom bound: the BIGINT accumulator holds |Σcents| < 2⁶³ ≈
    * 9.2e18. At ~1e7 cents/row (TPC-H price magnitudes) that is ~9e11
    * rows per GROUP; derived products like price×(100−disc) at ~1e9 per
    * row bound a group at ~9e9 rows. Within the gate scales by 5+ orders
    * of magnitude; for groups beyond it use [[moneySumBig]]. */
  def moneySum(c: Column): Column = sum(cents(c)) / 100.0

  /** Overflow-proof variant: decimal(38,0) accumulator (≈1e38 headroom —
    * unreachable by any physical row count). ~2× slower than the BIGINT
    * path, so it is the documented escape hatch, not the default. */
  def moneySumBig(c: Column): Column =
    (sum(cents(c).cast("decimal(38,0)")) / 100.0).cast("double")

  /** DuckDB fragment equivalent to [[cents]]. */
  def centsSql(v: String): String = s"CAST(round(($v) * 100) AS BIGINT)"

  /** DuckDB fragment equivalent to [[moneySum]]. */
  def moneySumSql(v: String): String = s"sum(${centsSql(v)}) / 100.0"

  /** DuckDB fragment equivalent to [[roundDiv]] for a non-negative p.
    * (`//` truncates like Spark's `div`; identical for p >= 0.) */
  def roundDivSqlPos(p: String, q: String): String =
    s"((2 * ($p) + ($q)) // (2 * ($q)))"

  /** DuckDB fragment equivalent to [[roundDiv]] for any-sign p. */
  def roundDivSql(p: String, q: String): String =
    s"(CASE WHEN ($p) >= 0 THEN ${roundDivSqlPos(p, q)} " +
      s"ELSE -${roundDivSqlPos(s"-($p)", q)} END)"
}
