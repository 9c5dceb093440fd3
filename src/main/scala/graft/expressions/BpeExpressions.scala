package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Real byte-pair-encoding token count with LEARNED merges (reference
  * capability: token statistics over a training corpus; the round-2
  * "BPE-ish" regex heuristic in TextFunctions.tokenCountBpe remains as
  * the merges-free fallback).
  *
  * Algorithm: the text is split into single-character symbols, then each
  * merge rule (a, b) → ab is applied exhaustively in priority order —
  * one left-to-right non-overlapping pass per rule, which is exactly
  * exhaustive application because a merged symbol can never recreate its
  * own pattern. This single-pass-per-rule form is also expressible as
  * nested SQL replace() calls over a "(sym)(sym)" encoding, which is
  * what the t6 DuckDB oracle does — the kernel and the oracle share the
  * merges list, so any divergence in the merge machinery breaks the
  * gate.
  *
  * The merges ride in the expression (plan-shipped, ~KBs — the Spark
  * analogue of a driver broadcast); production vocabularies load via
  * [[BpeExpressions.mergesFromLines]] (GPT-2 merges.txt format). */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType

  @transient private lazy val mergeA: Array[String] = merges.map(_._1).toArray
  @transient private lazy val mergeB: Array[String] = merges.map(_._2).toArray

  def kernel(v: UTF8String): Int = {
    val s = v.toString
    if (s.isEmpty) return 0
    var cur = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) { cur.add(String.valueOf(s.charAt(i))); i += 1 }
    var m = 0
    while (m < mergeA.length) {
      val a = mergeA(m); val b = mergeB(m)
      val out = new java.util.ArrayList[String](cur.size)
      var j = 0
      while (j < cur.size) {
        if (j + 1 < cur.size && cur.get(j) == a && cur.get(j + 1) == b) {
          out.add(a + b); j += 2
        } else { out.add(cur.get(j)); j += 1 }
      }
      cur = out
      m += 1
    }
    cur.size
  }
  override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[UTF8String])
  // direct compiled-kernel call — no interpreted-eval dispatch
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCount", this, classOf[BpeTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  override def prettyName: String = "graft_bpe_token_count"
  override protected def withNewChildInternal(c: Expression): BpeTokenCount =
    copy(child = c)
}

object BpeExpressions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Fixture-shipped "learned" merges: frequent English pairs in
    * priority order, including space-absorbing word-final merges (the
    * </w>-style rules real BPE vocabularies learn). Symbols are limited
    * to [a-z0-9 ] — callers normalize with [[graft.text.TextFunctions
    * .bpeNormalize]] first, which also keeps the SQL-oracle encoding
    * unambiguous. */
  val FixtureMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "o" -> "n", "r" -> "e", "in" -> "g", "e" -> "r", "t" -> "i",
    "o" -> "u", "s" -> "t", "a" -> "r", "l" -> "l", "e" -> "d",
    "c" -> "o", "m" -> "e", "a" -> "l", "the" -> " ", "and" -> " ",
    "e" -> " ", "d" -> " ", "s" -> " ", "t" -> " ")

  /** Parse GPT-2 merges.txt lines ("a b" per line). Only the
    * `#version` header is a comment in the format — a merge rule whose
    * first symbol begins with '#' (hash runs in code corpora) is a
    * legitimate rule and must NOT be dropped. The raw line is split,
    * NOT trimmed — a trailing space is a legitimate second symbol
    * (word-final merge), only line endings are stripped. */
  def mergesFromLines(lines: Iterator[String]): Seq[(String, String)] =
    lines.map(_.replaceAll("[\r\n]+$", ""))
      .filter(l => l.trim.nonEmpty && !l.startsWith("#version:"))
      .map { l =>
        val sp = l.indexOf(' ')
        require(sp > 0 && sp < l.length - 1, s"malformed merge line: '$l'")
        (l.substring(0, sp), l.substring(sp + 1))
      }.toSeq

  def bpe_token_count(text: Column,
      merges: Seq[(String, String)] = FixtureMerges): Column =
    column(BpeTokenCount(expression(text), merges))
}
