package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Marker-based language ID as one kernel: distinct tokens intersected
  * with each language's marker set, argmax with first-listed priority,
  * "unknown" when no marker hits. Replaces 4 tokenize+intersect
  * pipelines + an argmax when-chain that Catalyst re-inlines per
  * comparison (~12 tokenizations/row → 1). Semantics locked to the
  * t3_lang_id DuckDB oracle. */
case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression {
  override def dataType: DataType = StringType

  @transient private lazy val markerSets: Array[(UTF8String, Set[String])] =
    markers.map { case (l, ms) => (UTF8String.fromString(l), ms.toSet) }.toArray
  @transient private lazy val unknown = UTF8String.fromString("unknown")

  def kernel(v: UTF8String): UTF8String = {
    val toks = TextKernels.tokenize(v).toSet
    var bestIdx = -1
    var bestScore = 0
    var i = 0
    while (i < markerSets.length) {
      var score = 0
      val ms = markerSets(i)._2
      toks.foreach(t => if (ms.contains(t)) score += 1)
      // strict '>' keeps the first-listed language on ties
      if (score > bestScore) { bestScore = score; bestIdx = i }
      i += 1
    }
    if (bestIdx < 0) unknown else markerSets(bestIdx)._1
  }
  override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[UTF8String])
  // direct compiled-kernel call — no interpreted-eval dispatch
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langId", this, classOf[LangIdExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  override def prettyName: String = "graft_lang_id"
  override protected def withNewChildInternal(c: Expression): LangIdExpr =
    copy(child = c)
}

/** [[LangIdExpr]] with a CONFIDENCE the curation gate can threshold:
  * struct (lang, conf_permille) where conf_permille is the winning
  * language's share of ALL marker hits, as an exact per-mille
  * (round-half-away in pure integer arithmetic — the [[graft.queries.Exact.roundDiv]]
  * formula, so a DuckDB oracle replays it bit-for-bit). A text hitting
  * only English markers scores 1000; one split evenly between English
  * and French scores 500 — the hard argmax label alone can't tell
  * those apart, and a training-data gate wants to DROP the ambiguous
  * one, not coin-flip it. No marker hit at all → ("unknown", 0).
  * Same marker sets, same tokenization, same first-listed tie rule as
  * the unscored kernel: the label field always equals [[LangIdExpr]]. */
case class LangIdScoredExpr(child: Expression,
    markers: Seq[(String, Seq[String])]) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("conf_permille", IntegerType, nullable = false)))

  @transient private lazy val markerSets: Array[(UTF8String, Set[String])] =
    markers.map { case (l, ms) => (UTF8String.fromString(l), ms.toSet) }.toArray
  @transient private lazy val unknown = UTF8String.fromString("unknown")

  def kernel(v: UTF8String): InternalRow = {
    val toks = TextKernels.tokenize(v).toSet
    var bestIdx = -1
    var bestScore = 0
    var total = 0L
    var i = 0
    while (i < markerSets.length) {
      var score = 0
      val ms = markerSets(i)._2
      toks.foreach(t => if (ms.contains(t)) score += 1)
      total += score
      // strict '>' keeps the first-listed language on ties
      if (score > bestScore) { bestScore = score; bestIdx = i }
      i += 1
    }
    if (bestIdx < 0) InternalRow(unknown, 0)
    else InternalRow(markerSets(bestIdx)._1,
      ((2000L * bestScore + total) / (2L * total)).toInt)
  }
  override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdScored", this,
      classOf[LangIdScoredExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  override def prettyName: String = "graft_lang_id_scored"
  override protected def withNewChildInternal(c: Expression): LangIdScoredExpr =
    copy(child = c)
}

/** One-pass text statistics struct:
  * (n_tokens, n_distinct, sum_token_len, n_stopword_tokens,
  *  n_chars, n_punct_chars, n_nonalpha_chars).
  * The quality/ratio queries project fields off a single evaluation
  * instead of re-tokenizing per output column. Character classes match
  * the HOF forms: punct = ASCII \p{Punct}; alpha = [a-z ] of the
  * lowercased text. */
case class TextStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_nonalpha", IntegerType, nullable = false)))

  @transient private lazy val stopSet = stopwords.toSet

  def kernel(v: UTF8String): InternalRow = {
    val s = v.toString
    val toks = TextKernels.tokenize(v)
    var sumLen = 0L
    var nStop = 0
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) {
      sumLen += toks(i).length
      if (stopSet.contains(toks(i))) nStop += 1
      distinct.add(toks(i))
      i += 1
    }
    // character classes over the original string (codepoint count
    // parity with Spark length(): UTF-16 units for BMP text)
    var nPunct = 0
    var nNonAlpha = 0
    var j = 0
    while (j < s.length) {
      val c = s.charAt(j)
      if (c >= '!' && c <= '~' &&
        !Character.isLetterOrDigit(c)) nPunct += 1
      val lc = Character.toLowerCase(c)
      if (!((lc >= 'a' && lc <= 'z') || lc == ' ')) nNonAlpha += 1
      j += 1
    }
    InternalRow(
      toks.length, distinct.size, sumLen, nStop, s.length, nPunct, nNonAlpha)
  }
  override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStats", this, classOf[TextStatsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  override def prettyName: String = "graft_text_stats"
  override protected def withNewChildInternal(c: Expression): TextStatsExpr =
    copy(child = c)
}

object TextStatsExpressions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  import graft.text.TextFunctions

  def lang_id(text: Column): Column =
    column(LangIdExpr(expression(text), TextFunctions.LangMarkers))
  def lang_id_scored(text: Column): Column =
    column(LangIdScoredExpr(expression(text), TextFunctions.LangMarkers))
  def text_stats(text: Column): Column =
    column(TextStatsExpr(expression(text), TextFunctions.EnStopwords))
}
