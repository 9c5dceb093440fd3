package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernels for the hot text/vector paths. Each replaces a
  * composed higher-order-function pipeline whose lambdas evaluate
  * interpreted per element (measured: ~1–2 ms/row for 300-token shingling
  * vs ~50 µs here; the pair-join queries amplify that per candidate).
  * Semantics are locked to the HOF forms (differential-tested) and to
  * the DuckDB oracles. */
object TextKernels {

  /** Whitespace tokens of lower(trim(s)) — exactly Java split("\\s+")
    * semantics on the lowercased string (\s = [ \t\n\f\r]). */
  def tokenize(s: UTF8String): Array[String] = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = str.length
    def isWs(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    while (i < n) {
      while (i < n && isWs(str.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(str.charAt(i))) i += 1
      if (i > start) out += str.substring(start, i)
    }
    out.toArray
  }
}

/** lower+trim+whitespace-split tokens as one kernel. */
case class TokenizeExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  def kernel(v: UTF8String): ArrayData =
    new GenericArrayData(TextKernels.tokenize(v).map(UTF8String.fromString(_)))
  override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[UTF8String])
  // direct compiled-kernel call: keeps the whole-stage span, skips the
  // interpreted-eval dispatch CodegenFallback would emit
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenize", this, classOf[TokenizeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  override def prettyName: String = "graft_tokenize"
  override protected def withNewChildInternal(c: Expression): TokenizeExpr =
    copy(child = c)
}

/** Word n-gram shingles ("a b c") of the tokenized text, one pass. */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  def kernel(v: UTF8String): ArrayData = {
    val toks = TextKernels.tokenize(v)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
  override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, classOf[WordShinglesExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  override def prettyName: String = "graft_word_shingles"
  override protected def withNewChildInternal(c: Expression): WordShinglesExpr =
    copy(child = c)
}

/** Sign-random-projection LSH code: `planes` sign bits of deterministic
  * integer-arithmetic hyperplane projections (sequential double fold per
  * plane — bit-exact vs the HOF form and the SQL oracle). */
case class LshCodeExpr(child: Expression, planes: Int, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  def kernel(arr: ArrayData): Long = {
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) { vec(i) = numAt(arr, i); i += 1 }
    var code = 0L
    var j = 0
    while (j < planes) {
      var acc = 0.0
      i = 0
      while (i < dim) {
        val coef = (((2654435761L * (j.toLong * dim + i + 1)) % 1000000007L)
          % 2001L - 1000L).toDouble / 1000.0
        acc = acc + vec(i) * coef
        i += 1
      }
      if (acc > 0) code |= (1L << j)
      j += 1
    }
    code
  }
  override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshCode", this, classOf[LshCodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  private def numAt(arr: ArrayData, i: Int): Double =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case LongType => arr.getLong(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case other => throw new IllegalArgumentException(s"bad element: $other")
    }
  override def prettyName: String = "graft_lsh_code"
  override protected def withNewChildInternal(c: Expression): LshCodeExpr =
    copy(child = c)
}

/** Cosine similarity of two numeric arrays — sequential left-fold double
  * arithmetic (dot and both norms in ONE pass, each accumulator folded
  * in index order, matching the HOF/oracle bit-for-bit); 0.0 when either
  * norm is zero. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  def kernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    val at = elemType(left)
    val bt = elemType(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, at); val y = get(b, i, bt)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosine", this, classOf[CosineSimExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.kernel($a, $b);")
  }
  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
  private def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case LongType => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case other => throw new IllegalArgumentException(s"bad element: $other")
  }
  override def prettyName: String = "graft_cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : CosineSimExpr = copy(left = l, right = r)
}

object TextKernelExpressions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def tokenize(c: Column): Column = column(TokenizeExpr(expression(c)))
  def word_shingles(c: Column, n: Int): Column =
    column(WordShinglesExpr(expression(c), n))
  def lsh_code(v: Column, planes: Int, dim: Int): Column =
    column(LshCodeExpr(expression(v), planes, dim))
  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSimExpr(expression(a), expression(b)))
}
