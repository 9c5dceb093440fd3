package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass kernels for the uint8 embedding-quantization path.
  *
  * The composed higher-order-function forms in
  * similarity/VectorFunctions (quantizeU8Hof / dequantizeU8Hof /
  * codeDotHof) are semantically identical, but each builds a large
  * Catalyst lambda tree (transform + array_min/max + zip_with +
  * aggregate, ~hundreds of generated-Java lines per call site) whose
  * whole-stage compile dominates cold query time — measured ~3 s of
  * one-time Janino compile for the v7/v8 quantized-search queries.
  * These expressions compute the same values in one tight JVM loop and
  * generate a single kernel call, so both the compile and the per-row
  * cost collapse. Semantics (double fold order, floor+0.5 rounding,
  * constant-vector all-zeros, null/empty propagation) are locked to the
  * HOF forms by differential tests in KernelSpec and to the DuckDB
  * oracle SQL in queries/Similarity.scala.
  */
object QuantKernels {
  def numAt(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case LongType => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case other => throw new IllegalArgumentException(s"bad element: $other")
  }

  /** Spark SQL's double ordering (-0.0 == 0.0, NaN greatest, NaN == NaN)
    * so the kernel's vmin/vmax match array_min/array_max exactly on
    * NaN-bearing vectors. */
  def cmp(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  def isQuantizableArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType | LongType | IntegerType, _) => true
    case _ => false
  }
}

/** Affine uint8 quantization of a numeric array:
  * struct(codes: array<int>, vmin: double, vmax: double) with
  * code_i = floor((x_i − min)·255/(max − min) + 0.5); all-zero codes for
  * constant vectors; null min/max (and empty codes) for empty input;
  * null code elements mirror null input elements (including in the
  * constant-vector branch). vmin/vmax follow Spark's double ordering
  * (NaN greatest, NaN == NaN), so a NaN-bearing vector gets vmax = NaN
  * and — the scale being NaN — all-zero codes (NaN.toInt); the HOF form
  * cannot express this (ANSI cast of NaN to int throws), so NaN inputs
  * are covered by kernel-only tests, not differential ones. */
case class QuantizeU8Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (QuantKernels.isQuantizableArray(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double|int|bigint>, " +
        s"got ${child.dataType.catalogString}")
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = true), nullable = false),
    StructField("vmin", DoubleType, nullable = true),
    StructField("vmax", DoubleType, nullable = true)))
  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  def kernel(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var mn = Double.MaxValue; var mx = Double.MinValue; var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = QuantKernels.numAt(arr, i, elemType)
        if (!seen || QuantKernels.cmp(x, mn) < 0) mn = x
        if (!seen || QuantKernels.cmp(x, mx) > 0) mx = x
        seen = true
      }
      i += 1
    }
    val constant = seen && QuantKernels.cmp(mx, mn) == 0
    val codes = new Array[Any](n)
    i = 0
    while (i < n) {
      if (arr.isNullAt(i)) codes(i) = null
      else if (constant) codes(i) = 0
      else {
        val x = QuantKernels.numAt(arr, i, elemType)
        codes(i) = math.floor((x - mn) * 255.0 / (mx - mn) + 0.5).toInt
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(codes),
      if (seen) mn else null,
      if (seen) mx else null))
  }
  override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantU8", this, classOf[QuantizeU8Expr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  override def prettyName: String = "graft_quantize_u8"
  override protected def withNewChildInternal(c: Expression): QuantizeU8Expr =
    copy(child = c)
}

/** Inverse of [[QuantizeU8Expr]]: x̂_i = vmin + code_i·(vmax − vmin)/255
  * (null elements and null min/max propagate as null elements). */
case class DequantizeU8Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(
        StructField(_, ArrayType(IntegerType, _), _, _),
        StructField(_, DoubleType, _, _),
        StructField(_, DoubleType, _, _))) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires struct<codes: array<int>, vmin: double, " +
        s"vmax: double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  def kernel(q: InternalRow): ArrayData = {
    val codes = q.getArray(0)
    val mnNull = q.isNullAt(1); val mxNull = q.isNullAt(2)
    val mn = if (mnNull) 0.0 else q.getDouble(1)
    val mx = if (mxNull) 0.0 else q.getDouble(2)
    val n = codes.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (mnNull || mxNull || codes.isNullAt(i)) null
        else mn + codes.getInt(i).toDouble * (mx - mn) / 255.0
      i += 1
    }
    new GenericArrayData(out)
  }
  override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dequantU8", this, classOf[DequantizeU8Expr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }
  override def prettyName: String = "graft_dequantize_u8"
  override protected def withNewChildInternal(c: Expression): DequantizeU8Expr =
    copy(child = c)
}

/** BIGINT-exact dot product of two integer code arrays; null when the
  * lengths differ or any paired element is null (zip_with-pad
  * semantics, matching the HOF/oracle forms). */
case class CodeDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(IntegerType | LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int|bigint> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  private def isLong(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == LongType
  def kernel(a: ArrayData, b: ArrayData): java.lang.Long = {
    val la = a.numElements(); val lb = b.numElements()
    if (la != lb) return null
    val aLong = isLong(left); val bLong = isLong(right)
    var sum = 0L
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aLong) a.getLong(i) else a.getInt(i).toLong
      val y = if (bLong) b.getLong(i) else b.getInt(i).toLong
      sum += x * y
      i += 1
    }
    sum
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codeDot", this, classOf[CodeDotExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = $ref.kernel($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }""")
  }
  override def prettyName: String = "graft_code_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : CodeDotExpr = copy(left = l, right = r)
}

object QuantExpressions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def quantize_u8(v: Column): Column = column(QuantizeU8Expr(expression(v)))
  def dequantize_u8(q: Column): Column = column(DequantizeU8Expr(expression(q)))
  def code_dot(a: Column, b: Column): Column =
    column(CodeDotExpr(expression(a), expression(b)))
}
