package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-Min frequency sketch as a TypedImperativeAggregate.
  *
  * depth rows of width counters; value x increments cell
  * (i, ((aᵢ·x + bᵢ) mod p) mod width) for each row i, with the same
  * deterministic affine hash family the MinHash kernels use
  * (graft.dedup.Dedup.hashA/hashB, p = 1e9+7). Point frequency
  * estimate = min over rows of the addressed cell — an overestimate
  * with error ≤ ε·N (ε ≈ e/width) at probability 1−δ (δ ≈ e^−depth).
  *
  * The scale role: heavy-hitter / frequency screening over 100 TB
  * streams in O(depth·width) memory per group, mergeable map-side
  * (cell-wise add), one pass, no shuffle of values. The deterministic
  * hash family (not random seeds) makes the ENTIRE cell grid exactly
  * reproducible in SQL, so the driver gate hash-compares every
  * non-zero cell against DuckDB — the same exactness standard as the
  * KMV sketch (a2c), not an eyeballed error bound.
  *
  * Buffer: one long array of depth·width cells (no boxing, cell-wise
  * merge).
  */
case class CountMinSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, "depth must be in [1,16]")
  require(width >= 2 && width <= (1 << 20), "width must be in [2,2^20]")

  // the affine hash consumes longValue; reject non-integral children at
  // ANALYSIS time instead of a ClassCastException inside the aggregate
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cms_sketch requires an integral column " +
            s"(tinyint|smallint|int|bigint), got ${other.catalogString}")
    }

  private val P = 1000000007L

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("cells", ArrayType(LongType, containsNull = false))))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = (v.asInstanceOf[Number].longValue % P + P) % P
      var i = 0
      while (i < depth) {
        val h = (graft.dedup.Dedup.hashA(i) * x
          + graft.dedup.Dedup.hashB(i)) % P
        buf(i * width + (h % width).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    InternalRow(new GenericArrayData(buf))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_cms_sketch"
}

object CountMinSketch {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  private val P = 1000000007L

  /** Aggregate: Count-Min cell grid over a numeric column. */
  def cms_sketch(c: Column, depth: Int, width: Int): Column =
    column(CountMinSketchAgg(expression(c), depth, width)
      .toAggregateExpression())

  /** Point-frequency estimate from a cms_sketch `cells` array — pure
    * column arithmetic (codegen'd), usable per-row against a
    * broadcast/joined sketch. min over depth rows of the addressed
    * cell; an upper bound on the true count by construction. */
  def cms_estimate(cells: Column, value: Column,
      depth: Int, width: Int): Column = {
    val aArr = lit((0 until depth).map(graft.dedup.Dedup.hashA).toArray)
    val bArr = lit((0 until depth).map(graft.dedup.Dedup.hashB).toArray)
    val x = pmod(value.cast("long"), lit(P))
    array_min(transform(
      sequence(lit(0), lit(depth - 1)),
      i => get(cells,
        (i * lit(width)
          + pmod(pmod(get(aArr, i) * x + get(bArr, i), lit(P)), lit(width)))
          .cast("int"))))
  }
}
