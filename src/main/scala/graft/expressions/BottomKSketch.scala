package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bottom-k (KMV) distinct-count sketch as a TypedImperativeAggregate.
  *
  * Hashes each value with the deterministic affine hash
  * h = (a·x + b) mod p (p = 1e9+7) and keeps the k smallest DISTINCT
  * hashes per group. Mergeable (union + trim), bounded memory (k longs),
  * one pass — the sketch family a 100 TB engine uses where exact
  * countDistinct would shuffle every value. Unlike HLL, the
  * deterministic hash makes the whole sketch exactly reproducible in
  * SQL, so the driver gate can hash-compare sketch content AND the
  * (k−1)·p/h_k estimate, not just eyeball the estimate's error.
  *
  * Buffer: growable sorted-unique long array capped at k.
  */
case class BottomKSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, "bottom-k sketch needs k >= 2")

  val P = 1000000007L
  val A = 2654435761L % P
  val B = 40503L * 69069L % P

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("estimate", DoubleType, nullable = false),
    StructField("hashes", ArrayType(LongType, containsNull = false))))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def hash(x: Long): Long = {
    val v = ((x % P) + P) % P
    (A * v + B) % P
  }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: org.apache.spark.sql.catalyst.InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hash(v.asInstanceOf[Number].longValue)
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { if (buf.add(h)) buf.pollLast() }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { if (buf.add(h)) buf.pollLast() }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    import scala.jdk.CollectionConverters._
    val hs = buf.iterator().asScala.map(_.longValue).toArray
    // KMV estimator: with fewer than k distinct values the sketch is
    // exact; otherwise (k-1) * p / h_k
    val est =
      if (hs.length < k) hs.length.toDouble
      else (k - 1).toDouble * P / hs.last
    org.apache.spark.sql.catalyst.InternalRow(
      est, new GenericArrayData(hs))
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomKSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_bottomk_sketch"
}

object BottomKSketch {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def bottomk_sketch(c: Column, k: Int): Column =
    column(BottomKSketchAgg(expression(c), k).toAggregateExpression())
}
