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

/** Set-operation estimates from two bottom-k sketches — Jaccard,
  * intersection and union cardinality WITHOUT touching the raw sets
  * again (Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD'07: the combined bottom-k of a
  * union is computable from the two sketches alone, and the fraction
  * of it landing in both input sketches estimates the Jaccard).
  *
  * At 100 TB this is the shape that answers "how much do corpus A and
  * corpus B overlap?" from two k-long arrays: each side aggregates its
  * own sketch (one pass, mergeable, bounded memory), the combine is a
  * single cross join of two one-row frames. The deterministic affine
  * hash keeps every output reproducible bit-for-bit in plain SQL, so
  * the whole estimate — not just its error band — is oracle-checkable.
  *
  * All arithmetic is integer (`div`), rounding is the repo's rational
  * convention floor((2·num·10³ + den) / (2·den)):
  *   m         = |bottom-k of hash(A) ∪ hash(B)|
  *   kth       = largest hash in that combined sketch (0 when empty)
  *   x_common  = how many of the m combined hashes appear in BOTH
  *               input sketches
  *   union_est = m exactly when m < k (sketches saw everything),
  *               else (k−1)·p div kth
  *   inter_est = x_common (exact mode) | x_common·union_est div k
  *   jacc_permille = rational-rounded 1000·x_common/denominator
  *               (denominator = m exact mode, else k)
  */
object SketchSetOps {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  /** One-row (m, kth, x_common, union_est, inter_est, jacc_permille)
    * over the distinct sets of `a.aCol` and `b.bCol`. */
  def estimate(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"sketch set ops need k >= 2, got $k")
    val ska = a.agg(BottomKSketch.bottomk_sketch(col(aCol), k).as("ska"))
      .select(col("ska.hashes").as("ha"))
    val skb = b.agg(BottomKSketch.bottomk_sketch(col(bCol), k).as("skb"))
      .select(col("skb.hashes").as("hb"))
    ska.crossJoin(skb)
      .select(
        expr(s"slice(array_sort(array_union(ha, hb)), 1, $k)").as("u"),
        col("ha"), col("hb"))
      .select(
        size(col("u")).cast("long").as("m"),
        expr("CASE WHEN size(u) > 0 THEN element_at(u, size(u)) " +
          "ELSE CAST(0 AS BIGINT) END").as("kth"),
        size(expr("array_intersect(array_intersect(u, ha), hb)"))
          .cast("long").as("x_common"))
      .select(col("m"), col("kth"), col("x_common"),
        expr(s"CASE WHEN m < $k THEN m ELSE " +
          s"(${k - 1} * CAST(1000000007 AS BIGINT)) div kth END")
          .as("union_est"))
      .select(col("m"), col("kth"), col("x_common"), col("union_est"),
        expr(s"CASE WHEN m < $k THEN x_common " +
          s"ELSE (x_common * union_est) div $k END").as("inter_est"),
        expr(s"CASE WHEN m = 0 THEN CAST(0 AS BIGINT) ELSE " +
          s"(2 * x_common * 1000 + (CASE WHEN m < $k THEN m ELSE $k END)) " +
          s"div (2 * (CASE WHEN m < $k THEN m ELSE $k END)) END")
          .as("jacc_permille"))
  }
}
