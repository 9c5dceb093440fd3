package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a TypedImperativeAggregate.
  *
  * Keeps at most `k` (key, count) counters: a tracked key increments
  * its counter; an untracked key either claims a free slot or — when
  * all k are taken — decrements EVERY counter by one, dropping those
  * that reach zero (each decrement cancels one prior increment, so the
  * work is amortized O(1) per row). After N rows the summary's counts
  * under-estimate true frequencies by at most N/(k+1), and every key
  * with true count > N/(k+1) is guaranteed present — no false
  * negatives above that bound, the property heavy-hitter candidate
  * generation rests on.
  *
  * Merging two summaries (map-side partial → final, the standard
  * aggregate dataflow) adds counts pairwise, and when more than k keys
  * result, subtracts the (k+1)-th largest count from all and prunes
  * non-positives — the mergeable-summaries construction (Agarwal et
  * al., PODS 2012), which preserves the combined N/(k+1) error bound.
  * The merged candidate set is therefore ≤ k entries REGARDLESS of
  * partition count: at 100 TB the summary that reaches the final
  * reducer is k counters, not partitions × k.
  *
  * As a registered aggregate (`graft_heavy_hitters(col, k)`) it
  * composes anywhere SQL does: per-group (`GROUP BY site`), windowed,
  * or rolled up — the shapes the mapPartitions formulation could not
  * express. Output: array<struct<key, lb>> sorted by lb desc then key,
  * where lb is the summary's (under-)count — a LOWER bound on true
  * frequency; exact counts come from the recount pass
  * (graft.operators.HeavyHitters) that uses this summary to propose.
  *
  * Supported key types: integral, string, binary (binary normalized to
  * content equality — Array[Byte] hashes by reference).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Any, Long]] {

  require(k >= 1 && k <= (1 << 22), "k must be in [1, 2^22]")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType |
          BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_heavy_hitters requires an integral, string or binary " +
            s"column, got ${other.catalogString}")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", child.dataType),
    StructField("lb", LongType))), containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[Any, Long] =
    new java.util.HashMap[Any, Long](math.min(k * 2L, 1L << 23).toInt)

  /** Catalyst eval output → stable summary key. UTF8String may alias
    * reused row memory and Array[Byte] equals by reference: both copy
    * into content-equality holders. */
  private def keyOf(v: Any): Any = v match {
    case u: UTF8String => u.clone()
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b.clone())
    case x => x
  }

  private def rawOf(v: Any): Any = v match {
    case bb: java.nio.ByteBuffer => bb.array()
    case x => x
  }

  override def update(buf: java.util.HashMap[Any, Long],
      input: InternalRow): java.util.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = keyOf(v)
      val c = buf.get(x) // null unboxes to 0; stored counts are >= 1
      if (c != 0L) buf.put(x, c + 1L)
      else if (buf.size < k) buf.put(x, 1L)
      else {
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[Any, Long],
      other: java.util.HashMap[Any, Long]): java.util.HashMap[Any, Long] = {
    val oit = other.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      val c = buf.get(e.getKey) // null unboxes to 0
      buf.put(e.getKey, c + e.getValue)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, prune <= 0
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - k - 1) // (k+1)-th largest
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= m) it.remove() else e.setValue(e.getValue - m)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[Any, Long]): Any = {
    // deterministic export order: lb desc, then key ascending
    val entries = new scala.collection.mutable.ArrayBuffer[(Any, Long)](buf.size)
    buf.forEach((x, c) => entries += ((rawOf(x), c)))
    def keyLt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: UTF8String, y: UTF8String) => x.compareTo(y) < 0
      case (x: Array[Byte], y: Array[Byte]) =>
        java.util.Arrays.compareUnsigned(x, y) < 0
      case (x: Number, y: Number) => x.longValue < y.longValue
      case _ => false
    }
    val sorted = entries.sortWith { case ((ka, ca), (kb, cb)) =>
      if (ca != cb) ca > cb else keyLt(ka, kb)
    }
    new GenericArrayData(sorted.map { case (x, c) =>
      InternalRow(x, c) }.toArray[Any])
  }

  override def serialize(buf: java.util.HashMap[Any, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (x, c) =>
      child.dataType match {
        case StringType =>
          val b = x.asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
        case BinaryType =>
          val b = x.asInstanceOf[java.nio.ByteBuffer].array()
          out.writeInt(b.length); out.write(b)
        case _ => out.writeLong(x.asInstanceOf[Number].longValue)
      }
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Any, Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[Any, Long](n * 2)
    var i = 0
    while (i < n) {
      val x: Any = child.dataType match {
        case StringType =>
          val b = new Array[Byte](in.readInt()); in.readFully(b)
          UTF8String.fromBytes(b)
        case BinaryType =>
          val b = new Array[Byte](in.readInt()); in.readFully(b)
          java.nio.ByteBuffer.wrap(b)
        case ByteType => java.lang.Byte.valueOf(in.readLong().toByte)
        case ShortType => java.lang.Short.valueOf(in.readLong().toShort)
        case IntegerType => java.lang.Integer.valueOf(in.readLong().toInt)
        case _ => java.lang.Long.valueOf(in.readLong())
      }
      buf.put(x, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_heavy_hitters"
}

object MisraGries {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Aggregate: Misra-Gries summary of `c` with capacity `k` —
    * array<struct<key, lb>>, every key with true count > N/(k+1)
    * guaranteed present, lb a lower bound on its true count. */
  def mg_summary(c: Column, k: Int): Column =
    column(MisraGriesAgg(expression(c), k).toAggregateExpression())
}
