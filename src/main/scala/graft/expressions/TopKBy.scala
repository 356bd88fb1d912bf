package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded exact per-group top-k as a real aggregate:
  * `topk_by(item, score, k)` returns the k items with the highest
  * scores (ties broken by ascending item — a total order, so the
  * result is deterministic on any partitioning).
  *
  * Why an aggregate and not `row_number() OVER (PARTITION BY g ORDER
  * BY score DESC)` + filter: the window form shuffles EVERY input row
  * to its group's reducer and sorts there (WindowGroupLimit prunes
  * per-partition but only after a full sort exchange of the row
  * payload). An aggregate gets partial aggregation for free: each map
  * task keeps a k-bounded heap per group, so the exchange carries at
  * most k (score, item) pairs per group per partition — at 100 TB the
  * shuffle is group-count-sized, not row-count-sized. This is the
  * same partial/final contract every builtin agg has; Spark plans it
  * as ObjectHashAggregate (the reference's top-k result assembly is a
  * driver-side bounded sort, `/root/reference/src/query/keyword.zig`'s
  * sorted_blocks — here the bound is pushed all the way into the map
  * side).
  *
  * Item types: STRING, INT, BIGINT, DOUBLE (string tie-break is
  * binary byte order — equals DuckDB's default collation for ASCII).
  * Score must be DOUBLE (callers cast). NULL item or score rows are
  * ignored. Empty group → empty array.
  */
case class TopKBy(
    item: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByBuffer] with BinaryLike[Expression] {

  require(k >= 1, s"topk_by requires k >= 1; got k=$k")

  override def left: Expression = item
  override def right: Expression = score

  private def itemTypeOk(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | DoubleType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!itemTypeOk(item.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_by item must be STRING/INT/BIGINT/DOUBLE, got ${item.dataType.simpleString}")
    else if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by score must be DOUBLE, got ${score.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(item.dataType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "topk_by"

  override def createAggregationBuffer(): TopKByBuffer = new TopKByBuffer(k)

  override def update(buffer: TopKByBuffer, input: InternalRow): TopKByBuffer = {
    val s = score.eval(input)
    if (s != null) {
      val it = item.eval(input)
      if (it != null) {
        // UTF8String from an unsafe row points into a reused buffer —
        // copy only when the element is actually kept
        buffer.offer(s.asInstanceOf[Double], it)
      }
    }
    buffer
  }

  override def merge(buffer: TopKByBuffer, other: TopKByBuffer): TopKByBuffer = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: TopKByBuffer): Any =
    new GenericArrayData(buffer.toDescArray)

  override def serialize(buffer: TopKByBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { (s, it) =>
      out.writeDouble(s)
      item.dataType match {
        case StringType =>
          val b = it.asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
        case IntegerType => out.writeInt(it.asInstanceOf[Int])
        case LongType => out.writeLong(it.asInstanceOf[Long])
        case DoubleType => out.writeDouble(it.asInstanceOf[Double])
        case dt => throw new IllegalStateException(s"topk_by: $dt")
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKByBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKByBuffer(k)
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val it: Any = item.dataType match {
        case StringType =>
          val len = in.readInt(); val b = new Array[Byte](len)
          in.readFully(b); UTF8String.fromBytes(b)
        case IntegerType => in.readInt()
        case LongType => in.readLong()
        case DoubleType => in.readDouble()
        case dt => throw new IllegalStateException(s"topk_by: $dt")
      }
      buf.offer(s, it)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKBy =
    copy(item = newLeft, score = newRight)
}

/** k-bounded heap of (score, item): head = the WORST kept element
  * under (score DESC, item ASC) goodness, so a better arrival evicts
  * it in O(log k). Item comparison is the natural Comparable order of
  * the boxed value (UTF8String compares bytewise).
  */
final class TopKByBuffer(k: Int) {

  // comparator: ascending goodness (worst first). a worse than b ⇔
  // lower score, or equal score and GREATER item.
  private val worstFirst = new java.util.Comparator[Array[AnyRef]] {
    override def compare(a: Array[AnyRef], b: Array[AnyRef]): Int = {
      val c = java.lang.Double.compare(
        a(0).asInstanceOf[Double], b(0).asInstanceOf[Double])
      if (c != 0) c
      else b(1).asInstanceOf[Comparable[AnyRef]].compareTo(a(1))
    }
  }

  private val heap = new java.util.PriorityQueue[Array[AnyRef]](k, worstFirst)

  def offer(score: Double, itemRaw: Any): Unit = {
    if (heap.size() < k) {
      heap.add(Array[AnyRef](Double.box(score), copyOf(itemRaw)))
    } else {
      val worst = heap.peek()
      val c = java.lang.Double.compare(score, worst(0).asInstanceOf[Double])
      val better = c > 0 || (c == 0 &&
        worst(1).asInstanceOf[Comparable[AnyRef]]
          .compareTo(copyRef(itemRaw)) > 0)
      if (better) {
        heap.poll()
        heap.add(Array[AnyRef](Double.box(score), copyOf(itemRaw)))
      }
    }
  }

  /** Copy an item that we are about to RETAIN (UTF8String may point
    * into a reused row buffer). */
  private def copyOf(itemRaw: Any): AnyRef = itemRaw match {
    case s: UTF8String => s.clone()
    case other => other.asInstanceOf[AnyRef]
  }

  /** View for a transient comparison — no copy needed. */
  private def copyRef(itemRaw: Any): AnyRef = itemRaw.asInstanceOf[AnyRef]

  def absorb(other: TopKByBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      // already copied on the other side — offer would re-copy a
      // UTF8String harmlessly (clone of a heap string)
      offer(e(0).asInstanceOf[Double], e(1))
    }
  }

  def size: Int = heap.size()

  /** Visit kept (score, item) pairs in heap (arbitrary) order. */
  def foreach(f: (Double, AnyRef) => Unit): Unit = {
    val it = heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      f(e(0).asInstanceOf[Double], e(1))
    }
  }

  /** Items best-first: score DESC, item ASC. */
  def toDescArray: Array[AnyRef] = {
    val arr = heap.toArray(new Array[Array[AnyRef]](heap.size()))
    java.util.Arrays.sort(arr, worstFirst.reversed())
    arr.map(_(1))
  }
}
