package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** k-row generalization of [[ArgMaxRow]]: per group, the `payload` values
  * of the k rows with the extreme `ord` values, returned best-first as
  * `array<payload-type>`. `reverse=true` keeps the k smallest (ascending
  * ranks over an ascending ORDER BY); `reverse=false` the k largest.
  *
  * This is the aggregate behind the `row_number() <= k` rewrite: the
  * buffer is a k-capped binary heap of (ord, payload) pair-rows with the
  * current worst at the head, so partial aggregation ships at most k rows
  * per group per task and nothing is sorted except the final k-element
  * drain. Unlike [[TopKPairs]] (which carries a scalar id) the payload
  * here is an arbitrary struct, and unlike a TreeSet buffer the heap
  * KEEPS duplicates — two rows with equal ordering values are distinct
  * contenders, exactly as they are for row_number. Among equal-ord rows
  * the selection is arbitrary, matching row_number over a non-total
  * order; pass a total order for determinism.
  */
case class TopKRows(ord: Expression, payload: Expression, k: Int, reverse: Boolean,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[UnsafeRow]] {

  require(k > 0, s"k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ArgMaxRow.orderable(ord.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName ordering type ${ord.dataType.sql} is not orderable")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(ord, payload)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKRows =
    copy(ord = c(0), payload = c(1))
  override def withNewMutableAggBufferOffset(o: Int): TopKRows =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKRows =
    copy(inputAggBufferOffset = o)

  // containsNull tracks the payload's nullability (a nullable payload CAN
  // emit null elements — same reasoning as TopKRowsSorted; the rewrite
  // rule's CreateStruct payloads are never null, so its plans keep
  // containsNull = false)
  override def dataType: DataType = ArrayType(payload.dataType, containsNull = payload.nullable)
  override def nullable: Boolean = false
  override def prettyName: String = if (reverse) "graft_bottomk_rows" else "graft_topk_rows"

  @transient private lazy val pairProj: UnsafeProjection =
    UnsafeProjection.create(Seq(ord, payload))
  @transient private lazy val baseOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ord.dataType)

  // compare two pair-rows on their ord field, null-smallest
  private def cmpOrd(a: UnsafeRow, b: UnsafeRow): Int = {
    val an = a.isNullAt(0)
    val bn = b.isNullAt(0)
    val c =
      if (an && bn) 0
      else if (an) -1
      else if (bn) 1
      else baseOrdering.compare(a.get(0, ord.dataType), b.get(0, ord.dataType))
    if (reverse) -c else c
  }

  // worst-first heap: head is the element to evict
  private def worstFirst: java.util.Comparator[UnsafeRow] =
    new java.util.Comparator[UnsafeRow] with Serializable {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = cmpOrd(a, b)
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[UnsafeRow] =
    new java.util.PriorityQueue[UnsafeRow](k, worstFirst)

  private def add(buf: java.util.PriorityQueue[UnsafeRow], pair: UnsafeRow): Unit =
    if (buf.size < k) { buf.add(pair.copy()); () }
    else if (cmpOrd(pair, buf.peek()) > 0) { buf.poll(); buf.add(pair.copy()); () }

  override def update(buf: java.util.PriorityQueue[UnsafeRow],
                      input: InternalRow): java.util.PriorityQueue[UnsafeRow] = {
    add(buf, pairProj(input))
    buf
  }

  override def merge(b1: java.util.PriorityQueue[UnsafeRow],
                     b2: java.util.PriorityQueue[UnsafeRow]): java.util.PriorityQueue[UnsafeRow] = {
    val it = b2.iterator()
    while (it.hasNext) {
      val pair = it.next()
      if (b1.size < k) { b1.add(pair); () }
      else if (cmpOrd(pair, b1.peek()) > 0) { b1.poll(); b1.add(pair); () }
    }
    b1
  }

  override def eval(buf: java.util.PriorityQueue[UnsafeRow]): Any = {
    val n = buf.size
    val arr = new Array[UnsafeRow](n)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    // drain order of a heap is arbitrary beyond the head — sort best-first
    java.util.Arrays.sort(arr, worstFirst.reversed())
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = arr(i).get(1, payload.dataType); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.PriorityQueue[UnsafeRow]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.iterator()
    while (it0.hasNext) bytes += 4 + it0.next().getSizeInBytes
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val r = it.next()
      bb.putInt(r.getSizeInBytes)
      bb.put(r.getBytes)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[UnsafeRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val r = new UnsafeRow(2)
      r.pointTo(b, len)
      buf.add(r)
      i += 1
    }
    buf
  }
}
