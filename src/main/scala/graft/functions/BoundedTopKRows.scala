package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Shared machinery for the bounded-heap top-k-rows aggregates
  * ([[TopKRows]], [[TopKRowsSorted]]): a k-capped worst-at-head binary
  * heap of UnsafeRow pairs (ordering fields + the payload), map-side
  * mergeable, with length-prefixed byte serde. Subclasses supply only
  * the pair projection and the ORDER BY comparison; everything about
  * buffering, merging, draining best-first, and shipping partial
  * buffers lives here once.
  *
  * The heap KEEPS duplicate ordering values — two rows with equal ord
  * are distinct contenders, exactly as they are for `row_number()`.
  * Partial aggregation ships at most k pair-rows per group per task and
  * nothing is sorted except the final k-element drain.
  */
abstract class BoundedTopKRows
  extends TypedImperativeAggregate[java.util.PriorityQueue[UnsafeRow]] {

  def k: Int
  protected def payload: Expression

  /** Field count of a buffered pair row (ordering fields + the payload,
    * which is always the LAST field). */
  protected def pairArity: Int

  /** Projection building a pair row from an input row. */
  protected def pairProj: UnsafeProjection

  /** <0 iff pair-row `a` ranks BEFORE pair-row `b` under this
    * aggregate's ORDER BY (i.e. `a` is the better contender). */
  protected def orderCompare(a: UnsafeRow, b: UnsafeRow): Int

  // containsNull tracks the payload's own nullability: a nullable
  // payload expression CAN buffer and emit null elements, and declaring
  // them away would let downstream null-check elision read garbage (the
  // in-repo callers pass struct(...), which is never null)
  override def dataType: DataType =
    ArrayType(payload.dataType, containsNull = payload.nullable)
  override def nullable: Boolean = false

  // worst-first heap: head sorts LAST under the ORDER BY (the eviction
  // victim), so the comparator is the reversed order — reversed by
  // swapping arguments, not negating (compare() is not contracted to
  // survive -x at Int.MinValue)
  private def worstFirst: java.util.Comparator[UnsafeRow] =
    new java.util.Comparator[UnsafeRow] with Serializable {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = orderCompare(b, a)
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[UnsafeRow] =
    new java.util.PriorityQueue[UnsafeRow](k, worstFirst)

  private def add(buf: java.util.PriorityQueue[UnsafeRow], pair: UnsafeRow,
                  copied: Boolean): Unit =
    if (buf.size < k) { buf.add(if (copied) pair else pair.copy()); () }
    else if (orderCompare(pair, buf.peek()) < 0) {
      buf.poll()
      buf.add(if (copied) pair else pair.copy())
      ()
    }

  override def update(buf: java.util.PriorityQueue[UnsafeRow],
                      input: InternalRow): java.util.PriorityQueue[UnsafeRow] = {
    add(buf, pairProj(input), copied = false)
    buf
  }

  override def merge(b1: java.util.PriorityQueue[UnsafeRow],
                     b2: java.util.PriorityQueue[UnsafeRow]): java.util.PriorityQueue[UnsafeRow] = {
    // rows in b2 came out of deserialize/update and own their bytes —
    // no defensive copy on merge
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next(), copied = true)
    b1
  }

  override def eval(buf: java.util.PriorityQueue[UnsafeRow]): Any = {
    val n = buf.size
    val arr = new Array[UnsafeRow](n)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    // heap drain order is arbitrary beyond the head — sort best-first
    java.util.Arrays.sort(arr, new java.util.Comparator[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = orderCompare(a, b)
    })
    val p = pairArity - 1
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = arr(i).get(p, payload.dataType); i += 1 }
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
      val r = new UnsafeRow(pairArity)
      r.pointTo(b, len)
      buf.add(r)
      i += 1
    }
    buf
  }
}
