package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact bounded top-k-per-group aggregate over (score, id) pairs: keeps
  * the k best pairs by (score DESC, id ASC) and returns them best-first as
  * `array<struct<score:double, id:…>>`. The id child may be LONG or
  * STRING; string ties break in binary (codepoint) order — identical to
  * DuckDB's default collation for the ASCII tokens we feed it. Duplicate
  * (score, id) pairs are preserved as distinct contenders, exactly as
  * they are for `row_number()` (the buffer is a k-capped heap, not a
  * set).
  *
  * This is the generic single-shuffle replacement for the
  * `row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k` pattern. The
  * window form shuffles EVERY candidate row to its group's partition and
  * sorts the whole partition just to keep k rows — at 100 TB the exchange
  * carries the full candidate set and a skewed group serializes on one
  * task. Here partial aggregation runs map-side (each task ships at most
  * k pairs per group), the merge is exact (best k of a union = best k of
  * per-buffer best-k), and the plan is one partial+final hash aggregate —
  * no sort, no window, no parallelism ceiling at any group cardinality.
  *
  * Semantics mirror the reference's per-group top-k reports (e.g.
  * `pipelines/report.py` rank-and-keep steps) re-expressed as a mergeable
  * aggregate.
  */
case class TopKPairs(score: Expression, id: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[TopKPairs.Entry]] {

  require(k > 0, s"k must be positive, got $k")

  private def idIsString: Boolean = id.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk score must be DOUBLE, got ${score.dataType.sql}")
    else if (id.dataType != LongType && id.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk id must be BIGINT or STRING, got ${id.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKPairs =
    copy(score = c(0), id = c(1))
  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", id.dataType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  private val cmp: java.util.Comparator[TopKPairs.Entry] = new TopKPairs.WorstFirst

  override def createAggregationBuffer(): java.util.PriorityQueue[TopKPairs.Entry] =
    new java.util.PriorityQueue[TopKPairs.Entry](k, cmp)

  private def add(buf: java.util.PriorityQueue[TopKPairs.Entry], e: TopKPairs.Entry): Unit =
    if (buf.size < k) { buf.add(e); () }
    else if (cmp.compare(e, buf.peek()) > 0) { buf.poll(); buf.add(e); () }

  override def update(buf: java.util.PriorityQueue[TopKPairs.Entry],
                      input: InternalRow): java.util.PriorityQueue[TopKPairs.Entry] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val idVal: AnyRef = i match {
        // clone: UTF8String from an unsafe row points into a reused buffer
        case u: UTF8String => u.clone()
        case other         => other.asInstanceOf[AnyRef]
      }
      add(buf, new TopKPairs.Entry(s.asInstanceOf[Double], idVal))
    }
    buf
  }

  override def merge(b1: java.util.PriorityQueue[TopKPairs.Entry],
                     b2: java.util.PriorityQueue[TopKPairs.Entry]): java.util.PriorityQueue[TopKPairs.Entry] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.PriorityQueue[TopKPairs.Entry]): Any = {
    val n = buf.size
    val arr = new Array[TopKPairs.Entry](n)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    // heap iteration order is arbitrary beyond the head — sort best-first
    java.util.Arrays.sort(arr, cmp.reversed())
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = new GenericInternalRow(Array[Any](arr(i).score, arr(i).id))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.PriorityQueue[TopKPairs.Entry]): Array[Byte] = {
    if (idIsString) {
      var bytes = 0
      val it0 = buf.iterator()
      while (it0.hasNext) bytes += it0.next().id.asInstanceOf[UTF8String].numBytes()
      val bb = ByteBuffer.allocate(4 + buf.size * 12 + bytes)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) {
        val e = it.next()
        bb.putDouble(e.score)
        val b = e.id.asInstanceOf[UTF8String].getBytes
        bb.putInt(b.length)
        bb.put(b)
      }
      bb.array()
    } else {
      val bb = ByteBuffer.allocate(4 + 16 * buf.size)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) {
        val e = it.next()
        bb.putDouble(e.score)
        bb.putLong(e.id.asInstanceOf[java.lang.Long])
      }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[TopKPairs.Entry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    if (idIsString) {
      while (i < n) {
        val s = bb.getDouble
        val len = bb.getInt
        val b = new Array[Byte](len)
        bb.get(b)
        buf.add(new TopKPairs.Entry(s, UTF8String.fromBytes(b)))
        i += 1
      }
    } else {
      while (i < n) {
        buf.add(new TopKPairs.Entry(bb.getDouble, Long.box(bb.getLong)))
        i += 1
      }
    }
    buf
  }
}

object TopKPairs {
  /** Buffer element: score plus a boxed Long or UTF8String id. */
  final class Entry(val score: Double, val id: AnyRef)

  /** Worst-first ordering: ascending score, then DESCENDING id (for equal
    * scores a larger id is worse). peek() is always the eviction victim.
    * Top-level and Serializable: the expression ships to executors. */
  final class WorstFirst extends java.util.Comparator[Entry] with Serializable {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c
      else (a.id, b.id) match {
        case (x: java.lang.Long, y: java.lang.Long) => java.lang.Long.compare(y, x)
        case (x: UTF8String, y: UTF8String)         => y.compareTo(x)
        case _ => throw new IllegalStateException("mixed id types in graft_topk buffer")
      }
    }
  }
}
