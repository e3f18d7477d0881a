package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** [[TopKRows]] with a PER-FIELD direction vector — the top-k-per-group
  * aggregate for MIXED-direction orderings, which the single-`reverse`
  * forms cannot express. `ord` is a struct whose field i orders
  * ascending when `ascending(i)`, descending otherwise, with the window
  * default null placement for that direction (asc → nulls first, desc →
  * nulls last) — i.e. the aggregate keeps, best-first, the k payload
  * rows that `ORDER BY f1 [ASC|DESC], f2 [ASC|DESC], …` would rank
  * first.
  *
  * This exists for the similarity-search ranking idiom — `row_number()
  * OVER (PARTITION BY qid ORDER BY score DESC, id ASC) <= k` — whose
  * mixed direction makes [[graft.plans.RewriteKeepFirst]] bail and
  * [[TopKRows]] inapplicable, leaving a window plan that exchanges AND
  * sorts every scored candidate row. Here partial aggregation keeps k
  * pair-rows per (group, task) map-side, the exchange carries k rows per
  * group, and nothing sorts but the final k-element drain — the same
  * 100 TB posture as every other bounded-heap ranker in this package.
  * Like row_number, duplicate ord values are distinct contenders; pass a
  * total order (e.g. a unique id as the last field) for determinism.
  * Double fields order NaN above every real value, exactly as the window
  * sort does. */
case class TopKRowsSorted(ord: Expression, payload: Expression, k: Int,
                          ascending: Seq[Boolean],
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[UnsafeRow]] {

  require(k > 0, s"k must be positive, got $k")

  private def ordFields: Seq[StructField] = ord.dataType match {
    case StructType(fs) => fs.toSeq
    case _              => Seq.empty
  }

  override def checkInputDataTypes(): TypeCheckResult = ord.dataType match {
    case StructType(fs) if fs.length != ascending.length =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: ${ascending.length} directions for ${fs.length} ord fields")
    case StructType(fs) =>
      fs.find(f => !ArgMaxRow.orderable(f.dataType)) match {
        case Some(f) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName ordering field ${f.name}: ${f.dataType.sql} is not orderable")
        case None => TypeCheckResult.TypeCheckSuccess
      }
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName ord must be a struct of ordering keys, got ${t.sql}")
  }

  override def children: Seq[Expression] = Seq(ord, payload)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKRowsSorted =
    copy(ord = c(0), payload = c(1))
  override def withNewMutableAggBufferOffset(o: Int): TopKRowsSorted =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKRowsSorted =
    copy(inputAggBufferOffset = o)

  // containsNull tracks the payload's own nullability: a nullable
  // payload expression CAN buffer and emit null elements, and declaring
  // them away would let downstream null-check elision read garbage (the
  // in-repo rankers pass struct(...), which is never null)
  override def dataType: DataType = ArrayType(payload.dataType, containsNull = payload.nullable)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_rows_sorted"

  // the pair row is (ord field 0, …, ord field n-1, payload): flattening
  // the ord struct into the projection keeps per-field null bits
  // addressable without allocating a nested struct per input row
  @transient private lazy val flatOrd: Seq[Expression] = ord match {
    // struct(col, …) resolves to CreateNamedStruct((name, value)*)
    case s: CreateNamedStruct => s.valExprs
    case other => ordFields.indices.map(i =>
      org.apache.spark.sql.catalyst.expressions.GetStructField(other, i))
  }
  @transient private lazy val pairProj: UnsafeProjection =
    UnsafeProjection.create(flatOrd :+ payload)
  @transient private lazy val orderings: Array[Ordering[Any]] =
    ordFields.map(f => TypeUtils.getInterpretedOrdering(f.dataType)).toArray
  @transient private lazy val ascArr: Array[Boolean] = ascending.toArray
  @transient private lazy val ordTypes: Array[DataType] =
    ordFields.map(_.dataType).toArray

  /** <0 iff pair-row a sorts BEFORE pair-row b under the mixed ORDER BY
    * (per-field direction, window-default null placement). */
  private def orderCompare(a: UnsafeRow, b: UnsafeRow): Int = {
    var i = 0
    while (i < ascArr.length) {
      val an = a.isNullAt(i)
      val bn = b.isNullAt(i)
      val c =
        if (an && bn) 0
        else if (ascArr(i)) { // asc, nulls first
          if (an) -1
          else if (bn) 1
          else orderings(i).compare(a.get(i, ordTypes(i)), b.get(i, ordTypes(i)))
        } else { // desc, nulls last
          if (an) 1
          else if (bn) -1
          else -orderings(i).compare(a.get(i, ordTypes(i)), b.get(i, ordTypes(i)))
        }
      if (c != 0) return c
      i += 1
    }
    0
  }

  // worst-first heap: head sorts LAST under the ORDER BY (the eviction
  // victim), so the comparator is the reversed order
  private def worstFirst: java.util.Comparator[UnsafeRow] =
    new java.util.Comparator[UnsafeRow] with Serializable {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int = -orderCompare(a, b)
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
    val p = ascArr.length
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
      val r = new UnsafeRow(ascArr.length + 1)
      r.pointTo(b, len)
      buf.add(r)
      i += 1
    }
    buf
  }
}
