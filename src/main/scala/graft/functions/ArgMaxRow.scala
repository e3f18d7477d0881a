package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Generic hash-aggregate argmax/argmin: per group, the `payload` value of
  * the row with the extreme `ord` value. `ord` may be any orderable type
  * (typically a struct of ordering columns — its lexicographic comparison
  * IS the multi-column ORDER BY); `payload` is arbitrary, including types
  * that are themselves unorderable (maps, binary), because payloads are
  * carried, never compared. A null `ord` sorts smallest, matching the
  * window pattern's ASC NULLS FIRST / DESC NULLS LAST defaults; on ties
  * the first-seen row wins (the window form is equally arbitrary there —
  * pass a total order for determinism).
  *
  * This is the scale path for keep-first/keep-last deduplication
  * (reference: pipelines/etl_zmmidr_oun.py:72-76 drop_duplicates): the
  * `row_number() OVER (PARTITION BY k ORDER BY o) = 1` plan exchanges
  * EVERY row and sorts whole partitions to keep one row per key, while
  * this aggregate keeps a single (ord, payload) pair per group per task
  * map-side, ships only those, and never sorts. Buffers live as a single
  * UnsafeRow, so per-group state is one compact allocation.
  */
case class ArgMaxRow(ord: Expression, payload: Expression, reverse: Boolean,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgMaxRow.Holder] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ArgMaxRow.orderable(ord.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName ordering type ${ord.dataType.sql} is not orderable")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(ord, payload)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ArgMaxRow =
    copy(ord = c(0), payload = c(1))
  override def withNewMutableAggBufferOffset(o: Int): ArgMaxRow =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ArgMaxRow =
    copy(inputAggBufferOffset = o)

  override def dataType: DataType = payload.dataType
  override def nullable: Boolean = true
  override def prettyName: String = if (reverse) "graft_argmin" else "graft_argmax"

  // Projects (ord, payload) of the current input row into one UnsafeRow —
  // the whole buffer is that row's copy.
  @transient private lazy val pairProj: UnsafeProjection =
    UnsafeProjection.create(Seq(ord, payload))
  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ord.dataType)

  // null-smallest comparison on the ord fields of two buffered pair-rows
  private def better(cand: UnsafeRow, cur: UnsafeRow): Boolean = {
    val cn = cand.isNullAt(0)
    val kn = cur.isNullAt(0)
    val c =
      if (cn && kn) 0
      else if (cn) -1
      else if (kn) 1
      else ordering.compare(cand.get(0, ord.dataType), cur.get(0, ord.dataType))
    if (reverse) c < 0 else c > 0
  }

  override def createAggregationBuffer(): ArgMaxRow.Holder = new ArgMaxRow.Holder(null)

  override def update(buf: ArgMaxRow.Holder, input: InternalRow): ArgMaxRow.Holder = {
    val pair = pairProj(input)
    if (buf.row == null || better(pair, buf.row)) buf.row = pair.copy()
    buf
  }

  override def merge(b1: ArgMaxRow.Holder, b2: ArgMaxRow.Holder): ArgMaxRow.Holder = {
    if (b2.row != null && (b1.row == null || better(b2.row, b1.row))) b1.row = b2.row
    b1
  }

  override def eval(buf: ArgMaxRow.Holder): Any =
    if (buf.row == null || buf.row.isNullAt(1)) null
    else buf.row.get(1, payload.dataType) match {
      // copy out of the buffer row: the holder may be reused/freed
      case r: InternalRow => r.copy()
      case a: ArrayData   => a.copy()
      case m: MapData     => m.copy()
      case u: UTF8String  => u.clone()
      case other          => other
    }

  override def serialize(buf: ArgMaxRow.Holder): Array[Byte] =
    if (buf.row == null) Array.emptyByteArray else buf.row.getBytes

  override def deserialize(bytes: Array[Byte]): ArgMaxRow.Holder =
    if (bytes.isEmpty) new ArgMaxRow.Holder(null)
    else {
      val r = new UnsafeRow(2)
      r.pointTo(bytes, bytes.length)
      new ArgMaxRow.Holder(r)
    }
}

object ArgMaxRow {
  /** Mutable single-row buffer (null until the first non-empty update). */
  final class Holder(var row: UnsafeRow)

  def orderable(dt: DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt)
}
