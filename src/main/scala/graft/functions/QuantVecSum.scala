package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.GraftExpectsInputTypes
import org.apache.spark.sql.types._

/** Per-component quantized vector sum — the mergeable accumulator
  * behind [[graft.ops.Similarity.quantizedCentroids]]: for each group,
  * component i accumulates Σ floor(v_i · 2^20) as an exact
  * order-independent long, emitted as `array<double>` (sums are exact
  * integers ≤ 2^53 in practice, and the double cast is what the
  * centroid contract always exposed).
  *
  * Why an aggregate instead of posexplode + two grouped aggregations:
  * the explode materializes n·d rows and shuffles them TWICE (once per
  * (label, pos) sum, once to collect the component list); here partial
  * aggregation runs map-side over whole vectors — each task ships ONE
  * d-long buffer per group — and the plan is a single partial+final
  * hash aggregate with one exchange of k buffers. Semantics replicate
  * the exploded form bit for bit: floor in the double domain then
  * long-cast, null elements contribute nothing (an all-null component
  * emits a null element), vector lengths may vary (component presence
  * is prefix-contiguous: max observed length wins), and a group whose
  * every vector is null/empty evaluates to an EMPTY array so the
  * caller can drop it exactly where the exploded form never produced
  * the group at all. */
case class QuantVecSum(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantVecSum.Buf]
  with GraftExpectsInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantVecSum =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): QuantVecSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantVecSum =
    copy(inputAggBufferOffset = o)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_quant_vec_sum"

  override def createAggregationBuffer(): QuantVecSum.Buf = new QuantVecSum.Buf

  override def update(buf: QuantVecSum.Buf, input: InternalRow): QuantVecSum.Buf =
    QuantVecSum.updateBuf(buf, child.eval(input))

  override def merge(b1: QuantVecSum.Buf, b2: QuantVecSum.Buf): QuantVecSum.Buf =
    QuantVecSum.mergeBuf(b1, b2)

  override def eval(buf: QuantVecSum.Buf): Any = {
    val out = new Array[Any](buf.len)
    var i = 0
    while (i < buf.len) {
      out(i) = if (buf.hasVal(i)) buf.sums(i).toDouble else null
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: QuantVecSum.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 9 * buf.len)
    bb.putInt(buf.len)
    var i = 0
    while (i < buf.len) {
      bb.putLong(buf.sums(i))
      bb.put(if (buf.hasVal(i)) 1.toByte else 0.toByte)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QuantVecSum.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new QuantVecSum.Buf
    buf.ensure(n)
    var i = 0
    while (i < n) {
      buf.sums(i) = bb.getLong
      buf.hasVal(i) = bb.get() == 1.toByte
      i += 1
    }
    buf
  }
}

object QuantVecSum {
  /** Growable per-component accumulator (presence is prefix-contiguous:
    * a component exists iff some vector was at least that long). `cnts`
    * tracks how many vectors REACHED each component (null elements
    * included) — what the exploded form's count(*) per position was. */
  final class Buf {
    var len: Int = 0
    var sums: Array[Long] = Array.emptyLongArray
    var hasVal: Array[Boolean] = Array.empty[Boolean]
    var cnts: Array[Long] = Array.emptyLongArray
    def ensure(n: Int): Unit = if (n > len) {
      if (n > sums.length) {
        val cap = math.max(n, math.max(8, sums.length * 2))
        sums = java.util.Arrays.copyOf(sums, cap)
        hasVal = java.util.Arrays.copyOf(hasVal, cap)
        cnts = java.util.Arrays.copyOf(cnts, cap)
      }
      len = n
    }
  }

  private[functions] def updateBuf(buf: Buf, v: Any): Buf = {
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      buf.ensure(n)
      var i = 0
      while (i < n) {
        buf.cnts(i) += 1L
        if (!arr.isNullAt(i)) {
          // floor(CAST(v AS DOUBLE) * 1048576) CAST LONG — the exploded
          // form's exact arithmetic (float→double is exact; 2^20 scaling
          // is exact IEEE)
          buf.sums(i) += math.floor(arr.getFloat(i).toDouble * 1048576d).toLong
          buf.hasVal(i) = true
        }
        i += 1
      }
    }
    buf
  }

  private[functions] def mergeBuf(b1: Buf, b2: Buf): Buf = {
    b1.ensure(b2.len)
    var i = 0
    while (i < b2.len) {
      b1.sums(i) += b2.sums(i)
      b1.hasVal(i) = b1.hasVal(i) || b2.hasVal(i)
      b1.cnts(i) += b2.cnts(i)
      i += 1
    }
    b1
  }
}

/** [[QuantVecSum]] emitting (sum, count) structs per component — the
  * PQ-refinement shape: the per-(codeword, subspace, position) mean is
  * sum/count where count is the number of member subvectors REACHING
  * the position (null elements included, exactly the exploded form's
  * count(*)); a position no vector reached is absent (prefix rule), an
  * all-null position carries a null sum. */
case class QuantVecSumCnt(child: Expression,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantVecSum.Buf]
  with GraftExpectsInputTypes {

  override def graftInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantVecSumCnt =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): QuantVecSumCnt =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantVecSumCnt =
    copy(inputAggBufferOffset = o)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", LongType, nullable = true),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_quant_vec_sum_cnt"

  override def createAggregationBuffer(): QuantVecSum.Buf = new QuantVecSum.Buf

  override def update(buf: QuantVecSum.Buf, input: InternalRow): QuantVecSum.Buf =
    QuantVecSum.updateBuf(buf, child.eval(input))

  override def merge(b1: QuantVecSum.Buf, b2: QuantVecSum.Buf): QuantVecSum.Buf =
    QuantVecSum.mergeBuf(b1, b2)

  override def eval(buf: QuantVecSum.Buf): Any = {
    val out = new Array[Any](buf.len)
    var i = 0
    while (i < buf.len) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](if (buf.hasVal(i)) buf.sums(i) else null, buf.cnts(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: QuantVecSum.Buf): Array[Byte] = QuantVecSumCnt.ser(buf)
  override def deserialize(bytes: Array[Byte]): QuantVecSum.Buf = QuantVecSumCnt.de(bytes)
}

object QuantVecSumCnt {
  private[functions] def ser(buf: QuantVecSum.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 17 * buf.len)
    bb.putInt(buf.len)
    var i = 0
    while (i < buf.len) {
      bb.putLong(buf.sums(i))
      bb.putLong(buf.cnts(i))
      bb.put(if (buf.hasVal(i)) 1.toByte else 0.toByte)
      i += 1
    }
    bb.array()
  }
  private[functions] def de(bytes: Array[Byte]): QuantVecSum.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new QuantVecSum.Buf
    buf.ensure(n)
    var i = 0
    while (i < n) {
      buf.sums(i) = bb.getLong
      buf.cnts(i) = bb.getLong
      buf.hasVal(i) = bb.get() == 1.toByte
      i += 1
    }
    buf
  }
}
