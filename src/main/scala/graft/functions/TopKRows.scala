package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.TypeUtils

/** k-row generalization of [[ArgMaxRow]]: per group, the `payload` values
  * of the k rows with the extreme `ord` values, returned best-first as
  * `array<payload-type>`. `reverse=true` keeps the k smallest (ascending
  * ranks over an ascending ORDER BY); `reverse=false` the k largest.
  *
  * This is the aggregate behind the `row_number() <= k` rewrite
  * ([[graft.plans.RewriteKeepFirst]]). Null ords compare smallest in
  * either direction — exactly the window's DEFAULT null placement (asc
  * nulls first, desc nulls last), which is all the rewrite rule admits.
  * Unlike [[TopKPairs]] (which carries a scalar id) the payload here is
  * an arbitrary struct. Among equal-ord rows the selection is arbitrary,
  * matching row_number over a non-total order; pass a total order for
  * determinism. Buffering/merge/serde live in [[BoundedTopKRows]];
  * for MIXED-direction orderings use [[TopKRowsSorted]].
  */
case class TopKRows(ord: Expression, payload: Expression, k: Int, reverse: Boolean,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends BoundedTopKRows {

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

  override def prettyName: String = if (reverse) "graft_bottomk_rows" else "graft_topk_rows"

  override protected val pairArity: Int = 2
  @transient override protected lazy val pairProj: UnsafeProjection =
    UnsafeProjection.create(Seq(ord, payload))
  @transient private lazy val baseOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ord.dataType)

  // <0 iff a ranks before b: null-smallest base comparison on the single
  // ord field, direction applied by `reverse` (reverse=true keeps the
  // smallest, i.e. ascending ranks). Argument order, not negation,
  // carries the direction — compare() is not contracted to survive -x.
  override protected def orderCompare(a: UnsafeRow, b: UnsafeRow): Int = {
    val an = a.isNullAt(0)
    val bn = b.isNullAt(0)
    if (an && bn) 0
    else if (an) { if (reverse) -1 else 1 }  // null smallest: first on asc, last on desc
    else if (bn) { if (reverse) 1 else -1 }
    else {
      val av = a.get(0, ord.dataType)
      val bv = b.get(0, ord.dataType)
      if (reverse) baseOrdering.compare(av, bv) else baseOrdering.compare(bv, av)
    }
  }
}
