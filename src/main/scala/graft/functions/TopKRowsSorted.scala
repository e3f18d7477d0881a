package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.TypeUtils
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
  * sort does. Buffering/merge/serde live in [[BoundedTopKRows]]. */
case class TopKRowsSorted(ord: Expression, payload: Expression, k: Int,
                          ascending: Seq[Boolean],
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends BoundedTopKRows {

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
  override protected def pairArity: Int = ascending.length + 1
  @transient override protected lazy val pairProj: UnsafeProjection =
    UnsafeProjection.create(flatOrd :+ payload)
  @transient private lazy val orderings: Array[Ordering[Any]] =
    ordFields.map(f => TypeUtils.getInterpretedOrdering(f.dataType)).toArray
  @transient private lazy val ascArr: Array[Boolean] = ascending.toArray
  @transient private lazy val ordTypes: Array[DataType] =
    ordFields.map(_.dataType).toArray

  /** <0 iff pair-row a sorts BEFORE pair-row b under the mixed ORDER BY
    * (per-field direction, window-default null placement). Direction is
    * carried by argument order, not negation. */
  override protected def orderCompare(a: UnsafeRow, b: UnsafeRow): Int = {
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
          else orderings(i).compare(b.get(i, ordTypes(i)), a.get(i, ordTypes(i)))
        }
      if (c != 0) return c
      i += 1
    }
    0
  }
}
