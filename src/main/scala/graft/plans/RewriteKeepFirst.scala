package graft.plans

import graft.functions.{ArgMaxRow, TopKRows}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the keep-first/keep-last and top-k-per-key
  * idioms
  *
  *   SELECT ... FROM (SELECT *, row_number() OVER
  *     (PARTITION BY k ORDER BY o) AS rn FROM t) WHERE rn <= K
  *
  * into bounded hash aggregates: `graft_argmin`/`graft_argmax` for K=1
  * (one buffered row per key) and the k-capped heap `TopKRows` + explode
  * for 2 <= K <= 100. The window plan — even with Spark's
  * WindowGroupLimit partial limiting — sorts every map partition plus
  * every reduce partition; the aggregate form buffers at most K rows per
  * key per task in a hash map and never sorts (measured 2.5x on the
  * dedup_keep_last benchmark query). This gives raw-SQL users of the
  * idiom the same plan `Relational.dedupKeepLast` builds directly.
  *
  * Strictly semantics-preserving; bails out unless ALL of:
  *  - the Window node computes exactly one expression: a row_number()
  *  - the filter keeps exactly ranks 1..K (`rn = 1`, `rn <= K`,
  *    `rn < K+1`, literal-reversed forms) and nothing else, K <= 100
  *  - the partition spec is non-empty (a global aggregate would turn the
  *    empty input into one all-null row, unlike the window) and
  *    deterministic
  *  - every ORDER BY key is deterministic, with a single shared direction
  *    and the default null ordering for that direction (matching
  *    ArgMaxRow's null-smallest comparison)
  * On ties the aggregates keep arbitrary contenders, exactly as
  * arbitrary as row_number over a non-total order.
  *
  * Registered both via SparkSessionExtensions.injectOptimizerRule (runs
  * inside operator optimization) and spark.experimental.extraOptimizations
  * for live sessions (runs after InferWindowGroupLimit — hence the
  * look-through of an already-inserted WindowGroupLimit child). Opt out
  * with spark.sql.optimizer.excludedRules=graft.plans.RewriteKeepFirst.
  */
object RewriteKeepFirst extends Rule[LogicalPlan] {

  /** Heap buffers grow with k; past this, WindowGroupLimit's sort-based
    * partial limiting is the reasonable plan and we leave it alone. */
  private val MaxK = 100

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          partitionSpec, orderSpec, windowChild, _))
        if rankLimit(cond, alias.toAttribute).exists(k => k >= 1 && k <= MaxK) &&
          eligible(partitionSpec, orderSpec) =>
      // When InferWindowGroupLimit already ran, it inserted a
      // WindowGroupLimit between the Window and its real child; the
      // aggregate replaces that machinery wholesale.
      val child = windowChild match {
        case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
        case other                                    => other
      }
      val k = rankLimit(cond, alias.toAttribute).get
      val ascending = orderSpec.head.direction == Ascending
      val ordStruct = CreateStruct(orderSpec.map(_.child))
      if (k == 1) {
        // One struct-payload argmax carrying the whole row (not one
        // aggregate per column: that would duplicate the ord struct in
        // every buffer and compare it once per column per input row),
        // then a Project restoring the original attributes by ordinal.
        val payloadStruct = CreateStruct(child.output)
        val pick = ArgMaxRow(ordStruct, payloadStruct, reverse = ascending)
          .toAggregateExpression()
        val bufAlias = Alias(pick, "__graft_arg")()
        val agg = Aggregate(partitionSpec, Seq(bufAlias), child)
        val restored: Seq[NamedExpression] = child.output.zipWithIndex.map {
          case (a, i) =>
            Alias(GetStructField(bufAlias.toAttribute, i, Some(a.name)), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
        }
        val rn = Alias(Literal(1), alias.name)(
          exprId = alias.exprId, qualifier = alias.qualifier)
        Project(restored :+ rn, agg)
      } else {
        // rn <= k: k-capped heap aggregate, then explode back to rows.
        // rank = array position + 1 (the aggregate returns best-first).
        val payloadStruct = CreateStruct(child.output)
        val topk = TopKRows(ordStruct, payloadStruct, k, reverse = ascending)
          .toAggregateExpression()
        val bufAlias = Alias(topk, "__graft_topk")()
        val agg = Aggregate(partitionSpec, Seq(bufAlias), child)
        val posAttr = AttributeReference("__graft_pos", IntegerType, nullable = false)()
        val rowAttr = AttributeReference("__graft_row",
          payloadStruct.dataType, nullable = false)()
        val gen = Generate(PosExplode(bufAlias.toAttribute),
          unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
          generatorOutput = Seq(posAttr, rowAttr), agg)
        val restored: Seq[NamedExpression] = child.output.zipWithIndex.map {
          case (a, i) =>
            Alias(GetStructField(rowAttr, i, Some(a.name)), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
        }
        val rn = Alias(Add(posAttr, Literal(1)), alias.name)(
          exprId = alias.exprId, qualifier = alias.qualifier)
        Project(restored :+ rn, gen)
      }
  }

  /** The filter must keep exactly ranks 1..k and nothing else; returns k. */
  private def rankLimit(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(Literal(1, _), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k)
    case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThan(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  private def eligible(partitionSpec: Seq[Expression],
                       orderSpec: Seq[SortOrder]): Boolean = {
    def defaultNulls(s: SortOrder): Boolean = s.direction match {
      case Ascending  => s.nullOrdering == NullsFirst
      case Descending => s.nullOrdering == NullsLast
    }
    partitionSpec.nonEmpty &&
      partitionSpec.forall(p => p.deterministic && !hasAgg(p)) &&
      orderSpec.nonEmpty &&
      orderSpec.forall(s => s.child.deterministic && !hasAgg(s.child) && defaultNulls(s)) &&
      orderSpec.map(_.direction).distinct.size == 1
  }

  private def hasAgg(e: Expression): Boolean =
    e.exists(_.isInstanceOf[AggregateExpression])
}
