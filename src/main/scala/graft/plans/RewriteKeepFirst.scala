package graft.plans

import graft.functions.ArgMaxRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the keep-first/keep-last idiom
  *
  *   SELECT ... FROM (SELECT *, row_number() OVER
  *     (PARTITION BY k ORDER BY o) AS rn FROM t) WHERE rn = 1
  *
  * into a `graft_argmin`/`graft_argmax` hash aggregate. The window plan —
  * even with Spark's WindowGroupLimit partial limiting — exchanges up to
  * one row per (key, map task) AND sorts every map partition plus every
  * reduce partition; the aggregate form buffers one row per key per task
  * in a hash map and never sorts (measured 2.5x on the dedup_keep_last
  * benchmark query). This gives raw-SQL users of the idiom the same plan
  * `Relational.dedupKeepLast` builds directly.
  *
  * Strictly semantics-preserving; bails out unless ALL of:
  *  - the Window node computes exactly one expression: a row_number()
  *  - the filter keeps exactly rank 1 (`rn = 1`, `1 = rn`, `rn <= 1`,
  *    `rn < 2`) and nothing else
  *  - the partition spec is non-empty (a global aggregate would turn the
  *    empty input into one all-null row, unlike the window) and
  *    deterministic
  *  - every ORDER BY key is deterministic, with a single shared direction
  *    and the default null ordering for that direction (matching
  *    ArgMaxRow's null-smallest comparison)
  * On ties the aggregate keeps an arbitrary contender, exactly as
  * arbitrary as row_number over a non-total order.
  *
  * Registered both via SparkSessionExtensions.injectOptimizerRule (runs
  * inside operator optimization) and spark.experimental.extraOptimizations
  * for live sessions (runs after InferWindowGroupLimit — hence the
  * look-through of an already-inserted WindowGroupLimit child). Opt out
  * with spark.sql.optimizer.excludedRules=graft.plans.RewriteKeepFirst.
  */
object RewriteKeepFirst extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          partitionSpec, orderSpec, windowChild, _))
        if keepsRankOne(cond, alias.toAttribute) && eligible(partitionSpec, orderSpec) =>
      // When InferWindowGroupLimit already ran, it inserted a
      // WindowGroupLimit between the Window and its real child; the
      // aggregate replaces that machinery wholesale.
      val child = windowChild match {
        case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
        case other                                    => other
      }
      val ascending = orderSpec.head.direction == Ascending
      val ordStruct = CreateStruct(orderSpec.map(_.child))
      val aggExprs: Seq[NamedExpression] = child.output.map { a =>
        val pick = ArgMaxRow(ordStruct, a, reverse = ascending).toAggregateExpression()
        Alias(pick, a.name)(exprId = a.exprId, qualifier = a.qualifier)
      } :+ Alias(Literal(1), alias.name)(exprId = alias.exprId, qualifier = alias.qualifier)
      Aggregate(partitionSpec, aggExprs, child)
  }

  /** The filter must keep exactly rank 1 and nothing else. */
  private def keepsRankOne(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, Literal(1, _)) => a.semanticEquals(rn)
    case EqualTo(Literal(1, _), a: Attribute) => a.semanticEquals(rn)
    case LessThanOrEqual(a: Attribute, Literal(1, _)) => a.semanticEquals(rn)
    case GreaterThanOrEqual(Literal(1, _), a: Attribute) => a.semanticEquals(rn)
    case LessThan(a: Attribute, Literal(2, _)) => a.semanticEquals(rn)
    case GreaterThan(Literal(2, _), a: Attribute) => a.semanticEquals(rn)
    case _ => false
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
