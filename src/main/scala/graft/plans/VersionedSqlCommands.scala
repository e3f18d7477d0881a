package graft.plans

import graft.io.{Versioned, VersionedReadTable}
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, AttributeSet, Cast, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, Project, UpdateAction, UpdateTable}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.command.{ExecutedCommandExec, LeafRunnableCommand}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftx.Bridge

/** Plain-SQL UPDATE and MERGE for live `graft-versioned` catalog tables —
  * the reference's central operation (the T-SQL staging-table MERGE,
  * /root/reference/common/loader.py:69-78) as one SQL statement:
  *
  * {{{
  *   UPDATE graft.ns.t SET v = v * 2 WHERE id < 10
  *   MERGE INTO graft.ns.t USING updates s ON t.id = s.id
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Spark's own row-level path for these statements (`SupportsRowLevelOperations`
  * + ReplaceData) re-plans the command as read-all-touched-groups →
  * recompute → full-group write, with the touched-group discovery done by a
  * second scan under runtime filtering. The engine already has a tighter
  * copy-on-write core — [[Versioned.updateWhere]]/[[Versioned.mergeInto]]
  * rewrite exactly the files that contain matches, with sidecar-stats probe
  * pruning and an atomic manifest swap — so the SQL surface is served by
  * REWRITING the analyzed command onto that library core instead of
  * implementing the ReplaceData machinery twice. The rewrite runs as a
  * planner STRATEGY — strategies are consulted before Spark's own
  * (which is where the table-does-not-support error would fire), and
  * `spark.experimental.extraStrategies` makes it injectable into a LIVE
  * session (optimizer hooks never see Command roots there). Spark's
  * analyzer has already resolved every reference and expanded
  * `SET *` / `INSERT *` by then.
  *
  * The full SQL MERGE clause family is served: the plain upsert takes the
  * fast [[Versioned.mergeInto]] path, and everything else — per-action
  * conditions (`WHEN MATCHED AND ...`), DELETE actions, update-only /
  * insert-only shapes, multiple clauses per family (first-match-wins), and
  * `WHEN NOT MATCHED BY SOURCE` UPDATE/DELETE — rewrites onto
  * [[Versioned.mergeIntoConditional]] with conditions re-resolved against
  * the library's `__t`/`__s` join aliases. `MERGE WITH SCHEMA EVOLUTION`
  * works on the upsert shape: the source's extra columns evolve the table
  * exactly as an append commit would (new columns added, types widened
  * along the value-preserving lattice). Conservatism mirrors the SQL
  * DELETE path ([[graft.io.VersionedReadTable]]) for what remains: a shape
  * the library semantics cannot express — subqueries in conditions,
  * non-star UPDATE SET * / INSERT * mappings (whole-row replacement is the
  * contract), WITH SCHEMA EVOLUTION outside the upsert shape — is refused
  * at analysis with a message naming the unsupported piece, never
  * approximated. Time-travel and CDC reads have no live root and are left
  * for Spark's own table-does-not-support error.
  */
object VersionedRowLevelSqlStrategy extends org.apache.spark.sql.execution.SparkStrategy {

  /** The live root of a versioned-catalog relation, with its output
    * attributes — None for non-versioned tables and pinned/CDC reads.
    * The optimizer may have wrapped the relation in aliases or an
    * attribute-only Project by planning time; both unwrap without
    * changing which table is addressed. */
  private def liveVersioned(plan: LogicalPlan): Option[(String, Seq[Attribute])] = {
    @scala.annotation.tailrec
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => unwrap(c)
      case other => other
    }
    unwrap(EliminateSubqueryAliases(plan)) match {
      case r: DataSourceV2Relation => r.table match {
        case t: VersionedReadTable => t.liveRoot.map(root => (root, r.output))
        case _ => None
      }
      // the optimizer's early scan pushdown has usually converted the
      // relation to its scan form by planning time
      case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        s.relation.table match {
          case t: VersionedReadTable => t.liveRoot.map(root => (root, s.output))
          case _ => None
        }
      case _ => None
    }
  }

  /** Peel the implicit casts the analyzer inserts around attribute
    * references when source/target types differ. */
  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft-versioned SQL row-level operations do not support $what")

  /** Resolved target-side expression -> name-based Column the command
    * re-resolves against a fresh scan of the same table. Plan-bearing
    * expressions (subqueries) are refused: the fresh scan could not
    * reproduce their bindings. */
  private def toColumn(e: Expression, in: String): Column = {
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      unsupported(s"subqueries in $in")
    Bridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  /** The equi-join keys of a MERGE condition: a conjunction of
    * `target.k = source.k` equalities over SAME-named columns (modulo the
    * casts the analyzer inserts), one side from each plan. Anything else
    * is None — the library merge joins by column name, so a cross-named
    * equality has no faithful translation. */
  private def mergeKeys(cond: Expression, target: AttributeSet,
                        source: AttributeSet): Option[Seq[String]] = {
    cond match {
      case And(l, r) =>
        for (a <- mergeKeys(l, target, source); b <- mergeKeys(r, target, source))
          yield a ++ b
      case EqualTo(l, r) => (stripCast(l), stripCast(r)) match {
        case (a: AttributeReference, b: AttributeReference)
            if a.name.equalsIgnoreCase(b.name) &&
              ((target.contains(a) && source.contains(b)) ||
               (target.contains(b) && source.contains(a))) =>
          Some(Seq(if (target.contains(a)) a.name else b.name))
        case _ => None
      }
      case _ => None
    }
  }

  /** Verify one action is the star shape (every target column assigned its
    * same-named source column, modulo casts) and return the per-target-
    * column value expressions in target-attribute order. */
  private def starAssignments(what: String, assignments: Seq[Assignment],
                              targetAttrs: Seq[Attribute],
                              source: AttributeSet): Seq[Expression] = {
    val byTarget = assignments.map { a =>
      val key = a.key match {
        case k: AttributeReference => k
        case other => unsupported(s"$what assignment to non-column $other")
      }
      stripCast(a.value) match {
        case v: AttributeReference
            if source.contains(v) && v.name.equalsIgnoreCase(key.name) =>
        case other => unsupported(
          s"$what assignment `${key.name}` = $other — only the upsert shape " +
            "(UPDATE SET * / INSERT *, each column from its same-named " +
            "source column) is supported")
      }
      key.exprId -> a.value
    }.toMap
    targetAttrs.map(t => byTarget.getOrElse(t.exprId,
      unsupported(s"$what that assigns only ${byTarget.size} of " +
        s"${targetAttrs.size} target columns")))
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {

    case u @ UpdateTable(target, assignments, condition) if u.resolved =>
      liveVersioned(target) match {
        case None => Nil
        case Some((root, _)) =>
          val asg = assignments.map { a =>
            val name = a.key match {
              case k: AttributeReference => k.name
              case other => unsupported(
                s"UPDATE of nested or non-column target $other")
            }
            name -> toColumn(a.value, "UPDATE values")
          }
          ExecutedCommandExec(UpdateVersionedTableCommand(root, asg,
            condition.map(toColumn(_, "the UPDATE condition")))) :: Nil
      }

    case m: MergeIntoTable if m.resolved =>
      liveVersioned(m.targetTable) match {
        case None => Nil
        case Some((root, targetAttrs)) =>
          val targetSet = AttributeSet(targetAttrs)
          val sourceAttrs = m.sourceTable.outputSet
          // distinct: a redundant repeated equality in ON is valid SQL and
          // must not become a duplicate using-column downstream
          val keys = mergeKeys(m.mergeCondition, targetSet, sourceAttrs)
            .map(_.distinct).filter(_.nonEmpty).getOrElse(unsupported(
              "this ON condition — it must be a conjunction of " +
                "target.k = source.k equalities over same-named columns"))
          val simpleUpsert = m.notMatchedBySourceActions.isEmpty &&
            (m.matchedActions match {
              case Seq(u: UpdateAction) => u.condition.isEmpty
              case _ => false
            }) &&
            (m.notMatchedActions match {
              case Seq(i: InsertAction) => i.condition.isEmpty
              case _ => false
            })
          if (simpleUpsert) {
            val values = starAssignments("WHEN MATCHED UPDATE",
              m.matchedActions.head.asInstanceOf[UpdateAction].assignments,
              targetAttrs, sourceAttrs)
            starAssignments("WHEN NOT MATCHED INSERT",
              m.notMatchedActions.head.asInstanceOf[InsertAction].assignments,
              targetAttrs, sourceAttrs)
            // capture the verified mapping as a resolved projection of the
            // source plan: target column names/types, source values (the
            // analyzer's own casts included). WITH SCHEMA EVOLUTION: the
            // analyzer expands the star over the EXISTING target columns
            // only and passes the flag through — the source's extra
            // columns ride along into the library merge, which evolves
            // the table exactly as an append commit would.
            val consumed = AttributeSet(values.map(stripCast).collect {
              case a: AttributeReference => a
            })
            val extras =
              if (!m.withSchemaEvolution) Seq.empty
              else m.sourceTable.output.filterNot(consumed.contains)
            val projected = Project(
              targetAttrs.zip(values).map { case (t, v) => Alias(v, t.name)() } ++ extras,
              m.sourceTable)
            ExecutedCommandExec(MergeVersionedTableCommand(root, projected, keys,
              schemaEvolution = m.withSchemaEvolution)) :: Nil
          } else {
            if (m.withSchemaEvolution)
              unsupported("WITH SCHEMA EVOLUTION outside the plain upsert shape")
            // ---- the general clause family -> mergeIntoConditional.
            // Conditions re-resolve against a __t/__s-aliased join frame;
            // whole-row actions must still be the star shape (the library
            // replaces/inserts whole rows).
            def qualified(e: Expression, in: String): Column = {
              if (e.exists(_.isInstanceOf[SubqueryExpression]))
                unsupported(s"subqueries in $in")
              Bridge.column(e.transform {
                case a: AttributeReference =>
                  if (targetSet.contains(a)) UnresolvedAttribute(Seq("__t", a.name))
                  else UnresolvedAttribute(Seq("__s", a.name))
              })
            }
            val insActions = m.notMatchedActions.map {
              case ia: InsertAction => ia
              case other => unsupported(
                s"WHEN NOT MATCHED ${other.getClass.getSimpleName}")
            }
            // verify EVERY whole-row action is star-shaped; keep one value
            // list (they are identical by star-ness: each target column
            // from its same-named source column)
            val starValues: Option[Seq[Expression]] =
              (m.matchedActions.collect { case u: UpdateAction =>
                starAssignments("WHEN MATCHED UPDATE", u.assignments,
                  targetAttrs, sourceAttrs)
              } ++ insActions.map(ia =>
                starAssignments("WHEN NOT MATCHED INSERT", ia.assignments,
                  targetAttrs, sourceAttrs))).headOption
            val matchedClauses = m.matchedActions.map {
              case u: UpdateAction => Versioned.WhenMatchedUpdateAll(
                u.condition.map(qualified(_, "a WHEN MATCHED condition")))
              case d: DeleteAction => Versioned.WhenMatchedDelete(
                d.condition.map(qualified(_, "a WHEN MATCHED condition")))
              case other => unsupported(s"WHEN MATCHED ${other.getClass.getSimpleName}")
            }
            val insertClauses = insActions.map(ia =>
              Versioned.WhenNotMatchedInsertAll(
                ia.condition.map(qualified(_, "a WHEN NOT MATCHED condition"))))
            val nmbsClauses = m.notMatchedBySourceActions.map {
              case u: UpdateAction =>
                val asg = u.assignments.map { a =>
                  val name = a.key match {
                    case k: AttributeReference => k.name
                    case other => unsupported(
                      s"NOT MATCHED BY SOURCE assignment to non-column $other")
                  }
                  name -> qualified(a.value, "a NOT MATCHED BY SOURCE assignment")
                }.toMap
                Versioned.WhenNotMatchedBySourceUpdate(
                  u.condition.map(qualified(_, "a NOT MATCHED BY SOURCE condition")), asg)
              case d: DeleteAction => Versioned.WhenNotMatchedBySourceDelete(
                d.condition.map(qualified(_, "a NOT MATCHED BY SOURCE condition")))
              case other => unsupported(
                s"WHEN NOT MATCHED BY SOURCE ${other.getClass.getSimpleName}")
            }
            // align the source plan with the table: each star-mapped source
            // column takes the analyzer's cast and the TARGET column's
            // exact name (conditions keep resolving — same name, casted
            // value); everything else passes through for condition use.
            // The cast must be VALUE-PRESERVING (the widening lattice):
            // clause conditions re-evaluate against the casted value, and
            // a narrowing cast would make `WHEN MATCHED AND s.c > bignum`
            // observe a wrapped/overflowed value instead of the source's
            val sourcePlan = starValues match {
              case None => m.sourceTable
              case Some(values) =>
                val byBase = targetAttrs.zip(values).flatMap { case (t, v) =>
                  stripCast(v) match {
                    case a: AttributeReference => Some(a.exprId -> (t.name, v))
                    case _ => None
                  }
                }.toMap
                Project(m.sourceTable.output.map { a =>
                  byBase.get(a.exprId) match {
                    case Some((tname, v))
                        if v.isInstanceOf[Cast] || tname != a.name =>
                      v match {
                        case c: Cast if !Versioned.widens(c.child.dataType, c.dataType) =>
                          unsupported(
                            s"an implicit non-widening source cast on `$tname` " +
                              s"(${c.child.dataType.simpleString} -> " +
                              s"${c.dataType.simpleString}) with clause " +
                              "conditions — cast the source column explicitly")
                        case _ =>
                      }
                      Alias(v, tname)()
                    case _ => a
                  }
                }, m.sourceTable)
            }
            ExecutedCommandExec(MergeVersionedConditionalCommand(root,
              sourcePlan, keys,
              matchedClauses ++ insertClauses ++ nmbsClauses)) :: Nil
          }
      }

    case _ => Nil
  }
}

/** `UPDATE <versioned table> SET ... WHERE ...` → the copy-on-write
  * [[Versioned.updateWhere]] (only files containing matches are rewritten;
  * one atomic commit). */
case class UpdateVersionedTableCommand(root: String,
                                       assignments: Seq[(String, Column)],
                                       condition: Option[Column])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    Versioned.updateWhere(spark, root,
      condition.getOrElse(org.apache.spark.sql.functions.lit(true)),
      assignments.toMap)
    Seq.empty
  }
}

/** `MERGE INTO <versioned table> USING src ON keys WHEN MATCHED UPDATE SET *
  * WHEN NOT MATCHED INSERT *` → the copy-on-write [[Versioned.mergeInto]]
  * (probe-pruned touched-file rewrite + append, one atomic commit).
  * `source` is the analyzed source plan already projected to the target's
  * columns by the rewrite rule. */
case class MergeVersionedTableCommand(root: String, source: LogicalPlan,
                                      keys: Seq[String],
                                      schemaEvolution: Boolean = false)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    Versioned.mergeInto(spark, root, Bridge.ofRows(spark, source), keys,
      schemaEvolution = schemaEvolution)
    Seq.empty
  }
}

/** The general MERGE clause family (conditional matched update/delete,
  * conditional insert, NOT MATCHED BY SOURCE) →
  * [[Versioned.mergeIntoConditional]]. `source` keeps every source column
  * (clause conditions may reference them) with star-mapped columns
  * renamed/cast to the target's; clause conditions are name-based Columns
  * over the library's `__t`/`__s` join aliases. */
case class MergeVersionedConditionalCommand(root: String, source: LogicalPlan,
                                            keys: Seq[String],
                                            clauses: Seq[Versioned.MergeClause])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    Versioned.mergeIntoConditional(spark, root, Bridge.ofRows(spark, source),
      keys, clauses)
    Seq.empty
  }
}
