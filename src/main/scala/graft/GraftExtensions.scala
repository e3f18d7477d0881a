package graft

import graft.functions.GraftExpressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftx.Bridge

/** SparkSessionExtensions hook: registers the graft expressions as SQL
  * functions so `spark.sql("SELECT graft_hash32(text) ...")` works from
  * any SQL surface (thrift, notebooks) without Scala imports.
  *
  * Enable with
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach(ext.injectFunction)
    GraftExtensions.tableRegistrations.foreach(ext.injectTableFunction)
    ext.injectOptimizerRule(_ => graft.plans.RewriteKeepFirst)
    ext.injectPlannerStrategy(_ => graft.plans.VersionedRowLevelSqlStrategy)
  }
}

object GraftExtensions {

  private def info(name: String) =
    new ExpressionInfo("graft.functions.GraftExpressions", null, name)

  /** Builder-time validation (round-3 ADVICE): wrong arity surfaces as a
    * proper AnalysisException (Spark's WRONG_NUM_ARGS error class), not an
    * IndexOutOfBoundsException from `args(1)`; non-literal int parameters
    * get NON_FOLDABLE_ARGUMENT. Argument TYPES are checked by the
    * expressions themselves via ExpectsInputTypes (DATATYPE_MISMATCH). */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args =>
      if (args.length != n) Bridge.wrongNumArgs(name, n, args.length)
      else build(args)

  private def intArg(e: Expression, fn: String, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case _ => Bridge.nonFoldableArg(fn, what)
  }

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_hash32"), info("graft_hash32"),
      arity("graft_hash32", 1)(args => Md5Prefix32(args.head))),
    (FunctionIdentifier("graft_shingles"), info("graft_shingles"),
      arity("graft_shingles", 2)(args =>
        ShinglesExpr(args.head, intArg(args(1), "graft_shingles", "n")))),
    (FunctionIdentifier("graft_shingle_hashes"), info("graft_shingle_hashes"),
      arity("graft_shingle_hashes", 2)(args =>
        ShingleHashesExpr(args.head, intArg(args(1), "graft_shingle_hashes", "n")))),
    (FunctionIdentifier("graft_minhash"), info("graft_minhash"),
      arity("graft_minhash", 2)(args =>
        MinhashSigExpr(args.head, intArg(args(1), "graft_minhash", "k")))),
    (FunctionIdentifier("graft_simhash32"), info("graft_simhash32"),
      arity("graft_simhash32", 1)(args => Simhash32Expr(args.head))),
    (FunctionIdentifier("graft_dot"), info("graft_dot"),
      arity("graft_dot", 2)(args => DotDExpr(args.head, args(1)))),
    (FunctionIdentifier("graft_cosine"), info("graft_cosine"),
      arity("graft_cosine", 2)(args => CosineExpr(args.head, args(1)))),
    (FunctionIdentifier("graft_kmin"), info("graft_kmin"),
      arity("graft_kmin", 2)(args =>
        graft.functions.KMinLongs(args.head, intArg(args(1), "graft_kmin", "k")))),
    (FunctionIdentifier("graft_topk"), info("graft_topk"),
      arity("graft_topk", 3)(args =>
        graft.functions.TopKPairs(args.head, args(1), intArg(args(2), "graft_topk", "k")))),
    (FunctionIdentifier("graft_argmax"), info("graft_argmax"),
      arity("graft_argmax", 2)(args =>
        graft.functions.ArgMaxRow(args.head, args(1), reverse = false))),
    (FunctionIdentifier("graft_argmin"), info("graft_argmin"),
      arity("graft_argmin", 2)(args =>
        graft.functions.ArgMaxRow(args.head, args(1), reverse = true))))

  private def strArg(e: Expression, fn: String, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
    case _ => Bridge.nonFoldableArg(fn, what, "\"STRING\"")
  }

  private def longArg(e: Expression, fn: String, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case _ => Bridge.nonFoldableArg(fn, what)
  }

  /** SQL table-valued functions over the versioned lake for pure-SQL
    * consumers:
    *
    * {{{
    * SELECT * FROM graft_table_changes('/path/to/table', 3)       -- to newest
    * SELECT * FROM graft_table_changes('/path/to/table', 3, 7)    -- window
    * SELECT * FROM graft_history('/path/to/table')
    * }}}
    *
    * `from_version` is EXCLUSIVE: the result is the row-level diff
    * BETWEEN snapshot `from` and snapshot `to` (this library's
    * [[graft.io.Versioned.diffVersions]] convention everywhere — the
    * changes `from` itself introduced are in `(from-1, from]`). Note
    * Delta's `table_changes(t, v)` is INCLUSIVE of version v's own
    * changes; a Delta consumer migrating a call passes `v - 1` here.
    *
    * Builders run at analysis time: arguments must be literals (the
    * plan IS the diff of two concrete versions), and the returned plan
    * is the same file-aware diff / metadata-only history the Scala API
    * builds — only differing files read. */
  val tableRegistrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    (FunctionIdentifier("graft_table_changes"), info("graft_table_changes"),
      args => {
        if (args.length < 2 || args.length > 3)
          Bridge.wrongNumArgs("graft_table_changes", Seq(2, 3), args.length)
        val spark = org.apache.spark.sql.SparkSession.active
        val root = strArg(args.head, "graft_table_changes", "table")
        val from = longArg(args(1), "graft_table_changes", "from_version")
        val to = args.lift(2).map(longArg(_, "graft_table_changes", "to_version"))
        graft.io.Versioned.diffVersions(spark, root, from, to)
          .queryExecution.logical
      }),
    (FunctionIdentifier("graft_table_changes_keyed"), info("graft_table_changes_keyed"),
      args => {
        // keyed form: classify the window into insert/delete/
        // update_preimage/update_postimage by the comma-separated key
        // list — diffVersionsKeyed's contract (duplicate changed keys
        // refuse loudly) carries over
        if (args.length != 4)
          Bridge.wrongNumArgs("graft_table_changes_keyed", 4, args.length)
        val spark = org.apache.spark.sql.SparkSession.active
        val root = strArg(args.head, "graft_table_changes_keyed", "table")
        val from = longArg(args(1), "graft_table_changes_keyed", "from_version")
        val to = longArg(args(2), "graft_table_changes_keyed", "to_version")
        val keys = strArg(args(3), "graft_table_changes_keyed", "keys")
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        if (keys.isEmpty)
          Bridge.invalidParamValue("graft_table_changes_keyed", "keys",
            "must name at least one column (got an empty list)")
        graft.io.Versioned.diffVersionsKeyed(spark, root, from, Some(to), keys)
          .queryExecution.logical
      }),
    (FunctionIdentifier("graft_history"), info("graft_history"),
      args => {
        if (args.length != 1) Bridge.wrongNumArgs("graft_history", 1, args.length)
        val spark = org.apache.spark.sql.SparkSession.active
        graft.io.Versioned.history(spark,
          strArg(args.head, "graft_history", "table")).queryExecution.logical
      }))

  /** Register directly on a live session (for sessions created without
    * the extensions conf — extensions only apply at session build time).
    * Functions only; optimizer rules need [[injectOptimizerRules]]. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    registrations.foreach { case (id, i, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, i, builder)
    }
    tableRegistrations.foreach { case (id, i, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(id, i, builder)
    }
  }

  /** Add the graft optimizer rules AND planner strategies to a LIVE
    * session via experimental.extraOptimizations/extraStrategies
    * (idempotent). Split from [[register]] so callers opt in explicitly —
    * the rules rewrite plans session-wide. The SQL UPDATE/MERGE hook is a
    * planner strategy, not an optimizer rule, because live-injected
    * optimizer rules never see Command roots. */
  def injectOptimizerRules(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(graft.plans.RewriteKeepFirst))
      spark.experimental.extraOptimizations = cur :+ graft.plans.RewriteKeepFirst
    val strat = spark.experimental.extraStrategies
    if (!strat.contains(graft.plans.VersionedRowLevelSqlStrategy))
      spark.experimental.extraStrategies =
        strat :+ graft.plans.VersionedRowLevelSqlStrategy
  }
}
