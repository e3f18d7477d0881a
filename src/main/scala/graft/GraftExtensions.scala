package graft

import graft.functions.GraftExpressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the graft expressions as SQL
  * functions so `spark.sql("SELECT graft_hash32(text) ...")` works from
  * any SQL surface (thrift, notebooks) without Scala imports.
  *
  * Enable with
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String) =
    new ExpressionInfo("graft.functions.GraftExpressions", null, name)

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_hash32"), info("graft_hash32"),
      args => Md5Prefix32(args.head)),
    (FunctionIdentifier("graft_shingles"), info("graft_shingles"),
      args => ShinglesExpr(args.head, intArg(args(1), "n"))),
    (FunctionIdentifier("graft_shingle_hashes"), info("graft_shingle_hashes"),
      args => ShingleHashesExpr(args.head, intArg(args(1), "n"))),
    (FunctionIdentifier("graft_minhash"), info("graft_minhash"),
      args => MinhashSigExpr(args.head, intArg(args(1), "k"))),
    (FunctionIdentifier("graft_simhash32"), info("graft_simhash32"),
      args => Simhash32Expr(args.head)),
    (FunctionIdentifier("graft_dot"), info("graft_dot"),
      args => DotDExpr(args.head, args(1))))

  /** Register directly on a live session (for sessions created without
    * the extensions conf — extensions only apply at session build time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (id, i, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, i, builder)
    }
}
