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

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.GraftExpressions", null, name)

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_hash32"),
      info("graft_hash32", "graft_hash32(str) - md5-prefix 32-bit hash"),
      (args: Seq[Expression]) => Md5Prefix32(args.head)))

    ext.injectFunction((FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(tokens, n) - word n-gram shingles"),
      (args: Seq[Expression]) => ShinglesExpr(args.head, intArg(args(1), "n"))))

    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "graft_shingle_hashes(tokens, n) - hashed n-gram shingles"),
      (args: Seq[Expression]) => ShingleHashesExpr(args.head, intArg(args(1), "n"))))

    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(hashes, k) - k-component minhash signature"),
      (args: Seq[Expression]) => MinhashSigExpr(args.head, intArg(args(1), "k"))))

    ext.injectFunction((FunctionIdentifier("graft_simhash32"),
      info("graft_simhash32", "graft_simhash32(hashes) - 32-bit simhash"),
      (args: Seq[Expression]) => Simhash32Expr(args.head)))

    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - sequential-fold double dot product"),
      (args: Seq[Expression]) => DotDExpr(args.head, args(1))))
  }
}
