package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType}

/** ExpectsInputTypes facade: `AbstractDataType` is private[sql], so
  * expressions outside the sql package tree declare their expected input
  * types as plain DataTypes through this trait and still get Spark's
  * standard DATATYPE_MISMATCH analysis errors. */
trait GraftExpectsInputTypes extends ExpectsInputTypes {
  def graftInputTypes: Seq[DataType]
  override def inputTypes: Seq[AbstractDataType] = graftInputTypes
}

/** Column <-> Expression bridge for registering custom Catalyst
  * expressions as Columns. ExpressionUtils is private[sql] in Spark 4.x,
  * so the accessor lives inside the sql package tree — the standard
  * pattern for Spark extension libraries that predate an official hook.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over an already-analyzed logical plan (classic
    * Dataset.ofRows is private[sql]) — used by the SQL row-level command
    * rewrites to execute a MERGE source plan captured at analysis. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Proper analysis-time error for a wrong argument count to a registered
    * SQL function (AnalysisException with Spark's standard error class,
    * not an IndexOutOfBoundsException from the builder). */
  def wrongNumArgs(name: String, expected: Int, actual: Int): Nothing =
    throw org.apache.spark.sql.errors.QueryCompilationErrors
      .wrongNumArgsError(name, Seq(expected), actual)

  /** Analysis-time error for a parameter that must be a foldable int
    * literal (band counts, k, shingle width) but isn't. */
  def nonFoldableArg(name: String, param: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map(
        "funcName" -> name, "paramName" -> param, "paramType" -> "\"INT\""))
}
