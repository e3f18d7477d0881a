package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for registering custom Catalyst
  * expressions as Columns. ExpressionUtils is private[sql] in Spark 4.x,
  * so the accessor lives inside the sql package tree — the standard
  * pattern for Spark extension libraries that predate an official hook.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
