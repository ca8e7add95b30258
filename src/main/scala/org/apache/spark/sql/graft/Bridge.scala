package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column a ColumnNode wrapper and gated the
  * Expression<->Column bridge behind private[sql] ExpressionUtils. This
  * object lives in the org.apache.spark.sql package solely to re-export
  * those two conversions for graft's custom Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
