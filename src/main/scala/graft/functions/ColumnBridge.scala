// Bridge into Spark's classic Column↔Expression conversion, which became
// private[sql] in Spark 4's Connect refactor. Library code registering custom
// Catalyst expressions needs exactly these two calls and nothing else.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftColumnBridge {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
