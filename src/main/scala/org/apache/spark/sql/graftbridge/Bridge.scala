package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4's `Column` wraps a `ColumnNode` and
  * the converters are `private[sql]`; extensions that register Column-
  * authored expression trees in the FunctionRegistry need this one hop
  * (standard practice for Spark extension libraries).
  */
object Bridge {
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
}
