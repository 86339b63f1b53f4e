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

  /** Non-blocking observation read: sinks need it because a
    * `SaveMode.Ignore` no-op write never runs a job, so the blocking
    * `get` would never return. Built on `getRowOrEmpty` (bounded
    * 100 ms wait → Option) — `getOrEmpty` NPEs on its schemaless
    * placeholder row when no metrics ever arrive. */
  def observedOrEmpty(o: org.apache.spark.sql.Observation): Map[String, Any] =
    o.getRowOrEmpty
      .filter(_.schema != null)
      .map(r => r.schema.fieldNames.zip(r.toSeq).toMap[String, Any])
      .getOrElse(Map.empty)
}
