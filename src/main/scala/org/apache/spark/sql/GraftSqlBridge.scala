package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression conversions for
  * graft's native Catalyst expressions (graft.functions.VectorExpressions).
  *
  * Spark 4 hid direct `Column(expr)` construction behind
  * `org.apache.spark.sql.classic.ExpressionUtils` as part of the Connect
  * split; third-party expression libraries bridge it from a file in the
  * `org.apache.spark.sql` package — the same technique Delta/Sedona-style
  * extensions use. No Spark internals are modified; this only re-exports two
  * conversions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A one-row/one-column DataFrame as an in-plan scalar subquery column —
    * the form expressions like `might_contain` require their build input in
    * (constant or scalar subquery), evaluated by the engine as a subquery
    * stage, never collected through the driver. */
  def scalarSubquery(df: DataFrame): Column =
    column(catalyst.expressions.ScalarSubquery(df.queryExecution.analyzed))
}
