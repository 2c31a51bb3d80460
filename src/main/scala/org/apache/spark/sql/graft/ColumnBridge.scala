package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters.
  *
  * Spark 4 hides the catalyst Expression behind ColumnNode; libraries
  * that ship custom codegen Expressions (graft.gen.RandStringExpr)
  * need this hop. Lives in an org.apache.spark.sql subpackage on
  * purpose — the supported pattern for engine extensions that predate
  * a public API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** An uncorrelated scalar subquery over `df`'s analyzed plan — the
    * building block for runtime-filter shapes (a bloom/min-max built
    * by a subquery stage at EXECUTION time rather than eagerly at
    * DataFrame-construction time, mirroring Spark's own
    * InjectRuntimeFilter). `df` must produce exactly one row/column.
    */
  def scalarSubquery(df: org.apache.spark.sql.DataFrame): Expression =
    org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed)
}
