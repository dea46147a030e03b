package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column↔Expression converters
  * (Spark 4 moved Column onto ColumnNode; building a Column from a
  * runtime-constructed Catalyst Expression — e.g. a NearestCentroid
  * with centroids trained at plan time — goes through
  * classic.ExpressionUtils, which is private[sql]). Standard
  * extension-library technique; only public Spark APIs are re-exposed.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The EAGER Catalyst tree of a Column. `expression` returns a lazy
    * `ColumnNodeExpression` wrapper for Columns built through the
    * public DSL (`col("day") === …`) — opaque to any syntactic
    * inspector (e.g. the lake's day-bound Pred extractor). This runs
    * Spark's own node→expression converter, the one analysis itself
    * uses, so the returned tree is exactly what the plan would hold. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
