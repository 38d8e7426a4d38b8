package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression converters that
  * Spark 4 hides behind the classic/connect split. Lives in the
  * org.apache.spark.sql package solely to widen that access for graft's
  * custom Catalyst expressions (graft.functions); public Spark API
  * everywhere else.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A possibly-`.desc`/`.asc` sort column decomposed into its value column
    * and the descending? flag. Spark 4 models sort order as an internal
    * `ColumnNode` (not a catalyst SortOrder) until resolution, so the match
    * has to happen at the node layer — which is `private[sql]`, hence here.
    */
  def sortParts(c: Column): (Column, Boolean) = c.node match {
    case internal.SortOrder(child, dir, _, _) =>
      (Column(child), dir == internal.SortOrder.Descending)
    case _ => (c, false)
  }
}
