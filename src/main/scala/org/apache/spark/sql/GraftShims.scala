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
}
