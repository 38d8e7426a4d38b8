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

  /** Field-union of two schemas via Catalyst's (private[sql]) StructType
    * merge — throws on incompatible types; callers treat that as
    * "cannot merge" and fall back.
    */
  def mergeSchemas(a: types.StructType, b: types.StructType): types.StructType =
    a.merge(b)

  /** Flatten a filter Column into its recognizable
    * (attribute, op, literal) conjuncts, where op is one of
    * "<" "<=" ">" ">=" "=" with an external JVM value, or "in" with a
    * Seq of external values. Conjuncts that aren't a plain
    * attr-vs-literal(s) comparison yield nothing (callers must treat
    * them as unprunable, never as false). Lives here because the
    * node-layer matchers are `private[sql]`.
    */
  def predicateBounds(c: Column): Seq[(String, String, Any)] = {
    def flip(op: String): String = op match {
      case "<" => ">"; case "<=" => ">="; case ">" => "<"; case ">=" => "<="
      case other => other
    }
    def attr(n: internal.ColumnNode): Option[String] = n match {
      case internal.UnresolvedAttribute(parts, _, _, _) => Some(parts.mkString("."))
      case _ => None
    }
    def lit(n: internal.ColumnNode): Option[Any] = n match {
      case internal.Literal(v, _, _) => Some(v)
      case _ => None
    }
    def go(n: internal.ColumnNode): Seq[(String, String, Any)] = n match {
      case internal.UnresolvedFunction("and", scala.collection.Seq(l, r), _, _, _, _) =>
        go(l) ++ go(r)
      case internal.UnresolvedFunction(op @ ("<" | "<=" | ">" | ">=" | "="),
          scala.collection.Seq(x, y), _, _, _, _) =>
        (attr(x), lit(y), attr(y), lit(x)) match {
          case (Some(a), Some(v), _, _) => Seq((a, op, v))
          case (_, _, Some(a), Some(v)) => Seq((a, flip(op), v))
          case _ => Nil
        }
      case internal.UnresolvedFunction("in", args, _, _, _, _)
          if args.nonEmpty && attr(args.head).isDefined =>
        val vs = args.tail.map(lit)
        if (vs.forall(_.isDefined)) Seq((attr(args.head).get, "in", vs.flatten))
        else Nil
      case _ => Nil
    }
    go(c.node)
  }
}
