package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nested-document relational normalization — the reference's signature
  * transform shape (SURVEY.md §2.10 G1-G10): one JSON document becomes a
  * header row plus N child rows, with parent keys injected into each child
  * (/root/reference/dags/CotyData_IPN.py:251-275 sales split; :1252-1275
  * delivery-note child flatten; :528-536 3-level attribute nesting).
  *
  * In Spark this is `explode`/`inline` (Generator) territory: narrow,
  * pipelined, no shuffle — a 100 TB scan of nested documents flattens at
  * scan speed. The inverse (`nest`) is one hash aggregation.
  */
object Normalize {

  /** Header extraction: the document minus its child arrays
    * (G1 header path, /root/reference/dags/CotyData_IPN.py:267-275).
    */
  def headers(df: DataFrame, childCols: Seq[String]): DataFrame =
    df.drop(childCols: _*)

  /** Child flatten: one output row per element of `childCol`, carrying
    * `parentCols` into each row, child struct fields hoisted to top level
    * (G2, /root/reference/dags/CotyData_IPN.py:1252-1275). Rows with empty
    * or null arrays disappear, matching the reference's per-element loops.
    */
  def explodeChild(df: DataFrame, childCol: String, parentCols: Seq[String]): DataFrame =
    df.select(parentCols.map(col) :+ explode(col(childCol)).as("__child"): _*)
      .select(parentCols.map(col) :+ col("__child.*"): _*)

  /** Like explodeChild but keeps parents with no children (null child
    * columns) — `explode_outer` analog of a LEFT JOIN to the child table.
    */
  def explodeChildOuter(df: DataFrame, childCol: String, parentCols: Seq[String]): DataFrame =
    df.select(parentCols.map(col) :+ explode_outer(col(childCol)).as("__child"): _*)
      .select(parentCols.map(col) :+ col("__child.*"): _*)

  /** Inverse of explodeChild: group child rows under their parent keys as a
    * deterministically ordered array of structs. `payloadCols` must lead
    * with the ordering column(s) — `sort_array` orders structs
    * lexicographically by field position, which makes `collect_list`'s
    * arbitrary shuffle order reproducible.
    */
  def nest(df: DataFrame, keys: Seq[String], payloadCols: Seq[String], childName: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(payloadCols.map(col): _*))).as(childName))
}
