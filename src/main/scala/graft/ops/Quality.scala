package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality checks.
  *
  * SURVEY §2.5 (J4): the reference silently assumes referential integrity —
  * `Series.map` lookups leave NaN on unmatched keys and a later
  * `astype(int)` crashes (/root/reference/dags/Funciones_CotyData.py:67-72,
  * 128-133). The engine makes those assumptions CHECKABLE: each check
  * returns the violating rows (route to a dead-letter sink), and `profile`
  * gives the per-column shape a training-data pipeline reports before/after
  * every transform stage.
  */
object Quality {

  /** Child rows whose FK has no parent (empty = integrity holds). */
  def fkViolations(child: DataFrame, parent: DataFrame,
                   childKey: String, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")

  /** Key groups that occur more than once (empty = key is unique). */
  def uniqueViolations(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Rows with nulls in required columns. */
  def nullViolations(df: DataFrame, required: Seq[String]): DataFrame =
    df.filter(required.map(c => col(c).isNull).reduce(_ || _))

  /** Long-format per-column profile: nulls, distinct count, min/max as
    * strings. One aggregation pass per column batch; at scale run on a
    * sample or per-partition sketch first.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
                col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_ unionByName _)
}
