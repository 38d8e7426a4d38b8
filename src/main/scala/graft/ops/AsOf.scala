package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark lacks natively.
  *
  * Per the engine's custom-operator preference order, this is case (a):
  * composed entirely from built-ins. Left and right rows are unioned into
  * one event-time stream per key; a last-non-null carry-forward window
  * attaches the latest right value with rightTime <= leftTime to each left
  * row. One shuffle on the key (the same shuffle a join would need), no
  * range explosion, no custom SparkPlan.
  *
  * At scale this beats the naive `l JOIN r ON key AND r.ts <= l.ts` +
  * greatest-per-group formulation, which materializes every (left, earlier
  * right) combination before pruning.
  */
object AsOf {

  /** For each left row, attach `valueCol` from the right row with the
    * greatest `rightTs <= leftTs` for the same `keys` (null when none).
    * Ties on the timestamp resolve to the right row (inclusive >=).
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, valueCol: String,
               outCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__t"), lit(0).as("__isRight"),
        lit(null).cast(right.schema(valueCol).dataType).as("__v"),
        struct(leftCols.map(col): _*).as("__row")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__t"), lit(1).as("__isRight"),
        col(valueCol).as("__v"), lit(null).cast(l.schema("__row").dataType).as("__row")): _*)
    // right rows sort BEFORE left rows at equal timestamps => inclusive >=
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__isRight").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(outCol, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__isRight") === 0)
      .select(col("__row.*"), col(outCol))
  }
}
