package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level cleaning/recoding ops (SURVEY.md §2.3-2.4, §2.9).
  *
  * All are pure `DataFrame => DataFrame` (or Column combinators) built from
  * codegen'd built-ins — no UDFs, so they fuse into whole-stage codegen and
  * scale with the scan.
  */
object Cleaning {

  /** `''` -> null tri-state normalization
    * (/root/reference/dags/CotyData_IPN.py:97,1125-1127).
    */
  def nullifyEmpty(cols: Seq[String])(df: DataFrame): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, when(col(c) === "", lit(null)).otherwise(col(c))))

  /** Value recode with keep-on-miss semantics, replacing pandas
    * `.replace({from: to})` (/root/reference/dags/CotyData_IPN.py:1160;
    * dags/Funciones_CotyData.py:211-212). Unlisted values pass through.
    */
  def recode(c: Column, mapping: Seq[(Any, Any)]): Column =
    mapping.foldRight(c) { case ((from, to), acc) => when(c === lit(from), lit(to)).otherwise(acc) }

  /** Conditional sign flip, replacing `df.loc[mask, cols] *= -1` — the
    * credit-note convention (/root/reference/dags/CotyData_IPN.py:112-113,139,160).
    * Involutive on the flipped set: applying twice restores the input.
    */
  def signFlip(cols: Seq[String], pred: Column)(df: DataFrame): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, when(pred, -col(c)).otherwise(col(c))))

  /** Split one delimited column into N new columns, replacing
    * `str.split(sep, expand=True)` — the invoice-number "0001-00001234"
    * split (/root/reference/dags/CotyData_IPN.py:99).
    */
  def splitInto(src: String, sep: String, targets: Seq[String])(df: DataFrame): DataFrame = {
    val parts = split(col(src), java.util.regex.Pattern.quote(sep))
    targets.zipWithIndex.foldLeft(df) { case (d, (t, i)) => d.withColumn(t, parts.getItem(i)) }
  }

  /** Unconditional string prefix applied only where the column does NOT
    * contain `token` (/root/reference/dags/Funciones_CotyData.py:154-158 —
    * note: a plain prefix, not lpad).
    */
  def prefixUnlessContains(c: Column, token: String, prefix: String): Column =
    when(!c.contains(token), concat(lit(prefix), c)).otherwise(c)

  /** Null-safe "State; City" style concat: both -> "a; b", only first -> a,
    * else null (/root/reference/dags/CotyData_IPN.py:354-359,2215-2217).
    */
  def nullSafeJoin(first: Column, second: Column, sep: String): Column =
    when(first.isNotNull && second.isNotNull, concat_ws(sep, first, second))
      .when(first.isNotNull, first)
      .otherwise(lit(null))
}
