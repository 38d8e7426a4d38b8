package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimension-enrichment joins (SURVEY.md §2.5 J1-J7).
  *
  * The reference builds `{desc: code}` dicts from small dimension tables and
  * applies them with `Series.map`
  * (/root/reference/dags/Funciones_CotyData.py:19-24,36-44) — exactly a
  * broadcast hash join with null-on-miss. All dimension sides here are
  * explicitly `broadcast()`: at 100 TB the fact side streams through
  * map-side joins with zero shuffle.
  */
object Enrich {

  /** `Series.map({key: value})` analog: left-join a small dim, project one
    * value column, null where unmatched (J3).
    */
  def mapLookup(df: DataFrame, dim: DataFrame, srcCol: String,
                dimKey: String, dimVal: String, outCol: String): DataFrame = {
    val d = dim.select(col(dimKey).as("__k"), col(dimVal).as(outCol)).distinct()
    df.join(broadcast(d), df(srcCol) === col("__k"), "left").drop("__k")
  }

  /** Multi-key inner dim join (J1,
    * /root/reference/dags/Funciones_CotyData.py:197,289).
    */
  def dimJoin(df: DataFrame, dim: DataFrame, cond: Column, how: String = "inner"): DataFrame =
    df.join(broadcast(dim), cond, how)

  /** Same dim joined twice under different roles (origin/destination
    * enrichment, /root/reference/dags/CotyData_IPN.py:1138-1157): join an
    * aliased copy per role.
    */
  def dualDimJoin(df: DataFrame, dim: DataFrame, roles: Seq[(String, Column => Column)]): DataFrame =
    roles.foldLeft(df) { case (acc, (alias, cond)) =>
      val aliased = dim.columns.foldLeft(dim)((d, c) => d.withColumnRenamed(c, s"${alias}_$c"))
      acc.join(broadcast(aliased), cond(col(s"${alias}_${dim.columns.head}")), "left")
    }

  /** Load-only-new anti-join, replacing the fetch-existing-then-loop filter
    * (J6, /root/reference/dags/CotyData_IPN.py:2148-2154).
    */
  def antiJoin(df: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    df.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** Membership semi-join for large key sets where `isin` would bloat the
    * plan (J7, /root/reference/dags/CotyData_IPN.py:79-80,139).
    */
  def semiJoin(df: DataFrame, keySet: DataFrame, keys: Seq[String]): DataFrame =
    df.join(keySet.select(keys.map(col): _*).distinct(), keys, "left_semi")
}
