package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication (SURVEY.md §2.6 A3-A4).
  *
  * pandas `drop_duplicates(subset=…, keep='first')`
  * (/root/reference/dags/CotyData_IPN.py:166,1750,1798) is input-order
  * dependent; Spark's `dropDuplicates` keeps an arbitrary row per key and is
  * therefore not reproducible across partitionings. `keepFirst` makes the
  * choice explicit with an ordering, which is the only distribution-safe
  * reading of the reference's semantics (price/cost logs are
  * creation-ordered).
  *
  * Scale: one hash-partition shuffle on the key columns; the row_number
  * window runs per-partition after the shuffle, no skew beyond the key
  * distribution itself (salt keys upstream if a single key dominates).
  */
object Dedup {

  /** Keep exactly one row per key, the first under `order`. `order` must be a
    * total order within each key group for determinism.
    */
  def keepFirst(keys: Seq[String], order: Seq[Column])(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact full-row dedup (`drop_duplicates()`,
    * /root/reference/dags/Funciones_CotyData.py:310).
    */
  def exact(df: DataFrame): DataFrame = df.distinct()

  /** Exact dedup on a derived key, keeping the first row by `order` — the
    * shape used for hash-keyed document dedup at scale: group on a cheap
    * digest, never on the full payload.
    */
  def exactByKey(keyExpr: Column, order: Seq[Column])(df: DataFrame): DataFrame =
    keepFirst(Seq("__k"), order)(df.withColumn("__k", keyExpr)).drop("__k")
}
