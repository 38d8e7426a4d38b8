package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD type 2) interval building: turn an
  * append-only change log into validity intervals — each record is valid
  * from its own timestamp until the key's next record (open-ended null
  * for the current one). The reference maintains price/cost history
  * tables by re-pulling and upserting rows
  * (/root/reference/dags/Funciones_CotyData.py:1488-1560 price history);
  * interval form is what joins back to facts as-of (see
  * [[AsOf.joinAsOf]]).
  *
  * One window shuffle on the key — the minimal plan for the semantics.
  * `orderCols` must totally order each key's records (include a unique
  * id after the timestamp) or valid_to would be nondeterministic.
  */
object Scd {

  def intervals(log: DataFrame, keys: Seq[String], orderCols: Seq[Column],
                validFromCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    log.withColumn("valid_from", col(validFromCol))
      .withColumn("valid_to", lead(col(validFromCol), 1).over(w))
  }
}
