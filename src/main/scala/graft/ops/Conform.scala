package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Schema conformance — the engine's answer to the reference's defensive
  * `df.reindex(columns=columnas_requeridas)` which forces a fixed column
  * set, fills missing columns with NaN, drops extras, and orders columns
  * (/root/reference/dags/CotyData_IPN.py:87-94), plus the `try/except
  * KeyError` add-absent-column guard (:144-149).
  *
  * Unlike the reference, the target schema is explicit and typed: missing
  * columns materialize as typed nulls so downstream casts cannot blow up on
  * schema drift. Purely a projection — no shuffle, stays inside
  * whole-stage codegen, and column pruning still reaches the scan.
  */
object Conform {

  /** Project `df` onto exactly `schema`'s columns, in order. Missing columns
    * become typed nulls; extra columns are dropped; present columns are cast.
    * Idempotent: conformTo(s)(conformTo(s)(df)) == conformTo(s)(df).
    */
  def conformTo(schema: StructType)(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    df.select(schema.fields.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }
}
