package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Enrich

/** Expenses (gastos) pipeline: the two-level dimension lookup where the
  * sub-type key is a CONCATENATION of the sub-type description and the
  * resolved parent type id
  * (/root/reference/dags/Funciones_CotyData.py:250-280 — type lookup
  * :250-260, concat key sub-type lookup :266-280; dim queries use
  * `CONCAT(desc,'-',id)` on the SQL side :267).
  *
  * Both lookups are broadcast joins with explicit null-on-miss — the
  * reference's `Series.map` + later `astype(int)` crashes on unmatched
  * keys (SURVEY §2.5 J4); here misses surface as nulls the caller can
  * route to a dead-letter sink.
  */
object Expenses {

  /** @param tipos    dim (TIPO_GASTO_DESCRIPCION, ID_TIPO_GASTO)
    * @param subTipos dim (SUB_TIPO_KEY = "desc-parentId", ID_SUB_TIPO_GASTO)
    */
  def transform(expenses: DataFrame, tipos: DataFrame, subTipos: DataFrame): DataFrame = {
    val withTipo = Enrich.mapLookup(expenses, tipos,
      srcCol = "TIPO", dimKey = "TIPO_GASTO_DESCRIPCION", dimVal = "ID_TIPO_GASTO",
      outCol = "ID_TIPO_GASTO")
    // two-level key: sub-type description scoped by the resolved parent id
    // (/root/reference/dags/Funciones_CotyData.py:277-280)
    val withKey = withTipo.withColumn("__subkey",
      concat_ws("-", col("SUB_TIPO"), col("ID_TIPO_GASTO")))
    Enrich.mapLookup(withKey, subTipos,
        srcCol = "__subkey", dimKey = "SUB_TIPO_KEY", dimVal = "ID_SUB_TIPO_GASTO",
        outCol = "ID_SUB_TIPO_GASTO")
      .drop("__subkey", "TIPO", "SUB_TIPO")
  }
}
