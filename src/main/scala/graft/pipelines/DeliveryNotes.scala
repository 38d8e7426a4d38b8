package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Cleaning, Normalize}

/** Delivery-notes V2 pipeline: flat header + Items[]
  * (/root/reference/dags/CotyData_IPN.py:1109-1275).
  *
  * Covers: ''->null normalization (:1125-1127), the 0->7 category recode
  * (:1160), child explode with parent keys (:1263-1267), and the
  * (REFER_ID, ITEM_ID) group-sum detail summarization (A1, :1235).
  */
object DeliveryNotes {

  val docSchema = StructType(Seq(
    StructField("SaleReferID", LongType), StructField("SaleReferNumber", StringType),
    StructField("SalesOrderNumber", StringType), StructField("StoreID", IntegerType),
    StructField("DestinationStoreID", IntegerType), StructField("CategoryID", IntegerType),
    StructField("CreationDate", StringType), StructField("CreatedByUserName", StringType),
    StructField("Items", ArrayType(StructType(Seq(
      StructField("ItemID", LongType), StructField("UnitQty", DoubleType)))))))

  def transformHeader(docs: DataFrame): DataFrame = {
    val cleaned = Cleaning.nullifyEmpty(
      Seq("SalesOrderNumber", "CreatedByUserName"))(Normalize.headers(docs, Seq("Items")))
    cleaned
      .withColumn("CategoryID", Cleaning.recode(col("CategoryID"), Seq(0 -> 7)))
      .withColumnsRenamed(Map(
        "SaleReferID" -> "REFER_ID", "SaleReferNumber" -> "NUMERO_REMITO",
        "SalesOrderNumber" -> "NUMERO_PEDIDO", "StoreID" -> "CODIGO_SUCURSAL_ORIGEN",
        "DestinationStoreID" -> "CODIGO_SUCURSAL_DESTINO",
        "CategoryID" -> "ID_CATEGORIA_REMITO",
        "CreationDate" -> "FECHA_CREACION", "CreatedByUserName" -> "USUARIO_CREACION"))
      .withColumn("FECHA_CREACION", col("FECHA_CREACION").cast("timestamp"))
      .withColumn("REMITO_ANULADO", lit(0))
  }

  /** Detail rows summarized per (REFER_ID, ITEM_ID)
    * (/root/reference/dags/CotyData_IPN.py:1235).
    */
  def transformDetails(docs: DataFrame): DataFrame =
    Normalize.explodeChild(
      docs.withColumnsRenamed(Map("SaleReferID" -> "REFER_ID",
                                  "SaleReferNumber" -> "NUMERO_REMITO")),
      "Items", Seq("REFER_ID", "NUMERO_REMITO"))
      .withColumnsRenamed(Map("ItemID" -> "ITEM_ID", "UnitQty" -> "CANTIDAD_REMITIDA"))
      .groupBy("REFER_ID", "ITEM_ID", "NUMERO_REMITO")
      .agg(sum("CANTIDAD_REMITIDA").as("CANTIDAD_REMITIDA"))
}
