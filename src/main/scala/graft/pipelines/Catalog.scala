package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Dates, Dedup, Normalize}

/** Remaining catalog/master entities — the thin pipelines that complete
  * the reference's DAG task list (dag_maestros.py:159 ordering: families ->
  * categories -> marks -> ... -> employees, B2C, inventory).
  *
  * These are deliberately small: their wire shapes need only rename/
  * select/cast, and every non-trivial op they use (explode, lookup, dedup,
  * date parsing) is the shared ops kernel.
  */
object Catalog {

  // ---- item families / categories / trademarks
  //      (/root/reference/dags/CotyData_IPN.py:958-1101 pipelines;
  //       families capped at 250/page, dags/API_IPN.py:583-585)

  val familySchema = StructType(Seq(
    StructField("Id", IntegerType), StructField("Description", StringType)))

  def families(docs: DataFrame): DataFrame =
    docs.select(col("Id").as("CODIGO_FAMILIA"),
      col("Description").as("DESCRIPCION_FAMILIA"))

  def categories(docs: DataFrame): DataFrame =
    docs.select(col("Id").as("CODIGO_CATEGORIA"),
      col("Description").as("DESCRIPCION_CATEGORIA"))

  def trademarks(docs: DataFrame): DataFrame =
    docs.select(col("Id").as("CODIGO_MARCA"),
      col("Description").as("DESCRIPCION_MARCA"))

  // ---- employees (/root/reference/dags/CotyData_IPN.py employees load)

  val employeeSchema = StructType(Seq(
    StructField("Id", LongType), StructField("Name", StringType),
    StructField("IsDeleted", BooleanType),
    StructField("Store", StructType(Seq(StructField("Id", IntegerType))))))

  def employees(docs: DataFrame): DataFrame =
    docs.select(col("Id").as("ID_EMPLEADO"), col("Name").as("NOMBRE_EMPLEADO"),
      (!col("IsDeleted")).cast("int").as("EMPLEADO_ACTIVO"),
      col("Store.Id").as("CODIGO_SUCURSAL"))

  // ---- B2C orders. The reference's caller unpacks 2 of 3 return values
  //      and would crash (/root/reference/dags/API_IPN.py:846, SURVEY
  //      §2.14) — implemented correctly here.

  val b2cSchema = StructType(Seq(
    StructField("OrderId", LongType), StructField("OrderDate", StringType),
    StructField("CustomerEmail", StringType), StructField("TotalAmt", DoubleType),
    StructField("Items", ArrayType(StructType(Seq(
      StructField("Sku", StringType), StructField("Qty", DoubleType),
      StructField("Price", DoubleType)))))))

  def b2cHeaders(docs: DataFrame): DataFrame =
    Normalize.headers(docs, Seq("Items"))
      .select(col("OrderId").as("ID_PEDIDO_B2C"),
        Dates.isoDatePrefix(col("OrderDate")).as("FECHA_PEDIDO"),
        col("CustomerEmail").as("EMAIL_CLIENTE"),
        col("TotalAmt").as("TOTAL_PEDIDO"))

  def b2cItems(docs: DataFrame): DataFrame =
    Normalize.explodeChild(docs.withColumnRenamed("OrderId", "ID_PEDIDO_B2C"),
        "Items", Seq("ID_PEDIDO_B2C"))
      .withColumnsRenamed(Map("Sku" -> "SKU", "Qty" -> "CANTIDAD", "Price" -> "PRECIO"))

  // ---- inventory snapshot (stock per item per store; PUT write-back is
  //      RestWriteback K9)

  val inventorySchema = StructType(Seq(
    StructField("ItemId", LongType), StructField("StoreId", IntegerType),
    StructField("Stock", DoubleType), StructField("AsOf", StringType)))

  /** Latest snapshot per (item, store) — keep-first on descending AsOf. */
  def inventory(docs: DataFrame): DataFrame =
    Dedup.keepFirst(Seq("ItemId", "StoreId"),
        Seq(col("AsOf").desc, col("Stock")))(docs)
      .select(col("ItemId").as("ITEM_ID"), col("StoreId").as("CODIGO_SUCURSAL"),
        col("Stock").as("STOCK"), col("AsOf").cast("timestamp").as("FECHA_STOCK"))

  // ---- delivery notes V3 (/root/reference/dags/CotyData_IPN.py:1328-1367;
  //      'Devolución a proveedor' filter :1642; group-sum :1365,1689)

  val dnV3Schema = StructType(Seq(
    StructField("Id", LongType), StructField("DeliveryNoteNumber", StringType),
    StructField("DeliveryNoteDate", StringType),
    StructField("Audit", StructType(Seq(
      StructField("CreationUsername", StringType),
      StructField("CreationDatetime", StringType),
      StructField("DeletionDatetime", StringType)))),
    StructField("Origin", StructType(Seq(StructField("Name", StringType)))),
    StructField("Destination", StructType(Seq(StructField("Name", StringType)))),
    StructField("DeliveryNoteCategory", StructType(Seq(
      StructField("Id", IntegerType), StructField("Name", StringType)))),
    StructField("SalesOrder", StructType(Seq(
      StructField("SalesOrderNumberChr", StringType)))),
    StructField("Details", ArrayType(StructType(Seq(
      StructField("Item", StructType(Seq(
        StructField("Id", LongType), StructField("Code", StringType)))),
      StructField("UnitQty", DoubleType)))))))

  /** Header rows; supplier-return category filtered out (F5), cancelled =
    * DeletionDatetime set.
    */
  def dnV3Headers(docs: DataFrame): DataFrame =
    docs.filter(col("DeliveryNoteCategory.Name") =!= "Devolución a proveedor")
      .select(col("Id").as("REFER_ID"),
        col("DeliveryNoteNumber").as("NUMERO_REMITO"),
        Dates.isoDatePrefix(col("DeliveryNoteDate")).as("FECHA_REMITO"),
        col("Audit.CreationUsername").as("USUARIO_CREACION"),
        col("Origin.Name").as("SUCURSAL_ORIGEN"),
        col("Destination.Name").as("SUCURSAL_DESTINO"),
        col("DeliveryNoteCategory.Id").as("ID_CATEGORIA_REMITO"),
        col("SalesOrder.SalesOrderNumberChr").as("NUMERO_PEDIDO"),
        col("Audit.DeletionDatetime").isNotNull.cast("int").as("REMITO_ANULADO"))

  /** Detail rows summarized per (NUMERO_REMITO, SKU)
    * (/root/reference/dags/CotyData_IPN.py:1689).
    */
  def dnV3Details(docs: DataFrame): DataFrame =
    Normalize.explodeChild(
        docs.filter(col("DeliveryNoteCategory.Name") =!= "Devolución a proveedor")
          .withColumnRenamed("DeliveryNoteNumber", "NUMERO_REMITO"),
        "Details", Seq("NUMERO_REMITO"))
      .select(col("NUMERO_REMITO"), col("Item.Code").as("SKU"),
        col("UnitQty").as("CANTIDAD_REMITIDA"))
      .groupBy("NUMERO_REMITO", "SKU")
      .agg(sum("CANTIDAD_REMITIDA").as("CANTIDAD_REMITIDA"))

  // ---- cost log (same shape as price log with ModificationDatetime,
  //      /root/reference/dags/CotyData_IPN.py:1789-1801)

  val costLogSchema = StructType(Seq(
    StructField("Item", StructType(Seq(StructField("Id", LongType)))),
    StructField("PriceCostValueNew", DoubleType),
    StructField("Audit", StructType(Seq(StructField("ModificationDatetime", StringType))))))

  def costHistory(docs: DataFrame): DataFrame = {
    val parsed = docs.select(
      col("Item.Id").as("ITEM_ID"),
      col("PriceCostValueNew").as("COSTO"),
      Dates.parseTimestampMulti(col("Audit.ModificationDatetime"),
        Seq(Dates.IsoT, "yyyy-MM-dd HH:mm:ss", Dates.DmyHms)).as("ts"))
    Dedup.keepFirst(Seq("ITEM_ID"), Seq(col("ts"), col("COSTO")))(parsed)
      .select(col("ITEM_ID"), col("COSTO"), Dates.formatMs23(col("ts")).as("FECHA_COSTO"))
  }
}
