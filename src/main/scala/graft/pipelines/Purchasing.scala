package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Cleaning, Dates, Dedup, Normalize}

/** Purchasing-side pipelines: purchase orders (G4), goods receipts (G5),
  * sales orders (G6), suppliers, attribute values (G7), and price/cost
  * logs (the 'mixed'-format timestamps + keep-first dedup shapes).
  */
object Purchasing {

  // ---- Purchase orders (/root/reference/dags/CotyData_IPN.py:1830-1857) ----

  val poSchema = StructType(Seq(
    StructField("Id", LongType), StructField("PurchaseOrderNumber", StringType),
    StructField("Audit", StructType(Seq(StructField("CreationDate", StringType)))),
    StructField("TotalNetAmt", DoubleType),
    StructField("Supplier", StructType(Seq(StructField("Id", LongType)))),
    StructField("BuyerEmployee", StructType(Seq(StructField("Id", LongType)))),
    StructField("PurchaseOrderStatus", StructType(Seq(StructField("Id", IntegerType)))),
    StructField("PurchaseOrderType", StructType(Seq(StructField("Id", IntegerType)))),
    StructField("Details", ArrayType(StructType(Seq(
      StructField("Id", LongType),
      StructField("Item", StructType(Seq(StructField("Id", LongType)))),
      StructField("UnitQty", DoubleType), StructField("UnitPrice", DoubleType)))))))

  /** Header: dd/MM/yyyy creation date (:1836), status 13 -> PRESCRITA flag
    * (:1840), absent type defaults to 7 (:1841 guarded .get).
    */
  def purchaseOrderHeaders(docs: DataFrame): DataFrame =
    Normalize.headers(docs, Seq("Details"))
      .select(
        col("Id").as("ID_ORDEN_COMPRA"),
        col("PurchaseOrderNumber").as("NUMERO_ORDEN_COMPRA"),
        to_date(col("Audit.CreationDate"), "dd/MM/yyyy").as("FECHA_CREACION"),
        col("TotalNetAmt").as("TOTAL_NETO"),
        col("Supplier.Id").as("CODIGO_PROVEEDOR"),
        col("BuyerEmployee.Id").as("ID_COMPRADOR"),
        col("PurchaseOrderStatus.Id").as("ID_ESTADO"),
        when(col("PurchaseOrderStatus.Id") === 13, 1).otherwise(0).as("PRESCRITA"),
        coalesce(col("PurchaseOrderType.Id"), lit(7)).as("ID_TIPO_ORDEN_COMPRA"))

  /** Details flatten (G4, /root/reference/dags/CotyData_IPN.py:1845-1857). */
  def purchaseOrderDetails(docs: DataFrame): DataFrame =
    Normalize.explodeChild(docs.withColumnRenamed("Id", "ID_ORDEN_COMPRA"),
        "Details", Seq("ID_ORDEN_COMPRA"))
      .select(col("ID_ORDEN_COMPRA"), col("Id").as("ID_ORDEN_COMPRA_DETALLE"),
        col("Item.Id").as("ITEM_ID"), col("UnitQty").as("CANTIDAD"),
        col("UnitPrice").as("PRECIO_UNITARIO"))

  // ---- Goods receipts (/root/reference/dags/CotyData_IPN.py:2025-2055) ----

  val receiptSchema = StructType(Seq(
    StructField("Id", LongType), StructField("ReceiptNumber", StringType),
    StructField("IsDeleted", BooleanType),
    StructField("Audit", StructType(Seq(StructField("CreationDatetime", StringType)))),
    StructField("Store", StructType(Seq(StructField("Id", IntegerType)))),
    StructField("Supplier", StructType(Seq(StructField("Id", LongType)))),
    StructField("Details", ArrayType(StructType(Seq(
      StructField("PurchaseOrder",
        StructType(Seq(StructField("PurchaseOrderNumber", StringType)))),
      StructField("Item", StructType(Seq(StructField("Id", LongType)))),
      StructField("UnitQty", DoubleType)))))))

  /** Receipt details with parent supplier injected into each child (G5). */
  def receiptDetails(docs: DataFrame): DataFrame = {
    val parents = docs.select(
      col("Id").as("ID_RECEPCION"), col("ReceiptNumber").as("NUMERO_RECEPCION"),
      Dates.isoDatePrefix(col("Audit.CreationDatetime")).as("FECHA_RECEPCION"),
      col("Store.Id").as("CODIGO_SUCURSAL"),
      col("Supplier.Id").as("CODIGO_PROVEEDOR"), col("Details"))
    Normalize.explodeChild(parents, "Details",
        Seq("ID_RECEPCION", "NUMERO_RECEPCION", "FECHA_RECEPCION",
            "CODIGO_SUCURSAL", "CODIGO_PROVEEDOR"))
      .select(col("ID_RECEPCION"), col("NUMERO_RECEPCION"), col("FECHA_RECEPCION"),
        col("CODIGO_SUCURSAL"), col("CODIGO_PROVEEDOR"),
        col("PurchaseOrder.PurchaseOrderNumber").as("NUMERO_ORDEN_COMPRA"),
        col("Item.Id").as("ITEM_ID"), col("UnitQty").as("CANTIDAD_RECIBIDA"))
  }

  // ---- Sales orders (/root/reference/dags/CotyData_IPN.py:2314-2341) ----

  val salesOrderSchema = StructType(Seq(
    StructField("SalesOrderNumberChr", StringType), StructField("SalesOrderDate", StringType),
    StructField("StoreId", IntegerType), StructField("CompanyId", IntegerType),
    StructField("EmployeeName", StringType), StructField("SalesOrderTotalAmt", DoubleType),
    StructField("SalesOrderGuid", StringType),
    StructField("Items", ArrayType(StructType(Seq(
      StructField("UnitQty", DoubleType), StructField("ItemSubTotal", DoubleType),
      StructField("ItemId", LongType)))))))

  /** Sales-order items flatten (G6). */
  def salesOrderItems(docs: DataFrame): DataFrame =
    Normalize.explodeChild(
        docs.withColumnRenamed("SalesOrderNumberChr", "NUMERO_PEDIDO"),
        "Items", Seq("NUMERO_PEDIDO"))
      .select(col("NUMERO_PEDIDO"), col("ItemId").as("ITEM_ID"),
        col("UnitQty").as("CANTIDAD"), col("ItemSubTotal").as("SUBTOTAL"))

  // ---- Suppliers (/root/reference/dags/CotyData_IPN.py:1954-1968) ----

  val supplierSchema = StructType(Seq(
    StructField("Id", LongType), StructField("SupplierFiscalName", StringType),
    StructField("SupplierName", StringType), StructField("SupplierCode", StringType),
    StructField("Tax", StructType(Seq(
      StructField("IdentificationNumber", StringType),
      StructField("TaxCondition", StructType(Seq(StructField("Id", IntegerType))))))),
    StructField("SupplierCompany", StructType(Seq(StructField("Id", IntegerType)))),
    StructField("SupplierType", StructType(Seq(StructField("Id", IntegerType)))),
    StructField("SupplierSubType", StructType(Seq(StructField("Id", IntegerType))))))

  /** Supplier master; optional sub-type guarded (null-safe struct access). */
  def suppliers(docs: DataFrame): DataFrame =
    docs.select(
      col("Id").as("CODIGO_PROVEEDOR"),
      col("SupplierFiscalName").as("RAZON_SOCIAL_PROVEEDOR"),
      col("SupplierName").as("NOMBRE_FANTASIA_PROVEEDOR"),
      Cleaning.prefixUnlessContains(col("SupplierCode"), "CLI", "000")
        .as("CODIGO_PROVEEDOR_ERP"),
      col("Tax.IdentificationNumber").as("CUIT"),
      col("Tax.TaxCondition.Id").as("ID_CONDICION_IVA"),
      col("SupplierCompany.Id").as("ID_RAZON_SOCIAL"),
      col("SupplierType.Id").as("ID_TIPO_PROVEEDOR"),
      col("SupplierSubType.Id").as("ID_SUB_TIPO_PROVEEDOR"))

  // ---- Attribute values (G7, /root/reference/dags/CotyData_IPN.py:1486-1519) ----

  val attributeSchema = StructType(Seq(
    StructField("Id", LongType), StructField("Name", StringType),
    StructField("IsRequired", BooleanType), StructField("IsMandatory", BooleanType),
    StructField("AttributeCategory", StructType(Seq(StructField("Id", IntegerType)))),
    StructField("AttributeType", StructType(Seq(StructField("Id", IntegerType)))),
    StructField("Values", ArrayType(StructType(Seq(
      StructField("Id", LongType), StructField("Value", StringType)))))))

  /** Hardcoded excluded (attributeId, valueId) rows (F2 3-conjunct masks,
    * /root/reference/dags/CotyData_IPN.py:1511-1518).
    */
  val excludedValues: Seq[(Long, Long)] = Seq((8L, 218L), (9L, 320L), (10L, 321L))

  def attributeValues(docs: DataFrame): DataFrame = {
    val flat = Normalize.explodeChild(
        docs.select(col("Id").as("ID_ATRIBUTO"), col("Name").as("NOMBRE_ATRIBUTO"),
          col("AttributeCategory.Id").as("ID_CATEGORIA_ATRIBUTO"), col("Values")),
        "Values", Seq("ID_ATRIBUTO", "NOMBRE_ATRIBUTO", "ID_CATEGORIA_ATRIBUTO"))
      .withColumnsRenamed(Map("Id" -> "ID_VALOR", "Value" -> "VALOR"))
    val excluded: Column = excludedValues
      .map { case (a, v) => col("ID_ATRIBUTO") === a && col("ID_VALOR") === v }
      .reduce(_ || _)
    flat.filter(!excluded)
  }

  // ---- Price / cost logs (/root/reference/dags/CotyData_IPN.py:1738-1801) ----

  val priceLogSchema = StructType(Seq(
    StructField("Item", StructType(Seq(StructField("Id", LongType)))),
    StructField("NetValueNew", DoubleType),
    StructField("Audit", StructType(Seq(StructField("CreationDatetime", StringType))))))

  /** Price history: 'mixed' timestamp formats (:1748), 23-char render
    * (:1749), deterministic keep-first per item (:1750).
    */
  def priceHistory(docs: DataFrame, priceListId: Int): DataFrame = {
    val parsed = docs.select(
      col("Item.Id").as("ITEM_ID"),
      lit(priceListId).as("ID_PRECIOS_LISTA"),
      col("NetValueNew").as("PRECIO"),
      Dates.parseTimestampMulti(col("Audit.CreationDatetime"),
        Seq(Dates.IsoT, "yyyy-MM-dd HH:mm:ss", Dates.DmyHms)).as("ts"))
    Dedup.keepFirst(Seq("ITEM_ID", "ID_PRECIOS_LISTA"), Seq(col("ts"), col("PRECIO")))(parsed)
      .select(col("ITEM_ID"), col("ID_PRECIOS_LISTA"), col("PRECIO"),
        Dates.formatMs23(col("ts")).as("FECHA_PRECIO"))
  }
}
