package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Cleaning, Conform, Dedup, Dates, Normalize}

/** Sales-documents pipeline: nested sales doc -> VENTAS header rows +
  * CARGA_VENTAS_DETALLE detail rows + payment rows
  * (/root/reference/dags/CotyData_IPN.py:83-168 transforms, :251-275 split,
  * :278-316 orchestration).
  *
  * All three outputs come from ONE parsed scan of the document DataFrame
  * (cache upstream if materializing all three) — the reference re-walks
  * Python dict lists per output; here each output is a narrow projection/
  * explode that fuses into the scan.
  */
object Sales {

  /** Credit-note InvoiceType set (/root/reference/dags/CotyData_IPN.py:73-75). */
  val creditTypes: Seq[Int] = Seq(8, 10, 11, 12, 17, 20, 27, 28, 29, 37, 38, 39, 43, 44, 45, 47)

  val itemSchema = StructType(Seq(
    StructField("DetailID", LongType), StructField("SaleID", LongType),
    StructField("ItemID", LongType), StructField("UnitPrice", DoubleType),
    StructField("UnitQty", DoubleType), StructField("UnitDiscount", DoubleType),
    StructField("UnitSubTotal", DoubleType), StructField("UnitCost", DoubleType)))

  val paymentSchema = StructType(Seq(
    StructField("PaymentID", LongType), StructField("PaymentMethodID", IntegerType),
    StructField("SaleID", LongType), StructField("PaymentAmt", DoubleType),
    StructField("PaymentsQty", IntegerType), StructField("RechargeAmt", DoubleType),
    StructField("CCAuthCode", StringType), StructField("MP_PaymentID", StringType),
    StructField("MP_ExternalReference", StringType)))

  /** Wire schema of one sales document (FIXTURES.md §1.1). */
  val docSchema = StructType(Seq(
    StructField("SaleID", LongType), StructField("InvoiceNumberChr", StringType),
    StructField("InvoiceType", IntegerType), StructField("CompanyID", IntegerType),
    StructField("StoreID", IntegerType), StructField("InvoiceDate", StringType),
    StructField("Neto", DoubleType), StructField("DiscountAmt", DoubleType),
    StructField("GeneralDiscountAmt", DoubleType), StructField("NetoFinal", DoubleType),
    StructField("IVAAmt", DoubleType), StructField("RechargeAmt", DoubleType),
    StructField("InvoiceTotal", DoubleType), StructField("CustomerCode", StringType),
    StructField("SalesOrderNumber", StringType),
    StructField("Items", ArrayType(itemSchema)),
    StructField("Payments", ArrayType(paymentSchema))))

  private val headerMoneyCols =
    Seq("NETO", "DESCUENTO", "DESCUENTO_GENERAL", "NETO_FINAL", "IVA", "RECARGO",
        "TOTAL_COMPROBANTE", "UTILIDAD_FISCAL")

  /** Header transform (/root/reference/dags/CotyData_IPN.py:83-118):
    * reindex -> ''->null -> invoice split -> casts -> ISO parse ->
    * UTILIDAD_FISCAL -> credit-note sign flip -> warehouse renames.
    */
  def transformHeader(docs: DataFrame): DataFrame = {
    val hdr = Normalize.headers(docs, Seq("Items", "Payments"))
    val conformed = Conform.conformTo(StructType(docSchema.fields.filterNot(f =>
      f.name == "Items" || f.name == "Payments")))(hdr)
    val cleaned = Cleaning.nullifyEmpty(Seq("CustomerCode", "SalesOrderNumber"))(conformed)
    val split = Cleaning.splitInto("InvoiceNumberChr", "-",
      Seq("CODIGO_PUNTO_VENTA", "NUMERO_COMPROBANTE"))(cleaned)
    val typed = split
      .withColumn("CODIGO_PUNTO_VENTA", col("CODIGO_PUNTO_VENTA").cast("int"))
      .withColumn("FECHA_COMPROBANTE",
        Dates.parseTimestampMulti(col("InvoiceDate"), Seq(Dates.IsoT, Dates.DmyHms)))
      // fiscal-profit derivation for invoice types 3 and 8
      // (/root/reference/dags/CotyData_IPN.py:107-108)
      .withColumn("UTILIDAD_FISCAL",
        when(col("InvoiceType").isin(3, 8), col("NetoFinal") / 1.21 * 0.21).otherwise(0.0))
      .withColumnsRenamed(Map(
        "SaleID" -> "ID_VENTA", "InvoiceType" -> "TIPO_COMPROBANTE",
        "CompanyID" -> "ID_RAZON_SOCIAL", "StoreID" -> "CODIGO_SUCURSAL",
        "Neto" -> "NETO", "DiscountAmt" -> "DESCUENTO",
        "GeneralDiscountAmt" -> "DESCUENTO_GENERAL", "NetoFinal" -> "NETO_FINAL",
        "IVAAmt" -> "IVA", "RechargeAmt" -> "RECARGO",
        "InvoiceTotal" -> "TOTAL_COMPROBANTE", "CustomerCode" -> "ID_CLIENTE",
        "SalesOrderNumber" -> "NUMERO_PEDIDO"))
      .drop("InvoiceNumberChr", "InvoiceDate")
    Cleaning.signFlip(headerMoneyCols, col("TIPO_COMPROBANTE").isin(creditTypes: _*))(typed)
  }

  /** Detail transform (/root/reference/dags/CotyData_IPN.py:119-141):
    * explode Items with parent keys, derive COSTO_NETO / UTILIDAD, flip
    * credit-note rows.
    */
  def transformDetails(docs: DataFrame): DataFrame = {
    val det = Normalize.explodeChild(docs, "Items", Seq("InvoiceType"))
    val derived = det
      .withColumn("COSTO_NETO", col("UnitCost") * col("UnitQty"))
      .withColumn("UTILIDAD_TOTAL_NETA", round(col("UnitSubTotal") - col("COSTO_NETO"), 4))
      .withColumnsRenamed(Map(
        "DetailID" -> "ID_VENTA_DETALLE", "SaleID" -> "ID_VENTA", "ItemID" -> "ITEM_ID",
        "UnitPrice" -> "PRECIO_VENTA", "UnitQty" -> "CANTIDAD_VENTA",
        "UnitDiscount" -> "DESCUENTO_VENTA", "UnitSubTotal" -> "SUBTOTAL_NETO"))
    Cleaning.signFlip(
      Seq("CANTIDAD_VENTA", "SUBTOTAL_NETO", "COSTO_NETO", "UTILIDAD_TOTAL_NETA"),
      col("InvoiceType").isin(creditTypes: _*))(derived)
      .drop("InvoiceType")
  }

  /** Payments transform (/root/reference/dags/CotyData_IPN.py:142-168):
    * explode Payments, conform (CCAuthCode may be absent — the KeyError
    * guard at :144-149), dedup by PaymentID keep-first, flip credit rows.
    */
  def transformPayments(docs: DataFrame): DataFrame = {
    val pay = Normalize.explodeChild(docs, "Payments", Seq("InvoiceType"))
    val conformed = Conform.conformTo(StructType(
      StructField("InvoiceType", IntegerType) +: paymentSchema.fields))(pay)
    val renamed = conformed.withColumnsRenamed(Map(
      "PaymentID" -> "ID_VENTA_METODO_PAGO", "PaymentMethodID" -> "ID_METODO_PAGO",
      "SaleID" -> "ID_VENTA", "PaymentAmt" -> "IMPORTE_PAGO",
      "PaymentsQty" -> "CANTIDAD_CUOTAS", "RechargeAmt" -> "RECARGO_PAGO",
      "CCAuthCode" -> "CODIGO_AUTORIZACION"))
    val flipped = Cleaning.signFlip(Seq("IMPORTE_PAGO"),
      col("InvoiceType").isin(creditTypes: _*))(renamed).drop("InvoiceType")
    Dedup.keepFirst(Seq("ID_VENTA_METODO_PAGO"),
      Seq(col("ID_VENTA"), col("IMPORTE_PAGO")))(flipped)
  }
}
