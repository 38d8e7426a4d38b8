package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class PurchasingSpec extends SparkTestBase with FixtureLoader {

  test("purchase orders: dd/MM/yyyy parse, PRESCRITA flag, default type (G4)") {
    val docs = fixture("purchase_order.json", Purchasing.poSchema)
    val hdr = Purchasing.purchaseOrderHeaders(docs).orderBy("ID_ORDEN_COMPRA").collect()
    assert(hdr(0).getAs[java.sql.Date]("FECHA_CREACION").toString == "2025-03-05")
    assert(hdr(0).getAs[Int]("PRESCRITA") == 1)   // status 13
    assert(hdr(0).getAs[Int]("ID_TIPO_ORDEN_COMPRA") == 2)
    assert(hdr(1).getAs[Int]("PRESCRITA") == 0)
    assert(hdr(1).getAs[Int]("ID_TIPO_ORDEN_COMPRA") == 7) // absent -> default
    val det = Purchasing.purchaseOrderDetails(docs)
    assert(det.count() == 3)
    assert(det.filter(col("ID_ORDEN_COMPRA") === 4001)
      .agg(sum("CANTIDAD")).head().getDouble(0) == 150.0)
  }

  test("goods receipts: parent supplier injected into each detail (G5)") {
    val docs = fixture("goods_receipt.json", Purchasing.receiptSchema)
    val det = Purchasing.receiptDetails(docs).orderBy("ITEM_ID").collect()
    assert(det.length == 2)
    assert(det.forall(_.getAs[Long]("CODIGO_PROVEEDOR") == 401L))
    assert(det(0).getAs[String]("NUMERO_ORDEN_COMPRA") == "OC-2025-001")
    assert(det(0).getAs[java.sql.Date]("FECHA_RECEPCION").toString == "2025-03-07")
  }

  test("sales orders: items flatten with order number (G6)") {
    val docs = fixture("sales_order.json", Purchasing.salesOrderSchema)
    val items = Purchasing.salesOrderItems(docs).orderBy("ITEM_ID").collect()
    assert(items.length == 2)
    assert(items.forall(_.getAs[String]("NUMERO_PEDIDO") == "PED-100"))
    assert(items(1).getAs[Double]("SUBTOTAL") == 600.0)
  }

  test("suppliers: CLI-guard prefix and optional sub-type") {
    val docs = fixture("supplier.json", Purchasing.supplierSchema)
    val out = Purchasing.suppliers(docs).orderBy("CODIGO_PROVEEDOR").collect()
    assert(out(0).getAs[String]("CODIGO_PROVEEDOR_ERP") == "00042")
    assert(out(0).getAs[Int]("ID_SUB_TIPO_PROVEEDOR") == 9)
    assert(out(1).getAs[String]("CODIGO_PROVEEDOR_ERP") == "CLI77") // contains CLI
    assert(out(1).isNullAt(out(1).fieldIndex("ID_SUB_TIPO_PROVEEDOR")))
  }

  test("attribute values: flatten + hardcoded exclusions (G7/F2)") {
    val docs = fixture("attribute.json", Purchasing.attributeSchema)
    val vals = Purchasing.attributeValues(docs).orderBy("ID_VALOR")
      .select("ID_VALOR").collect().map(_.getLong(0)).toSeq
    assert(vals == Seq(217L, 319L, 322L)) // 218/320/321 excluded
  }

  test("expenses: two-level concat-key dim lookup, null on unmatched keys") {
    import spark.implicits._
    val expenses = Seq(
      ("2025-01-05", "luz enero", "Servicios", "Electricidad", 120.5),
      ("2025-01-06", "gas enero", "Servicios", "Gas", 80.0),
      ("2025-01-07", "misc", "Inexistente", "Nada", 5.0) // unmatched type
    ).toDF("FECHA", "DESCRIPCION_GASTO", "TIPO", "SUB_TIPO", "IMPORTE")
    val tipos = Seq(("Servicios", 3), ("Impuestos", 4))
      .toDF("TIPO_GASTO_DESCRIPCION", "ID_TIPO_GASTO")
    val subTipos = Seq(("Electricidad-3", 31), ("Gas-3", 32))
      .toDF("SUB_TIPO_KEY", "ID_SUB_TIPO_GASTO")
    val out = Expenses.transform(expenses, tipos, subTipos)
      .orderBy("FECHA").collect()
    assert(out(0).getAs[Int]("ID_TIPO_GASTO") == 3 &&
           out(0).getAs[Int]("ID_SUB_TIPO_GASTO") == 31)
    assert(out(1).getAs[Int]("ID_SUB_TIPO_GASTO") == 32)
    assert(out(2).isNullAt(out(2).fieldIndex("ID_TIPO_GASTO")))
    assert(out(2).isNullAt(out(2).fieldIndex("ID_SUB_TIPO_GASTO")))
  }

  test("price history: mixed formats parsed, keep-first per item, 23-char render") {
    val docs = fixture("price_log.json", Purchasing.priceLogSchema)
    val hist = Purchasing.priceHistory(docs, priceListId = 4).orderBy("ITEM_ID").collect()
    assert(hist.length == 2) // 7001 deduped to earliest
    assert(hist(0).getAs[Double]("PRECIO") == 110.0)
    assert(hist(0).getAs[String]("FECHA_PRECIO") == "2025-01-05 09:00:00.000")
    assert(hist(1).getAs[String]("FECHA_PRECIO") == "2025-02-05 11:00:00.000")
  }
}
