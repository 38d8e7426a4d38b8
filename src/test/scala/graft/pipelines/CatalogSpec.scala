package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CatalogSpec extends SparkTestBase {
  import spark.implicits._

  private def read(json: Seq[String], schema: org.apache.spark.sql.types.StructType) =
    spark.read.schema(schema).json(json.toDS())

  test("families/categories/trademarks rename to warehouse columns") {
    val docs = read(Seq("""{"Id": 3, "Description": "Perfumeria"}"""), Catalog.familySchema)
    assert(Catalog.families(docs).columns.toSeq ==
      Seq("CODIGO_FAMILIA", "DESCRIPCION_FAMILIA"))
    assert(Catalog.categories(docs).head().getString(1) == "Perfumeria")
    assert(Catalog.trademarks(docs).head().getInt(0) == 3)
  }

  test("employees: active flag + store code") {
    val docs = read(Seq(
      """{"Id": 11, "Name": "J Perez", "IsDeleted": false, "Store": {"Id": 12}}""",
      """{"Id": 12, "Name": "M Diaz", "IsDeleted": true, "Store": {"Id": 15}}"""),
      Catalog.employeeSchema)
    val out = Catalog.employees(docs).orderBy("ID_EMPLEADO").collect()
    assert(out(0).getAs[Int]("EMPLEADO_ACTIVO") == 1)
    assert(out(1).getAs[Int]("EMPLEADO_ACTIVO") == 0)
    assert(out(1).getAs[Int]("CODIGO_SUCURSAL") == 15)
  }

  test("B2C orders: header + items split (reference caller crashes here)") {
    val docs = read(Seq(
      """{"OrderId": 900, "OrderDate": "2025-04-01T18:30:00", "CustomerEmail": "a@b.c",
         "TotalAmt": 350.0, "Items": [{"Sku": "SKU-1", "Qty": 2.0, "Price": 100.0},
         {"Sku": "SKU-2", "Qty": 1.0, "Price": 150.0}]}""".replaceAll("\n\\s*", " ")),
      Catalog.b2cSchema)
    val hdr = Catalog.b2cHeaders(docs).head()
    assert(hdr.getAs[java.sql.Date]("FECHA_PEDIDO").toString == "2025-04-01")
    assert(Catalog.b2cItems(docs).count() == 2)
  }

  test("inventory: latest snapshot per (item, store)") {
    val docs = read(Seq(
      """{"ItemId": 7001, "StoreId": 12, "Stock": 5.0, "AsOf": "2025-03-01 10:00:00"}""",
      """{"ItemId": 7001, "StoreId": 12, "Stock": 3.0, "AsOf": "2025-03-02 10:00:00"}""",
      """{"ItemId": 7001, "StoreId": 15, "Stock": 9.0, "AsOf": "2025-03-01 10:00:00"}"""),
      Catalog.inventorySchema)
    val out = Catalog.inventory(docs).orderBy("CODIGO_SUCURSAL").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("STOCK") == 3.0) // latest wins
  }

  test("delivery notes V3: supplier-return filter, cancel flag, SKU group-sum") {
    val docs = read(Seq(
      """{"Id": 1, "DeliveryNoteNumber": "R-1", "DeliveryNoteDate": "2025-02-01T09:00:00",
         "Audit": {"CreationUsername": "u1", "CreationDatetime": "2025-02-01T09:00:00",
         "DeletionDatetime": null}, "Origin": {"Name": "Central"},
         "Destination": {"Name": "Norte"}, "DeliveryNoteCategory": {"Id": 4, "Name": "Traslado"},
         "SalesOrder": {"SalesOrderNumberChr": "SO-1"},
         "Details": [{"Item": {"Id": 7001, "Code": "SKU-1"}, "UnitQty": 2.0},
                     {"Item": {"Id": 7001, "Code": "SKU-1"}, "UnitQty": 3.0}]}""",
      """{"Id": 2, "DeliveryNoteNumber": "R-2", "DeliveryNoteDate": "2025-02-02T09:00:00",
         "Audit": {"CreationUsername": "u2", "CreationDatetime": "2025-02-02T09:00:00",
         "DeletionDatetime": "2025-02-03T08:00:00"}, "Origin": {"Name": "Norte"},
         "Destination": {"Name": "Central"},
         "DeliveryNoteCategory": {"Id": 9, "Name": "Devolución a proveedor"},
         "SalesOrder": null, "Details": [{"Item": {"Id": 7002, "Code": "SKU-2"}, "UnitQty": 1.0}]}""")
      .map(_.replaceAll("\n\\s*", " ")), Catalog.dnV3Schema)
    val hdr = Catalog.dnV3Headers(docs).collect()
    assert(hdr.length == 1, "supplier returns must be filtered")
    assert(hdr(0).getAs[Int]("REMITO_ANULADO") == 0)
    assert(hdr(0).getAs[String]("SUCURSAL_ORIGEN") == "Central")
    val det = Catalog.dnV3Details(docs).collect()
    assert(det.length == 1)
    assert(det(0).getAs[Double]("CANTIDAD_REMITIDA") == 5.0) // 2+3 summed
  }

  test("cost history: keep-first per item on parsed modification time") {
    val docs = read(Seq(
      """{"Item": {"Id": 7001}, "PriceCostValueNew": 60.0,
         "Audit": {"ModificationDatetime": "2025-01-05T09:00:00"}}""",
      """{"Item": {"Id": 7001}, "PriceCostValueNew": 65.0,
         "Audit": {"ModificationDatetime": "2025-02-05 10:30:00"}}""")
      .map(_.replaceAll("\n\\s*", " ")), Catalog.costLogSchema)
    val out = Catalog.costHistory(docs).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("COSTO") == 60.0)
    assert(out(0).getAs[String]("FECHA_COSTO") == "2025-01-05 09:00:00.000")
  }
}
