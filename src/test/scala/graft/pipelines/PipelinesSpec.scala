package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

trait FixtureLoader { self: SparkTestBase =>
  def fixture(name: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(getClass.getResource(s"/fixtures/$name").getPath)
}

class SalesPipelineSpec extends SparkTestBase with FixtureLoader {
  private lazy val docs = fixture("sales_document.json", Sales.docSchema).cache()

  test("transformHeader: split, parse, fiscal profit, credit flip, ''->null") {
    val hdr = Sales.transformHeader(docs).orderBy("ID_VENTA").collect()
    assert(hdr.length == 3)
    val h101 = hdr(0)
    assert(h101.getAs[Int]("CODIGO_PUNTO_VENTA") == 1)
    assert(h101.getAs[String]("NUMERO_COMPROBANTE") == "00001234")
    assert(math.abs(h101.getAs[Double]("UTILIDAD_FISCAL") - 950.0 / 1.21 * 0.21) < 1e-9)
    assert(h101.getAs[java.sql.Timestamp]("FECHA_COMPROBANTE").toString
      .startsWith("2025-03-10 14:30:00"))
    val h102 = hdr(1) // credit note type 8: amounts flipped, '' -> null
    assert(h102.getAs[Double]("NETO") == -200.0)
    assert(h102.getAs[Double]("TOTAL_COMPROBANTE") == -242.0)
    assert(h102.getAs[String]("ID_CLIENTE") == null)
    val h103 = hdr(2) // dd/MM/yyyy fallback format + absent SalesOrderNumber
    assert(h103.getAs[java.sql.Timestamp]("FECHA_COMPROBANTE").toString
      .startsWith("2025-03-11 10:15:00"))
    assert(h103.getAs[String]("NUMERO_PEDIDO") == null)
    assert(h103.getAs[Double]("UTILIDAD_FISCAL") == 0.0)
  }

  test("transformDetails: derived cost/profit, credit rows flipped") {
    val det = Sales.transformDetails(docs).orderBy("ID_VENTA_DETALLE").collect()
    assert(det.length == 4)
    val d1 = det(0)
    assert(d1.getAs[Double]("COSTO_NETO") == 300.0)        // 60 * 5
    assert(d1.getAs[Double]("UTILIDAD_TOTAL_NETA") == 200.0) // 500 - 300
    val d3 = det(2) // credit note
    assert(d3.getAs[Double]("CANTIDAD_VENTA") == -2.0)
    assert(d3.getAs[Double]("SUBTOTAL_NETO") == -200.0)
    assert(d3.getAs[Double]("COSTO_NETO") == -120.0)
    assert(d3.getAs[Double]("UTILIDAD_TOTAL_NETA") == -80.0)
  }

  test("transformPayments: CCAuthCode conform, PaymentID dedup, credit flip") {
    val pay = Sales.transformPayments(docs).orderBy("ID_VENTA_METODO_PAGO").collect()
    assert(pay.length == 3, "duplicate PaymentID 502 must dedup")
    val p502 = pay(1)
    assert(p502.getAs[Double]("IMPORTE_PAGO") == -242.0)
    assert(p502.getAs[String]("CODIGO_AUTORIZACION") == null)
    val p503 = pay(2)
    assert(p503.getAs[String]("CODIGO_AUTORIZACION") == null) // absent in wire doc
    assert(p503.getAs[Int]("CANTIDAD_CUOTAS") == 3)
  }
}

class CustomersPipelineSpec extends SparkTestBase with FixtureLoader {
  private lazy val docs = fixture("customer_v3.json", Customers.docSchema)

  test("transform: struct paths, positional zip, fiscal-address concat, ''->null") {
    val out = Customers.transform(docs, razonSocial = 1).orderBy("NUMERO_CLIENTE").collect()
    assert(out.length == 3)
    val c1 = out(0)
    assert(c1.getAs[String]("CUIT") == "20-12345678-9")
    assert(c1.getAs[Int]("ID_PRECIOS_LISTA") == 4)
    assert(c1.getAs[String]("CODIGO_POSTAL") == "1706") // Addresses[1] quirk
    assert(c1.getAs[String]("LOCALIDAD") == "Buenos Aires; CABA")
    assert(c1.getAs[String]("GRUPO") == "Mayorista")
    assert(c1.getAs[java.sql.Date]("FECHA_ALTA").toString == "2024-06-01")
    val c2 = out(1) // fiscal address has null City -> State only; '' group -> null
    assert(c2.getAs[String]("LOCALIDAD") == "Cordoba")
    assert(c2.getAs[String]("GRUPO") == null)
    val c3 = out(2) // null Addresses / CustomAttribute
    assert(c3.getAs[String]("CODIGO_POSTAL") == null)
    assert(c3.getAs[String]("LOCALIDAD") == null)
    assert(c3.getAs[Int]("ID_RAZON_SOCIAL") == 1)
  }
}

class ItemsPipelineSpec extends SparkTestBase with FixtureLoader {
  private lazy val docs = fixture("item.json", Items.docSchema).cache()

  test("master derives enabled/combo/permission flags") {
    val m = Items.master(docs).orderBy("ITEM_ID").collect()
    assert(m.map(_.getAs[Int]("ARTICULO_HABILITADO")).toSeq == Seq(1, 1, 0))
    assert(m.map(_.getAs[Int]("ES_COMBO")).toSeq == Seq(0, 1, 0))
    assert(m(1).getAs[Int]("PERMITE_COMPRA") == 0)
  }

  test("child tables explode to the expected rows") {
    assert(Items.barcodes(docs).count() == 3)
    assert(Items.suppliers(docs).count() == 3)
    val attrs = Items.attributeValues(docs).orderBy("ID_VALOR_ATRIBUTO")
      .select("ID_VALOR_ATRIBUTO").collect().map(_.getLong(0)).toSeq
    assert(attrs == Seq(218L, 320L, 321L, 500L))
    val combos = Items.comboDetails(docs).orderBy("COMPONENTE_ID").collect()
    assert(combos.map(r => (r.getAs[Long]("ITEM_ID"), r.getAs[Long]("COMPONENTE_ID"))).toSeq
      == Seq((7002L, 7001L), (7002L, 7003L)))
  }

  test("enabledFlags: deletion after undeletion disables the SKU") {
    val flags = Items.enabledFlags(docs).orderBy("SKU").collect()
      .map(r => (r.getString(0), r.getAs[Int]("ARTICULO_HABILITADO"))).toSeq
    assert(flags == Seq(("SKU-7001", 1), ("SKU-7002", 1), ("SKU-7003", 0)))
  }
}

class DeliveryNotesPipelineSpec extends SparkTestBase with FixtureLoader {
  private lazy val docs = fixture("delivery_note_v2.json", DeliveryNotes.docSchema).cache()

  test("header: 0->7 category recode, ''->null") {
    val h = DeliveryNotes.transformHeader(docs).orderBy("REFER_ID").collect()
    assert(h(0).getAs[Int]("ID_CATEGORIA_REMITO") == 7)
    assert(h(0).getAs[String]("NUMERO_PEDIDO") == null)
    assert(h(1).getAs[Int]("ID_CATEGORIA_REMITO") == 4)
    assert(h(1).getAs[String]("USUARIO_CREACION") == null)
  }

  test("details: group-sum per (REFER_ID, ITEM_ID)") {
    val d = DeliveryNotes.transformDetails(docs).orderBy("REFER_ID", "ITEM_ID")
      .collect().map(r => (r.getAs[Long]("REFER_ID"), r.getAs[Long]("ITEM_ID"),
                           r.getAs[Double]("CANTIDAD_REMITIDA"))).toSeq
    assert(d == Seq((3001L, 7001L, 5.0), (3001L, 7002L, 1.0), (3002L, 7003L, 10.0)))
  }
}
