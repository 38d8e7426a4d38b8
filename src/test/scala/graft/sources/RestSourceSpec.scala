package graft.sources.rest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase
import graft.pipelines.Sales

object TestFetchers {
  /** 10 pages x 5 deterministic rows. */
  val pages: PageFetcher = (page: Int, pageSize: Int, _: Map[String, String]) =>
    if (page >= 10) Seq.empty
    else (0 until 5).map(i => s"""{"n": ${page * 5 + i}}""")

  /** Ends early at page 3 regardless of declared totalPages. */
  val short: PageFetcher = (page: Int, _: Int, _: Map[String, String]) =>
    if (page >= 3) Seq.empty else (0 until 4).map(i => s"""{"n": $i}""")

  /** Echoes a request param into every record (API-side predicate F8). */
  val params: PageFetcher = (page: Int, _: Int, p: Map[String, String]) =>
    if (page >= 1) Seq.empty
    else Seq(s"""{"from": "${p.getOrElse("date_from", "?")}"}""")

  /** Sales documents over the wire, one per page. */
  val sales: PageFetcher = (page: Int, _: Int, _: Map[String, String]) =>
    if (page >= 2) Seq.empty
    else Seq(
      s"""{"SaleID": ${200 + page}, "InvoiceNumberChr": "0001-0000020$page",
          "InvoiceType": ${if (page == 0) 3 else 8}, "CompanyID": 1, "StoreID": 9,
          "InvoiceDate": "2025-04-0${page + 1}T10:00:00", "Neto": 100.0,
          "DiscountAmt": 0.0, "GeneralDiscountAmt": 0.0, "NetoFinal": 100.0,
          "IVAAmt": 21.0, "RechargeAmt": 0.0, "InvoiceTotal": 121.0,
          "CustomerCode": "C1", "SalesOrderNumber": "S1",
          "Items": [{"DetailID": ${300 + page}, "SaleID": ${200 + page},
                     "ItemID": 1, "UnitPrice": 100.0, "UnitQty": 1.0,
                     "UnitDiscount": 0.0, "UnitSubTotal": 100.0, "UnitCost": 70.0}],
          "Payments": []}""".replaceAll("\n\\s*", " "))

  def registerAll(): Unit = {
    FetcherRegistry.register("test-pages", pages)
    FetcherRegistry.register("test-short", short)
    FetcherRegistry.register("test-params", params)
    FetcherRegistry.register("test-sales", sales)
  }
}

class RestSourceSpec extends SparkTestBase {
  TestFetchers.registerAll()
  private val fmt = "graft.sources.rest.RestTableProvider"

  test("reads all pages in parallel partitions") {
    val df = spark.read.format(fmt)
      .option("fetcher", "test-pages")
      .option("totalPages", 10).option("pagesPerPartition", 3)
      .load()
    assert(df.rdd.getNumPartitions == 4) // ceil(10/3)
    assert(df.count() == 50)
    assert(df.select(countDistinct("page")).head().getLong(0) == 10)
    val sumN = df.select(sum(get_json_object(col("value"), "$.n").cast("long")))
      .head().getLong(0)
    assert(sumN == (0 until 50).sum)
  }

  test("empty page terminates a partition early (NoRecordsException analog)") {
    val df = spark.read.format(fmt)
      .option("fetcher", "test-short")
      .option("totalPages", 10).option("pagesPerPartition", 10)
      .load()
    assert(df.count() == 12) // 3 pages x 4 rows
  }

  test("page-range predicates push into partition planning") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    FetcherRegistry.register("test-counting",
      (page: Int, _: Int, _: Map[String, String]) => {
        counter.incrementAndGet()
        if (page >= 10) Seq.empty else Seq(s"""{"n": $page}""")
      })
    val df = spark.read.format(fmt)
      .option("fetcher", "test-counting")
      .option("totalPages", 10).option("pagesPerPartition", 1)
      .load()
    counter.set(0)
    val filtered = df.filter(col("page") >= 3 && col("page") < 6)
    assert(filtered.count() == 3)
    assert(counter.get() == 3, s"expected only pages 3..5 fetched, got ${counter.get()}")
    assert(filtered.rdd.getNumPartitions == 3)
  }

  test("param.* options reach the fetcher (API-side predicates)") {
    val df = spark.read.format(fmt)
      .option("fetcher", "test-params")
      .option("totalPages", 1)
      .option("param.date_from", "01/03/2025")
      .load()
    val v = df.select(get_json_object(col("value"), "$.from")).head().getString(0)
    assert(v == "01/03/2025")
  }

  test("end-to-end: REST source -> from_json -> sales pipeline") {
    val raw = spark.read.format(fmt)
      .option("fetcher", "test-sales").option("totalPages", 2)
      .option("pagesPerPartition", 1).load()
    val docs = raw.select(from_json(col("value"), Sales.docSchema).as("doc"))
      .select(col("doc.*"))
    val hdr = Sales.transformHeader(docs).orderBy("ID_VENTA").collect()
    assert(hdr.length == 2)
    assert(hdr(0).getAs[Double]("NETO") == 100.0)
    assert(hdr(1).getAs[Double]("NETO") == -100.0) // type 8 credit flip
    val det = Sales.transformDetails(docs)
    assert(det.count() == 2)
  }
}
