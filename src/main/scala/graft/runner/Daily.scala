package graft.runner

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ChangeAction, DateWindow, LoadResult}
import graft.pipelines.Sales
import graft.sinks.Sinks

/** Daily incremental run: the engine's restatement of `dag_subir_maestros`
  * (/root/reference/dags/dag_maestros.py).
  *
  * The reference is a strictly linear Airflow chain of 9 tasks on a
  * SequentialExecutor with a weekday-aware (date_from, date_to) window and
  * per-action passes (created/modified/deleted/undeleted,
  * /root/reference/dags/CotyData_IPN.py:596-603). Here:
  *  - the window computation is the same driver-side rule (DateWindow.daily)
  *  - each entity load = REST source (window + action as request params)
  *    -> from_json -> pipeline transforms -> staged-sync sink -> audit row
  *  - entity-level sequencing respects the reference's dependency order,
  *    but each load is internally parallel (partitioned source, Spark
  *    shuffles) instead of single-threaded pandas.
  */
object Daily {

  final case class EntityRun(entity: String, action: String, result: LoadResult)

  /** One sales-documents load for one (window, action, company). */
  def runSales(spark: SparkSession, fetcherName: String, outDir: String,
               window: DateWindow, action: ChangeAction, company: Int): Seq[EntityRun] = {
    val raw = spark.read.format("graft.sources.rest.RestTableProvider")
      .option("fetcher", fetcherName)
      .option("totalPages", 64).option("pagesPerPartition", 8)
      // API-side predicates (F8): dd/MM/yyyy wire dates like the reference
      // (/root/reference/dags/API_IPN.py:99-102)
      .option("param.date_from", fmt(window.from))
      .option("param.date_to", fmt(window.to))
      .option("param.action", action.param)
      .option("param.company_id", company.toString)
      .load()
    val docs = raw.select(from_json(col("value"), Sales.docSchema).as("d"))
      .select(col("d.*")).cache()

    def load(name: String, df: DataFrame, keys: Seq[String]): EntityRun = {
      val res = Sinks.stagedSync(spark, df, s"$outDir/staging/$name", s"$outDir/$name", keys)
      Sinks.audit(spark, s"$outDir/CotyDataLogs",
        Sinks.auditFor(res, res.rows, s"Daily/$company/${action.param}",
          java.sql.Timestamp.valueOf(window.to.atStartOfDay())))
      EntityRun(name, action.param, res)
    }

    val out = Seq(
      load("VENTAS", Sales.transformHeader(docs), Seq("ID_VENTA")),
      load("VENTAS_DETALLE", Sales.transformDetails(docs), Seq("ID_VENTA_DETALLE")),
      load("VENTAS_METODO_PAGO", Sales.transformPayments(docs), Seq("ID_VENTA_METODO_PAGO")))
    docs.unpersist()
    out
  }

  /** Full daily pass: per-action x per-company fan-out over one window,
    * mirroring createSalesDocumentsLoad's company loop
    * (/root/reference/dags/CotyData_IPN.py:286) and the action loop
    * (:2228-2235).
    */
  def run(spark: SparkSession, fetcherName: String, outDir: String,
          runDate: LocalDate, companies: Seq[Int] = Seq(1, 2),
          actions: Seq[ChangeAction] = Seq(ChangeAction.Created, ChangeAction.Modified))
      : Seq[EntityRun] = {
    val window = DateWindow.daily(runDate)
    for {
      action <- actions
      company <- companies
      r <- runSales(spark, fetcherName, outDir, window, action, company)
    } yield r
  }

  private def fmt(d: LocalDate): String =
    d.format(java.time.format.DateTimeFormatter.ofPattern("dd/MM/yyyy"))
}
