package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.core.Retry

/** JDBC source/sink wrappers (S4/S5 scans, K1-K4 loads).
  *
  * The reference talks to SQL Server/MySQL through SQLAlchemy with
  * hand-chunked multi-row inserts sized to the 2100-bind-parameter limit
  * (/root/reference/dags/Conectores_BD.py:105-113, dags/utils.py:40-46) and
  * wraps loads in staging-proc / sync-proc EXEC calls
  * (/root/reference/dags/CotyData_IPN.py:207-214). Spark's JDBC writer
  * batches prepared statements natively, so only the statement hooks and
  * option plumbing remain engine code. No database ships in this
  * environment; the option-building is unit-testable, the transport is not.
  */
object Jdbc {

  final case class JdbcConfig(url: String, user: String, password: String,
                              driver: Option[String] = None)

  /** S4: query-pushdown scan — the WHERE/join stays on the database side
    * exactly like the reference's query strings (F7/J5).
    */
  def readQuery(spark: SparkSession, cfg: JdbcConfig, query: String,
                fetchSize: Int = 10000): DataFrame =
    baseOptions(spark.read.format("jdbc"), cfg)
      .option("query", query)
      .option("fetchsize", fetchSize)
      .load()

  /** S5: small-dimension scan; caller wraps in broadcast() at the join. */
  def readTable(spark: SparkSession, cfg: JdbcConfig, table: String): DataFrame =
    baseOptions(spark.read.format("jdbc"), cfg).option("dbtable", table).load()

  /** K1: chunked append. `batchSize` mirrors ⌊2100/ncols⌋ capped at 1000
    * (/root/reference/dags/utils.py:40-46) — correct for SQL Server targets.
    */
  def batchSizeFor(nCols: Int, paramLimit: Int = 2100, cap: Int = 1000): Int =
    math.max(1, math.min(cap, paramLimit / math.max(1, nCols)))

  def writeAppend(df: DataFrame, cfg: JdbcConfig, table: String,
                  numWriters: Int = 8): Unit =
    baseOptions(df.coalesce(numWriters).write.format("jdbc"), cfg)
      .option("dbtable", table)
      .option("batchsize", batchSizeFor(df.columns.length))
      .mode(SaveMode.Append)
      .save()

  /** K2: staged sync — run `preSql` (truncate staging), append, run
    * `postSql` (merge proc) once from the driver, with the reference's
    * retry/backoff policy (/root/reference/dags/CotyData_IPN.py:178-183).
    */
  def stagedSyncLoad(df: DataFrame, cfg: JdbcConfig, stagingTable: String,
                     preSql: Seq[String], postSql: Seq[String]): Unit =
    Retry.withBackoff() {
      runStatements(cfg, preSql)
      writeAppend(df, cfg, stagingTable)
      runStatements(cfg, postSql)
    }

  /** K4: truncate-and-reload via the JDBC writer's truncate path. */
  def truncateReload(df: DataFrame, cfg: JdbcConfig, table: String): Unit =
    baseOptions(df.write.format("jdbc"), cfg)
      .option("dbtable", table)
      .option("truncate", "true")
      .mode(SaveMode.Overwrite)
      .save()

  /** Driver-side statement execution (staging/sync procs, K5 updates). */
  def runStatements(cfg: JdbcConfig, statements: Seq[String]): Unit = {
    if (statements.isEmpty) return
    val conn = java.sql.DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try {
      val st = conn.createStatement()
      try statements.foreach(st.execute) finally st.close()
    } finally conn.close()
  }

  private def baseOptions(r: org.apache.spark.sql.DataFrameReader, cfg: JdbcConfig)
      : org.apache.spark.sql.DataFrameReader = {
    val base = r.option("url", cfg.url).option("user", cfg.user)
      .option("password", cfg.password)
    cfg.driver.fold(base)(d => base.option("driver", d))
  }

  private def baseOptions[T](w: org.apache.spark.sql.DataFrameWriter[T], cfg: JdbcConfig)
      : org.apache.spark.sql.DataFrameWriter[T] = {
    val base = w.option("url", cfg.url).option("user", cfg.user)
      .option("password", cfg.password)
    cfg.driver.fold(base)(d => base.option("driver", d))
  }
}
