package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.Jdbc.JdbcConfig

/** End-to-end JDBC transport over an EMBEDDED Derby database (already on
  * the Spark unmanaged classpath) — proves the K1/K2 path the reference
  * actually uses (staging table + driver-side pre/post statements,
  * /root/reference/dags/CotyData_IPN.py:207-214, Conectores_BD.py:105-113)
  * against a real java.sql transport, not just the parquet analog.
  *
  * Identifiers are quoted lowercase: Spark's JDBC writer quotes column
  * names, and Derby treats quoted identifiers as case-sensitive.
  */
class JdbcRoundTripSpec extends SparkTestBase {
  import spark.implicits._

  // keep derby.log out of the repo
  System.setProperty("derby.system.home", "/tmp/graft-derby-home")

  private val url = "jdbc:derby:/tmp/graft-derby-home/db;create=true"
  private val cfg = JdbcConfig(url, "", "")

  private def queryAll(sql: String): Seq[(Int, String)] =
    Jdbc.readQuery(spark, cfg, sql)
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(1))).toSeq

  private lazy val setup: Unit = {
    // fresh database per JVM run (Derby persists on disk; no IF NOT EXISTS)
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(); ()
    }
    wipe(new java.io.File("/tmp/graft-derby-home/db"))
    Jdbc.runStatements(cfg, Seq(
      """CREATE TABLE staging_t ("k" INT NOT NULL, "v" VARCHAR(32))""",
      """CREATE TABLE final_t ("k" INT NOT NULL PRIMARY KEY, "v" VARCHAR(32))"""))
  }

  private val mergeSql =
    """MERGE INTO final_t f USING staging_t s ON f."k" = s."k"
      |WHEN MATCHED THEN UPDATE SET "v" = s."v"
      |WHEN NOT MATCHED THEN INSERT ("k", "v") VALUES (s."k", s."v")""".stripMargin

  private def load(rows: Seq[(Int, String)]): Unit =
    Jdbc.stagedSyncLoad(rows.toDF("k", "v"), cfg, "staging_t",
      preSql = Seq("DELETE FROM staging_t"), postSql = Seq(mergeSql))

  test("staged sync over real JDBC: load, re-run (idempotent), delta merge") {
    setup
    val batch = Seq((1, "a"), (2, "b"), (3, "c"))
    load(batch)
    assert(queryAll("""SELECT "k", "v" FROM final_t""") == batch)
    // replay the same window: staging truncated by preSql, merge keyed -> unchanged
    load(batch)
    assert(queryAll("""SELECT "k", "v" FROM final_t""") == batch)
    // delta: update one key, add one
    load(Seq((2, "B"), (4, "d")))
    assert(queryAll("""SELECT "k", "v" FROM final_t""") ==
      Seq((1, "a"), (2, "B"), (3, "c"), (4, "d")))
  }

  test("readQuery keeps the WHERE on the database side; filters push down") {
    setup
    load(Seq((1, "a"), (2, "b"), (3, "c")))
    // query-pushdown scan: the predicate is part of the database query
    assert(queryAll("""SELECT "k", "v" FROM final_t WHERE "k" >= 2""").map(_._1).min >= 2)
    // table scan + Spark filter: predicate reaches the JDBC source
    val scan = Jdbc.readTable(spark, cfg, "final_t").filter(col("k") >= 2)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("k"), plan)
    assert(scan.count() >= 2)
  }

  test("truncateReload over JDBC replaces table contents") {
    setup
    load(Seq((1, "a"), (2, "b")))
    Jdbc.truncateReload(Seq((9, "z")).toDF("k", "v"), cfg, "final_t")
    assert(queryAll("""SELECT "k", "v" FROM final_t""") == Seq((9, "z")))
  }
}
