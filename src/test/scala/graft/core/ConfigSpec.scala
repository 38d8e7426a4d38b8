package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  private val cfg = Config.fromEnv(Map(
    "GRAFT_WAREHOUSE_URL" -> "jdbc:sqlserver://wh:1433;db=CotyData",
    "GRAFT_WAREHOUSE_USER" -> "etl",
    "GRAFT_WAREHOUSE_PASSWORD" -> "s3cret",
    "UNRELATED_VAR" -> "ignored"))

  test("fromEnv maps GRAFT_* variables to dotted keys, ignores others") {
    assert(cfg.get("warehouse.url").contains("jdbc:sqlserver://wh:1433;db=CotyData"))
    assert(cfg.get("unrelated.var").isEmpty)
  }

  test("jdbc bundle assembles from a prefix; missing keys name the env var") {
    val j = cfg.jdbc("warehouse")
    assert(j.user == "etl" && j.password == "s3cret" && j.driver.isEmpty)
    val e = intercept[IllegalStateException](cfg.jdbc("appdb"))
    assert(e.getMessage.contains("GRAFT_APPDB_URL"))
  }
}

class FilesSpec extends graft.SparkTestBase {
  import org.apache.spark.sql.types._

  test("csv source prunes to useCols with explicit schema (S6 analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    val f = dir.resolve("gastos.csv")
    java.nio.file.Files.writeString(f,
      "FECHA,CONCEPTO,IMPORTE,IGNORAR\n2025-01-01,luz,120.5,x\n2025-01-02,gas,80.0,y\n")
    val schema = StructType(Seq(
      StructField("FECHA", DateType), StructField("CONCEPTO", StringType),
      StructField("IMPORTE", DoubleType), StructField("IGNORAR", StringType)))
    val df = graft.sources.Files.csv(spark, f.toString, schema,
      useCols = Seq("FECHA", "IMPORTE"))
    assert(df.columns.toSeq == Seq("FECHA", "IMPORTE"))
    assert(df.count() == 2)
    assert(df.agg(org.apache.spark.sql.functions.sum("IMPORTE")).head().getDouble(0) == 200.5)
  }

  test("orc round-trip preserves rows and pushes filters to the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString + "/t"
    val src = (1L to 500L).map(i => (i, s"row-$i", i % 7)).toDF("id", "name", "grp")
    graft.sources.Files.writeOrc(src, dir)
    val back = graft.sources.Files.orc(spark, dir)
    assert(back.count() == 500)
    assert(back.filter(org.apache.spark.sql.functions.col("id") === 42L)
      .select("name").head().getString(0) == "row-42")
    // the filter must reach the ORC scan as a pushed filter
    val plan = back.filter(org.apache.spark.sql.functions.col("id") > 400L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,400)"), plan)
  }
}
