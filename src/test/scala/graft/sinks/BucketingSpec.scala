package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables

class BucketingSpec extends SparkTestBase {

  test("appendPartitioned lays out partition directories and prunes reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val li = Tables.lineitem(spark, sf001)
      .withColumn("ship_date", to_date(col("l_shipdate")))
      .limit(5000)
    Sinks.appendPartitioned(li, dir, Seq("l_returnflag"))
    assert(new java.io.File(dir).list().exists(_.startsWith("l_returnflag=")))
    val pruned = spark.read.parquet(dir).filter(col("l_returnflag") === "A")
    val scanned = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    // partition filter must not survive as a post-scan filter on data rows
    assert(scanned.contains("PartitionFilters") || !scanned.contains("l_returnflag="))
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Sinks.writeBucketed(Tables.orders(spark, sf001), "b_orders", Seq("o_orderkey"), 8)
    Sinks.writeBucketed(
      Tables.lineitem(spark, sf001).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), 8)
    val joined = spark.table("b_lineitem").join(spark.table("b_orders"), "o_orderkey")
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    val exchangesBeforeAgg = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(o_orderkey"))
    assert(exchangesBeforeAgg == 0,
      s"bucketed join must not shuffle on the bucket key:\n$plan")
    assert(joined.count() > 0)
  }
}
