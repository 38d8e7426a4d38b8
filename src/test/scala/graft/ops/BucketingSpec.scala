package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class BucketingSpec extends SparkTestBase {

  test("same-bucketed tables join with zero exchange and identical results") {
    val li = graft.core.Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val ord = graft.core.Tables.orders(spark, sf001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "b_li", 8, "l_orderkey")
    Bucketing.writeBucketed(ord, "b_ord", 8, "l_orderkey")
    // at test scale Catalyst would just broadcast the small side; disable
    // that to surface the shape bucketing exists for — the big-big join
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_li", "b_ord", "l_orderkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      val viaBuckets = joined.agg(count(lit(1)), sum("l_quantity")).head()
      val plain = li.join(ord, Seq("l_orderkey"))
        .agg(count(lit(1)), sum("l_quantity")).head()
      assert(viaBuckets == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      spark.sql("DROP TABLE IF EXISTS b_li")
      spark.sql("DROP TABLE IF EXISTS b_ord")
    }
  }

  test("groupBy on the bucket key needs no exchange either") {
    val li = graft.core.Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(li, "b_li2", 8, "l_orderkey")
    try {
      val agg = spark.table("b_li2").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"))
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed groupBy still shuffles:\n$p")
      assert(agg.count() == li.select("l_orderkey").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS b_li2")
  }
}
