package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class BloomJoinSpec extends SparkTestBase {

  private lazy val li = graft.core.Tables.lineitem(spark, sf001)
  private lazy val orders = graft.core.Tables.orders(spark, sf001)

  test("bloomSemiJoin result == plain semi-join (false positives removed)") {
    val hot = orders.filter(col("o_totalprice") > 150000).select("o_orderkey")
    val viaBloom = BloomJoin.bloomSemiJoin(li, hot, "l_orderkey", "o_orderkey",
        expectedKeys = 10000L)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      .collect().map(_.toSeq).toSet
    val exact = li
      .join(hot.withColumnRenamed("o_orderkey", "l_orderkey").distinct(),
        Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      .collect().map(_.toSeq).toSet
    assert(viaBloom == exact && exact.nonEmpty)
  }

  test("the prune drops non-matching rows at the scan (bounded FP leakage)") {
    val hot = orders.filter(col("o_totalprice") > 400000).select("o_orderkey")
    val total = li.count()
    val matching = li.join(
      hot.withColumnRenamed("o_orderkey", "l_orderkey").distinct(),
      Seq("l_orderkey"), "left_semi").count()
    val surviving = BloomJoin.bloomPruned(li, hot, "l_orderkey", "o_orderkey",
      expectedKeys = 10000L, fpp = 0.01).count()
    // no false negatives, and FP leakage well under the 1% target x4 slack
    assert(surviving >= matching)
    assert(surviving <= matching + (total * 0.04).toLong,
      s"surviving=$surviving matching=$matching total=$total")
    assert(surviving < total, "prune removed nothing")
  }

  test("an undersized sketch degrades pruning but never correctness") {
    val hot = orders.filter(col("o_totalprice") > 200000).select("o_orderkey")
    val a = BloomJoin.bloomSemiJoin(li, hot, "l_orderkey", "o_orderkey",
        expectedKeys = 16L, fpp = 0.5) // absurdly undersized
      .agg(count(lit(1)), sum("l_quantity")).head()
    val b = li.join(hot.withColumnRenamed("o_orderkey", "l_orderkey").distinct(),
        Seq("l_orderkey"), "left_semi")
      .agg(count(lit(1)), sum("l_quantity")).head()
    assert(a == b)
  }
}
