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

  test("bloomAntiJoin == plain anti-join, including null fact keys") {
    import spark.implicits._
    val fact = Seq((Some(1L), "a"), (Some(2L), "b"), (Some(3L), "c"),
                   (None, "null-key"), (Some(2L), "b2"))
      .toDF("k", "v")
    val seen = Seq(2L, 9L).toDF("sk")
    val viaBloom = BloomJoin.bloomAntiJoin(fact, seen, "k", "sk", expectedKeys = 16L)
      .collect().map(_.toSeq).toSet
    val exact = fact.join(seen.withColumnRenamed("sk", "k").distinct(),
        Seq("k"), "left_anti")
      .collect().map(_.toSeq).toSet
    assert(viaBloom == exact)
    assert(viaBloom.exists(_.contains("null-key")), "null keys must survive")
    assert(!viaBloom.exists(_.contains("b")))
  }

  test("bloomAntiJoin on the real tables == NOT IN semantics") {
    val seen = orders.filter(col("o_totalprice") > 150000).select("o_orderkey")
    val viaBloom = BloomJoin.bloomAntiJoin(li, seen, "l_orderkey", "o_orderkey",
        expectedKeys = 10000L)
      .agg(count(lit(1)), sum("l_quantity")).head()
    val exact = li.join(seen.withColumnRenamed("o_orderkey", "l_orderkey").distinct(),
        Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)), sum("l_quantity")).head()
    assert(viaBloom == exact)
  }

  test("saltedJoin == plain inner join (row multiset)") {
    val dim = orders.select("o_orderkey", "o_orderpriority")
    val fact = li.withColumnRenamed("l_orderkey", "o_orderkey")
    val salted = Skew.saltedJoin(fact, dim, Seq("o_orderkey"), col("l_partkey"),
        saltBuckets = 4)
      .groupBy("o_orderpriority").agg(count(lit(1)), sum("l_quantity")).collect()
      .map(_.toSeq).toSet
    val plain = fact.join(dim, Seq("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)), sum("l_quantity")).collect()
      .map(_.toSeq).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("non-bigint keys fail at analysis, not with a runtime ClassCastException") {
    import spark.implicits._
    val fact = Seq(("a", 1), ("b", 2)).toDF("name", "v")
    val keys = Seq("a").toDF("name")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      BloomJoin.bloomSemiJoin(fact, keys, "name", "name", expectedKeys = 16L).collect()
    }
    assert(e.getMessage.contains("bloom_might_contain"))
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
