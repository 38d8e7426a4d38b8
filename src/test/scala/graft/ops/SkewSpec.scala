package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedSumCount equals the plain groupBy (result-invariant salting)") {
    // one hot key (90% of rows) + long tail
    val rows = (1 to 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong, (i % 100) / 4.0))
    val df = rows.toDF("k", "id", "v")
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", col("id"), saltBuckets = 16)
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted.map(_._1).toSeq == plain.map(_._1).toSeq)
    assert(salted.map(_._3).toSeq == plain.map(_._3).toSeq)
    salted.zip(plain).foreach { case (s, p) => assert(math.abs(s._2 - p._2) < 1e-6) }
  }

  test("AQE splits a deliberately skewed sf-style join; result equals the plain join") {
    // one hot key carrying ~95% of the fact bytes: the shape j12's salting
    // exists for, here run through AQE's own skew-join handling with
    // test-sized thresholds (prod defaults are 256 MB-scale)
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val old = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val pad = "x" * 200
      val fact = (1 to 20000).map(i =>
        (if (i % 20 != 0) 1L else (i % 500).toLong, i.toLong, pad))
        .toDF("k", "id", "pad")
      val dim = (0L until 500L).map(k => (k, s"d$k")).toDF("k", "dname")
      val joined = fact.join(dim, Seq("k")).select("k", "id", "dname")
      val rows = joined.collect()
      // every fact row matches exactly one dim row
      assert(rows.length == 20000)
      assert(rows.map(_.getLong(1)).sum == (1 to 20000).map(_.toLong).sum)
      assert(rows.filter(_.getLong(0) == 1L).forall(_.getString(2) == "d1"))
      // the executed adaptive plan really split the skewed partition
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire:\n${plan.take(1500)}")
    } finally old.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("salt is deterministic across reruns (idempotent-sink safe)") {
    val df = (1 to 100).map(i => ("k", i.toLong, 1.0)).toDF("k", "id", "v")
    val a = Skew.saltedSumCount(df, Seq("k"), "v", col("id")).collect().toSeq
    val b = Skew.saltedSumCount(df, Seq("k"), "v", col("id")).collect().toSeq
    assert(a == b)
  }
}
