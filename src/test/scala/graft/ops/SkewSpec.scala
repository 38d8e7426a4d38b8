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

  test("salt is deterministic across reruns (idempotent-sink safe)") {
    val df = (1 to 100).map(i => ("k", i.toLong, 1.0)).toDF("k", "id", "v")
    val a = Skew.saltedSumCount(df, Seq("k"), "v", col("id")).collect().toSeq
    val b = Skew.saltedSumCount(df, Seq("k"), "v", col("id")).collect().toSeq
    assert(a == b)
  }
}
