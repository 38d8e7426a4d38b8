package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  // zipf-ish stream: key k (1..40) appears floor(4000 / k) times — a long
  // tail with a few dominant keys, the shape MG exists for
  private lazy val zipf = (1 to 40).flatMap(k => Seq.fill(4000 / k)(k.toLong))
  private lazy val total = zipf.size
  private lazy val exact: Map[Long, Long] =
    zipf.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def run(minFraction: Double, budget: Int, partitions: Int): Map[Long, (Long, Double)] =
    HeavyHitters.heavyHitters(
        zipf.toDF("k").repartition(partitions), col("k"), minFraction, budget)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("output equals the exact GROUP BY ... HAVING answer, any partitioning") {
    for (p <- Seq(1, 3, 16)) {
      val expect = exact.filter { case (_, n) => n >= 0.02 * total }
      val got = run(minFraction = 0.02, budget = 64, partitions = p)
      assert(got.keySet == expect.keySet, s"partitions=$p")
      got.foreach { case (k, (cnt, frac)) =>
        assert(cnt == expect(k), s"k=$k")
        assert(frac == cnt.toDouble / total)
      }
      assert(got.nonEmpty && got.size < exact.size, "threshold must split the keys")
    }
  }

  test("tight budget at the guarantee boundary still finds every heavy hitter") {
    // budget == 1/minFraction exactly: the bound with minimal slack
    val expect = exact.filter { case (_, n) => n >= 0.05 * total }.keySet
    assert(run(minFraction = 0.05, budget = 20, partitions = 8).keySet == expect)
  }

  test("budget below the guarantee is refused") {
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(zipf.toDF("k"), col("k"), 0.05, budget = 19)
    }
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(zipf.toDF("k"), col("k"), 0.0)
    }
  }

  test("string keys keep their type; no heavy hitter -> empty, not error") {
    val words = Seq.fill(50)("the") ++ ('a' to 'z').map(_.toString)
    val got = HeavyHitters.heavyHitters(words.toDF("w"), col("w"),
        minFraction = 0.3, budget = 8, outKey = "w")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("the", 50L)))
    val none = HeavyHitters.heavyHitters(words.toDF("w"), col("w"),
      minFraction = 0.9, budget = 8)
    assert(none.count() == 0)
  }
}
