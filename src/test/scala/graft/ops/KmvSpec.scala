package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** KMV bottom-k distinct sketch (ops.Kmv / functions.KmvAgg).
  *
  * Pins: exactness when unsaturated; the Beyer et al. error bound when
  * saturated; partition/merge-order invariance of the sketch (a bounded
  * set of the k smallest hashes is a function of the input SET only);
  * merged-sketch == direct-union-sketch (the identity pairwiseOverlap
  * relies on); intersection estimates that track truth and vanish on
  * disjoint inputs.
  */
class KmvSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 256

  /** grp -> distinct int keys; overlapping ranges give known truth. */
  private def twoGroups(nA: Int, nB: Int, overlap: Int) = {
    val a = (0 until nA).map(i => ("a", i))
    val b = (nA - overlap until nA - overlap + nB).map(i => ("b", i))
    (a ++ b).toDF("grp", "key")
  }

  test("unsaturated sketch is exact: distinct, union, intersection") {
    val df = twoGroups(nA = 100, nB = 80, overlap = 30) // all < K
    val sk = Kmv.build(df, col("grp"), col("key"), K)
    val est = Kmv.estimateDistinct(sk, K).collect().map(r =>
      r.getString(0) -> (r.getInt(1), r.getDouble(3))).toMap
    assert(est("a") === ((100, 100.0)))
    assert(est("b") === ((80, 80.0)))
    val ov = Kmv.pairwiseOverlap(sk, K).collect().head
    assert(ov.getAs[Int]("n_u") === 150)      // |A ∪ B| exactly
    assert(ov.getAs[Int]("c") === 30)         // |A ∩ B| exactly
    assert(ov.getAs[Double]("est_union") === 150.0)
    assert(ov.getAs[Double]("est_intersect") === 30.0)
  }

  test("saturated estimates stay inside the 3-sigma Beyer bound") {
    val nA = 20000; val nB = 15000; val overlap = 6000
    val df = twoGroups(nA, nB, overlap)
    val sk = Kmv.build(df, col("grp"), col("key"), K)
    val tol = 3.0 / math.sqrt(K - 2) // ~19% relative at k=256
    val est = Kmv.estimateDistinct(sk, K).collect().map(r =>
      r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(est("a") - nA) / nA <= tol, s"est(a)=${est("a")}")
    assert(math.abs(est("b") - nB) / nB <= tol, s"est(b)=${est("b")}")
    val ov = Kmv.pairwiseOverlap(sk, K).collect().head
    val union = nA + nB - overlap
    assert(math.abs(ov.getAs[Double]("est_union") - union) / union <= tol)
    // intersection combines the union estimator with a binomial share:
    // allow a wider (but still diagnostic-grade) envelope
    assert(math.abs(ov.getAs[Double]("est_intersect") - overlap) / overlap <= 0.3,
      s"est_intersect=${ov.getAs[Double]("est_intersect")} truth=$overlap")
  }

  test("disjoint groups estimate a (near-)zero intersection") {
    val a = (0 until 10000).map(i => ("a", i))
    val b = (100000 until 110000).map(i => ("b", i))
    val sk = Kmv.build((a ++ b).toDF("grp", "key"), col("grp"), col("key"), K)
    val ov = Kmv.pairwiseOverlap(sk, K).collect().head
    // a shared merged member requires an md5-prefix collision — allow a
    // couple, but the estimate must be a rounding error next to 10k
    assert(ov.getAs[Int]("c") <= 2)
    assert(ov.getAs[Double]("est_intersect") <= 0.02 * 10000)
  }

  test("sketch is partition- and merge-order-invariant") {
    val df = twoGroups(nA = 20000, nB = 15000, overlap = 6000)
    def mins(parts: Int) =
      Kmv.build(df.repartition(parts), col("grp"), col("key"), K)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val one = mins(1); val many = mins(17)
    assert(one("a") === many("a"))
    assert(one("b") === many("b"))
    assert(one("a").length === K)
    assert(one("a") === one("a").sorted, "ascending by contract")
  }

  test("merging two sketches == sketching the union directly") {
    val df = twoGroups(nA = 20000, nB = 15000, overlap = 6000)
    val sk = Kmv.build(df, col("grp"), col("key"), K)
    // the merged bottom-k pairwiseOverlap computes internally:
    val merged = sk.agg(
        slice(array_sort(array_distinct(flatten(collect_list(col("mins"))))), 1, K).as("m"))
      .collect().head.getSeq[Long](0)
    // vs building one sketch over the union of both groups' keys
    val direct = Kmv.build(df.withColumn("grp", lit("all")),
        col("grp"), col("key"), K)
      .collect().head.getSeq[Long](1)
    assert(merged === direct)
  }

  test("SQL surface kmv_sketch == Column path") {
    val df = twoGroups(nA = 5000, nB = 4000, overlap = 1000)
    df.createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      """SELECT grp, kmv_sketch(conv(substring(md5(cast(cast(key AS string) AS binary)), 1, 13), 16, 10), 256) AS mins
        |FROM kmv_in GROUP BY grp""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val viaCol = Kmv.build(df, col("grp"), col("key"), K)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql === viaCol)
  }

  test("k bounds are enforced") {
    val df = twoGroups(10, 10, 5)
    intercept[IllegalArgumentException](Kmv.build(df, col("grp"), col("key"), 1))
    intercept[IllegalArgumentException](Kmv.build(df, col("grp"), col("key"), 4096))
  }
}
