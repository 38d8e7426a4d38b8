package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables

class HllSpec extends SparkTestBase {
  import spark.implicits._

  private def regs(s: Hll.HllSketch): Set[(Int, Int)] =
    s.registers.collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  test("estimate lands inside the published error bound (3 sigma)") {
    for (n <- Seq(5000L, 50000L)) {
      val df = (0L until n).map(i => i * 2654435761L % 1000000007L).toDF("k")
      val distinct = df.distinct().count()
      val est = Hll.hllEstimate(Hll.hllBuild(df, col("k"), p = 12))
        .head().getLong(0)
      val sigma = 1.04 / math.sqrt(1 << 12)
      assert(math.abs(est - distinct).toDouble / distinct <= 3 * sigma,
        s"n=$n distinct=$distinct est=$est")
    }
  }

  test("small cardinalities resolve exactly through linear counting") {
    val df = (1L to 10L).flatMap(i => Seq.fill(20)(i)).toDF("k")
    assert(Hll.hllEstimate(Hll.hllBuild(df, col("k"))).head().getLong(0) == 10L)
    // empty input estimates zero, not an error
    val empty = Hll.hllBuild(spark.emptyDataset[Long].toDF("k"), col("k"))
    assert(Hll.hllEstimate(empty).head().getLong(0) == 0L)
  }

  test("null keys are ignored, matching count(DISTINCT) semantics") {
    val withNulls = (1L to 10L).map(Option(_)).padTo(40, None: Option[Long])
      .toDF("k")
    val clean = (1L to 10L).toDF("k")
    // same registers with and without the nulls -> no phantom element
    assert(regs(Hll.hllBuild(withNulls, col("k"))) ==
           regs(Hll.hllBuild(clean, col("k"))))
    assert(Hll.hllEstimate(Hll.hllBuild(withNulls, col("k")))
      .head().getLong(0) == 10L)
    // grouped: an all-null group contributes no register rows
    val grouped = Seq(("a", Some(1L)), ("a", Some(2L)), ("b", None: Option[Long]))
      .toDF("g", "k")
    val gr = Hll.hllBuildGrouped(grouped, col("k"), Seq("g"))
    assert(gr.filter(col("g") === "b").count() == 0L)
    assert(gr.filter(col("g") === "a").count() > 0L)
  }

  test("registers are deterministic integer state: partition-invariant, merge == whole") {
    val a = (0L until 4000L).toDF("k")
    val b = (2000L until 6000L).toDF("k") // overlapping halves
    val whole = Hll.hllBuild(a.unionAll(b), col("k"), p = 10)
    val merged = Hll.hllMerge(Hll.hllBuild(a, col("k"), p = 10),
                              Hll.hllBuild(b.repartition(7), col("k"), p = 10))
    assert(regs(merged) == regs(whole))
    assert(regs(Hll.hllBuild(a.repartition(13), col("k"), p = 10)) ==
           regs(Hll.hllBuild(a, col("k"), p = 10)))
    intercept[IllegalArgumentException] {
      Hll.hllMerge(whole, Hll.hllBuild(a, col("k"), p = 11))
    }
  }

  test("grouped build equals per-group builds; collapsing groups equals the merge") {
    val df = (0L until 2000L).map(i => (s"s${i % 3}", i % 701)).toDF("src", "k")
    val grouped = Hll.hllBuildGrouped(df, col("k"), Seq("src"), p = 9)
    for (s0 <- Seq("s0", "s1", "s2")) {
      val slice = grouped.filter(col("src") === s0).select("bucket", "max_rho")
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val direct = regs(Hll.hllBuild(df.filter(col("src") === s0), col("k"), p = 9))
      assert(slice == direct, s0)
    }
    val collapsed = grouped.groupBy("bucket").agg(max("max_rho").as("max_rho"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(collapsed == regs(Hll.hllBuild(df, col("k"), p = 9)))
  }

  test("grouped estimates stay inside the error bound per group") {
    val df = (0L until 30000L).map(i => (s"s${i % 3}", i % (701 * (1 + (i % 3))))).toDF("src", "k")
    val grouped = Hll.hllBuildGrouped(df, col("k"), Seq("src"), p = 12)
    val est = Hll.hllEstimateGrouped(grouped, Seq("src"), p = 12)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("src").agg(countDistinct("k")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sigma = 1.04 / math.sqrt(1 << 12)
    for ((s0, e) <- exact)
      assert(math.abs(est(s0) - e).toDouble / e <= 3 * sigma,
        s"$s0: exact=$e est=${est(s0)}")
  }

  test("register table is bounded by 2^p and rho by 64-p+1") {
    val sk = Hll.hllBuild(Tables.events(spark, sf001), col("user_id"), p = 6)
    val rows = sk.registers.collect()
    assert(rows.length <= 64)
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 64))
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 59))
  }
}
