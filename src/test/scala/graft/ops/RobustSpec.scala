package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RobustSpec extends SparkTestBase {
  import spark.implicits._

  // group g: values 1,2,3,4,100 -> n=5, median = value at rank 3 = 3,
  // devs = 2,1,0,1,97 -> sorted 0,1,1,2,97, MAD = value at rank 3 = 1,
  // outliers (dev > 3*1): the 100 (dev 97) only
  private val df = Seq(
    ("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L), ("g", 4L, 4L), ("g", 100L, 5L),
    // group h: constant values -> med = v, MAD = 0, nothing flagged
    ("h", 7L, 1L), ("h", 7L, 2L)
  ).toDF("grp", "v", "id")

  test("madOutliers: hand-computed lower median, MAD and flags") {
    val out = Robust.madOutliers(df, Seq("grp"), "v", col("id"), k = 3)
      .select("grp", "id", "v", "med", "dev", "mad", "is_outlier")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("g", 1L, 1L, 3L, 2L, 1L, 0L),
      ("g", 2L, 2L, 3L, 1L, 1L, 0L),
      ("g", 3L, 3L, 3L, 0L, 1L, 0L),
      ("g", 4L, 4L, 3L, 1L, 1L, 0L),
      ("g", 5L, 100L, 3L, 97L, 1L, 1L),
      ("h", 1L, 7L, 7L, 0L, 0L, 0L),
      ("h", 2L, 7L, 7L, 0L, 0L, 0L)))
  }

  test("even group size takes the LOWER median (rank ceil(n/2))") {
    val even = Seq(("g", 10L, 1L), ("g", 20L, 2L), ("g", 30L, 3L), ("g", 40L, 4L))
      .toDF("grp", "v", "id")
    val med = Robust.madOutliers(even, Seq("grp"), "v", col("id"), k = 3)
      .select("med").distinct().as[Long].collect().toSeq
    assert(med == Seq(20L))
  }

  test("constant-MAD group: only exact-median rows escape flagging at MAD=0") {
    // values 5,5,5,9: med=5, devs 0,0,0,4 -> MAD (rank 2 of 0,0,0,4) = 0;
    // dev > 0 flags the 9 — MAD=0 degenerates to "any deviation is an outlier"
    val z = Seq(("g", 5L, 1L), ("g", 5L, 2L), ("g", 5L, 3L), ("g", 9L, 4L))
      .toDF("grp", "v", "id")
    val flags = Robust.madOutliers(z, Seq("grp"), "v", col("id"), k = 3)
      .select("id", "is_outlier").as[(Long, Long)].collect().toMap
    assert(flags == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("winsorize: hand-computed quartile bounds and clipping") {
    // group g: sorted values 1,2,3,4,100; n=5 -> q1 rank (5+3)/4 = 2 -> 2,
    // q3 rank (15+3)/4 = 4 -> 4; clips: 1->2, 100->4, middle unchanged
    val out = Robust.winsorize(df, Seq("grp"), "v", col("id"))
      .select("grp", "id", "lo", "hi", "clipped")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("g", 1L, 2L, 4L, 2L),
      ("g", 2L, 2L, 4L, 2L),
      ("g", 3L, 2L, 4L, 3L),
      ("g", 4L, 2L, 4L, 4L),
      ("g", 5L, 2L, 4L, 4L),
      // group h: n=2 -> q1 rank 1, q3 rank 2, both value 7 -> identity
      ("h", 1L, 7L, 7L, 7L),
      ("h", 2L, 7L, 7L, 7L)))
  }

  test("winsorize: singleton group clips to itself") {
    val one = Seq(("g", 42L, 1L)).toDF("grp", "v", "id")
    val out = Robust.winsorize(one, Seq("grp"), "v", col("id"))
      .select("lo", "hi", "clipped").as[(Long, Long, Long)].head()
    assert(out == ((42L, 42L, 42L)))
  }

  test("result is invariant under repartitioning") {
    val a = Robust.madOutliers(df, Seq("grp"), "v", col("id"), k = 3)
    val b = Robust.madOutliers(df.repartition(7), Seq("grp"), "v", col("id"), k = 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
