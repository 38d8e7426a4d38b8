package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SketchSpec extends SparkTestBase {
  import spark.implicits._

  // skewed key stream: key k appears k times, keys 1..30
  private lazy val stream = (1 to 30).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
  private lazy val exact: Map[Long, Long] =
    (1 to 30).map(k => k.toLong -> k.toLong).toMap

  private def estimates(depth: Int, width: Int): Map[Long, Long] = {
    val sketch = Sketch.cmsBuild(stream, col("k"), depth, width)
    Sketch.cmsEstimate(sketch, stream.distinct(), "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("estimates never under-count, even with forced collisions") {
    val est = estimates(depth = 2, width = 4) // 30 keys into 4 buckets
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) => assert(est(k) >= n, s"key $k") }
    // with 30 keys in 4 buckets, SOME key must be inflated
    assert(exact.exists { case (k, n) => est(k) > n })
  }

  test("deeper sketch can only tighten the estimate") {
    val shallow = estimates(depth = 1, width = 16)
    val deep = estimates(depth = 4, width = 16)
    exact.keys.foreach(k => assert(deep(k) <= shallow(k), s"key $k"))
  }

  test("generous width makes estimates exact") {
    assert(estimates(depth = 4, width = 4096) == exact)
  }

  test("cmsMerge of split streams equals the sketch of the whole; geometry mismatch refused") {
    val (a, b) = (stream.filter(col("k") <= 15), stream.filter(col("k") > 15))
    val merged = Sketch.cmsMerge(
      Sketch.cmsBuild(a, col("k"), 3, 8), Sketch.cmsBuild(b, col("k"), 3, 8))
    val whole = Sketch.cmsBuild(stream, col("k"), 3, 8)
    assert(merged.cells.select("r", "bucket", "cnt").collect().toSet ==
           whole.cells.select("r", "bucket", "cnt").collect().toSet)
    intercept[IllegalArgumentException] {
      Sketch.cmsMerge(whole, Sketch.cmsBuild(a, col("k"), 3, 16))
    }
  }

  test("cmsJoinSize never under-estimates; exact at generous width") {
    val other = (1 to 30).flatMap(k => Seq.fill(31 - k)(k.toLong)).toDF("k")
    // true join size = sum over k of k * (31 - k)
    val exactJoin = (1 to 30).map(k => k.toLong * (31 - k)).sum
    def est(depth: Int, width: Int): Long = {
      val a = Sketch.cmsBuild(stream, col("k"), depth, width)
      val b = Sketch.cmsBuild(other, col("k"), depth, width)
      Sketch.cmsJoinSize(a, b).head().getLong(0)
    }
    assert(est(2, 4) >= exactJoin, "collisions may only inflate")
    assert(est(4, 4096) == exactJoin)
  }

  test("cmsJoinSize of disjoint key sets is exactly 0, not NULL") {
    // at generous width disjoint keys share NO cell: the cell join is empty
    // and the estimate must coalesce to the exact answer, 0
    val a = Sketch.cmsBuild((1 to 10).map(_.toLong).toDF("k"), col("k"), 4, 4096)
    val b = Sketch.cmsBuild((100 to 110).map(_.toLong).toDF("k"), col("k"), 4, 4096)
    val row = Sketch.cmsJoinSize(a, b).head()
    assert(!row.isNullAt(0) && row.getLong(0) == 0L)
  }

  test("probe with a differently-typed key is cast to the build type, not zeroed") {
    // int probe against a long-built sketch: without the recorded keyType the
    // hash inputs differ, every cell reads 0, and the estimate under-counts
    val sketch = Sketch.cmsBuild(stream, col("k"), 4, 4096)
    val est = Sketch.cmsEstimate(sketch, (1 to 30).toDF("k"), "k")
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    assert(est == exact)
    intercept[IllegalArgumentException] {
      Sketch.cmsMerge(sketch, Sketch.cmsBuild((1 to 5).toDF("k"), col("k"), 4, 4096))
    }
  }

  test("unseen candidate keys estimate to zero") {
    val sketch = Sketch.cmsBuild(stream, col("k"), 4, 4096)
    val est = Sketch.cmsEstimate(sketch, Seq(999L).toDF("k"), "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est == Map(999L -> 0L))
  }
}
