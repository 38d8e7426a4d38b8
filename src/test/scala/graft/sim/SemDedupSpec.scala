package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SemDedupSpec extends SparkTestBase {

  private lazy val emb = graft.core.Tables.embeddings(spark, sf001)

  /** Driver-side replay of the exact integer algorithm: quantize, seeded
    * 2-round Lloyd with smallest-cluster tie-break, integer-mean update,
    * then within-cluster integer cosine pruning. Independent code path
    * (plain Scala collections) — the golden for the distributed one.
    */
  private def bruteReplay(k: Int, iters: Int, thrNum: Long, thrDen: Long)
      : Map[Long, (Int, Long)] = {
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](1).map(x => math.floor(x * 1000.0 + 0.5).toLong).toArray)
      .sortBy(_._1)
    var cents: Array[Array[Long]] = vecs.take(k).map(_._2)
    def assignAll(): Array[(Long, Int, Array[Long])] = vecs.map { case (id, q) =>
      val ds = cents.map(c => c.zip(q).map { case (a, b) => (b - a) * (b - a) }.sum)
      (id, ds.indexOf(ds.min), q)
    }
    for (_ <- 0 until iters) {
      val asg = assignAll()
      cents = cents.indices.map { j =>
        val members = asg.filter(_._2 == j).map(_._3)
        if (members.isEmpty) cents(j)
        else members.head.indices.map { i =>
          val s = members.map(_(i)).sum
          math.floor(s.toDouble / members.length + 0.5).toLong
        }.toArray
      }.toArray
    }
    val fin = assignAll()
    val dups = (for {
      a <- fin; b <- fin
      if a._2 == b._2 && a._1 < b._1
      dot = a._3.zip(b._3).map { case (x, y) => x * y }.sum
      if dot >= 0 &&
        thrDen * dot * dot >= thrNum * a._3.map(x => x * x).sum * b._3.map(x => x * x).sum
    } yield b._1).toSet
    fin.map { case (id, cl, _) => id -> (cl, if (dups(id)) 0L else 1L) }.toMap
  }

  test("distributed dedup matches the driver-side integer replay exactly") {
    val got = SemDedup.dedup(emb, k = 10, iters = 2, thrNum = 4L, thrDen = 25L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1).toInt, r.getLong(2))).toMap
    val exp = bruteReplay(k = 10, iters = 2, thrNum = 4L, thrDen = 25L)
    assert(got.size == exp.size)
    assert(got == exp)
  }

  test("pruning path is non-trivial at the registered threshold") {
    val kept = SemDedup.dedup(emb, k = 10, iters = 2, thrNum = 4L, thrDen = 25L)
      .agg(sum("kept")).head().getLong(0)
    val n = emb.count()
    assert(kept < n, "threshold should remove at least one vector")
    assert(kept > n / 2, "threshold should not nuke the corpus")
  }

  test("result is invariant to input partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      SemDedup.dedup(df, k = 10, iters = 2, thrNum = 4L, thrDen = 25L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(emb.repartition(7)) == run(emb.repartition(2, col("vec_id"))))
  }

  test("every removed vector has a smaller-id in-cluster witness; kept ones have none") {
    val res = SemDedup.dedup(emb, k = 10, iters = 2, thrNum = 4L, thrDen = 25L)
    val asg = SemDedup.fitAssign(emb, k = 10, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getSeq[Long](1).toArray)).toMap
    res.collect().foreach { r =>
      val (id, cl, kept) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (myCl, q) = asg(id)
      assert(myCl.toLong == cl)
      val hasWitness = asg.exists { case (oid, (ocl, oq)) =>
        oid < id && ocl == myCl && {
          val dot = q.zip(oq).map { case (x, y) => x * y }.sum
          dot >= 0 &&
            25L * dot * dot >= 4L * q.map(x => x * x).sum * oq.map(x => x * x).sum
        }
      }
      assert(hasWitness == (kept == 0L), s"vec $id kept=$kept witness=$hasWitness")
    }
  }
}
