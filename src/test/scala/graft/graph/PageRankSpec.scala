package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent driver-side restatement of the integer iteration. */
  private def ref(edges: Seq[(Long, Long)], nodes: Seq[Long],
                  iters: Int): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> 1000000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (u, v) => contrib(v) += r(u) / outdeg(u) }
      r = nodes.map(n => n -> (150000000L + 85L * contrib(n) / 100L)).toMap
    }
    r
  }

  private val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (5L, 1L))
  private val nodes = Seq(1L, 2L, 3L, 4L, 5L)

  test("integer ranks match the driver-side reference exactly, any partitioning") {
    for (p <- Seq(1, 7)) {
      val e = edges.toDF("src", "dst").repartition(p)
      val n = nodes.toDF("id").repartition(p)
      val got = PageRank.ranks(e, n, iters = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ref(edges, nodes, 5), s"partitions=$p")
    }
  }

  test("prepared (degree-annotated) edges give identical ranks to raw edges") {
    // the pr1/pr2 sharing path: prepareEdges once, pass to both variants
    val e = edges.toDF("src", "dst")
    val n = nodes.toDF("id")
    val prepped = PageRank.prepareEdges(e)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(PageRank.ranks(prepped, n, iters = 5)) == m(PageRank.ranks(e, n, iters = 5)))
    val seeds = Seq(1L).toDF("id")
    assert(m(PageRank.personalizedRanks(prepped, n, seeds, iters = 4)) ==
           m(PageRank.personalizedRanks(e, n, seeds, iters = 4)))
  }

  test("a foreign `outdeg` column is rejected loudly, not treated as prepared") {
    // `outdeg` is reserved: only prepareEdges' metadata-stamped column
    // may skip the degree computation — a coincidental (or stale, from a
    // different edge set) column must fail, not produce wrong ranks
    val fake = edges.toDF("src", "dst")
      .withColumn("outdeg", org.apache.spark.sql.functions.lit(1L))
    val ex = intercept[IllegalArgumentException](
      PageRank.ranks(fake, nodes.toDF("id"), iters = 2).collect())
    assert(ex.getMessage.contains("reserved"))
  }

  test("node with no in-edges gets exactly the base; zero iterations is the init") {
    val got = PageRank.ranks(edges.toDF("src", "dst"), nodes.toDF("id"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 4 is isolated, 5 only emits: both collect base alone
    assert(got(4L) == 150000000L && got(5L) == 150000000L)
    val init = PageRank.ranks(edges.toDF("src", "dst"), nodes.toDF("id"), iters = 0)
      .collect().map(r => r.getLong(1)).toSet
    assert(init == Set(1000000000L))
  }

  test("fixpoint iteration stabilizes to within one rank quantum") {
    val e = edges.toDF("src", "dst")
    val n = nodes.toDF("id")
    val (pr, rounds, converged) = PageRank.ranksToFixpoint(e, n, maxIters = 60)
    assert(converged, s"no convergence within 60 rounds")
    assert(rounds >= 2 && rounds < 60, s"rounds=$rounds")
    val fixed = pr.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // agrees with the plain iteration run exactly that long
    val same = PageRank.ranks(e, n, iters = rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed == same)
    // self-consistency: further rounds move no rank by more than the
    // 1-unit floor dither (the documented 2-cycle around the fixpoint)
    val more = PageRank.ranks(e, n, iters = rounds + 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed.keySet == more.keySet)
    fixed.foreach { case (k, v) => assert(math.abs(more(k) - v) <= 1L, s"node $k") }
  }

  test("total mass never exceeds the initial mass (dangling mass only leaks out)") {
    val total = PageRank.ranks(edges.toDF("src", "dst"), nodes.toDF("id"), iters = 8)
      .agg(sum("r")).head().getLong(0)
    assert(total <= nodes.size * 1000000000L)
    assert(total > 0L)
  }

  /** Driver-side personalized reference: restart mass only on seeds. */
  private def refP(edges: Seq[(Long, Long)], nodes: Seq[Long], seeds: Set[Long],
                   iters: Int): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(n => n -> (if (seeds(n)) 1000000000L else 0L)).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (u, v) => contrib(v) += r(u) / outdeg(u) }
      r = nodes.map(n =>
        n -> ((if (seeds(n)) 150000000L else 0L) + 85L * contrib(n) / 100L)).toMap
    }
    r
  }

  test("personalized ranks match the driver reference; seeding everything = uniform PageRank") {
    val e = edges.toDF("src", "dst")
    val n = nodes.toDF("id")
    val seeds = Set(1L, 5L)
    val got = PageRank.personalizedRanks(e, n, Seq(1L, 5L).toDF("id"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refP(edges, nodes, seeds, 5))
    // a node unreachable from the seeds holds rank exactly 0
    assert(got(4L) == 0L)
    // seeding every node reduces to the uniform algorithm, bit for bit
    val all = PageRank.personalizedRanks(e, n, n, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uni = PageRank.ranks(e, n, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all == uni)
  }
}
