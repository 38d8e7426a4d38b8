package graft.dedup

import org.scalacheck.Gen
import graft.SparkTestBase

class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference: driver union-find with min-id roots (same contract as
    * MinHashDedup.groupsLocal, reimplemented here so the test is
    * independent of the code under test).
    */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
  }

  private def sparkLabels(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.labels(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("long chain: labels equal union-find (diameter >> round count)") {
    // a 300-node path — min-label propagation with a handful of rounds
    // would leave the tail mislabeled; star contraction must not
    val chain = (0L until 299L).map(i => (i, i + 1))
    val got = sparkLabels(chain)
    assert(got.size == 300)
    assert(got.values.forall(_ == 0L))
  }

  test("disjoint cliques + bridges match union-find") {
    val cliques = for {
      c <- 0L until 5L
      a <- 0L until 4L; b <- 0L until 4L if a < b
    } yield (c * 10 + a, c * 10 + b)
    val bridges = Seq((3L, 13L), (23L, 33L)) // merge {0,1} and {2,3}
    val edges = cliques ++ bridges
    assert(sparkLabels(edges) == unionFind(edges))
  }

  test("empty and single-edge graphs") {
    assert(sparkLabels(Nil) == Map.empty[Long, Long])
    assert(sparkLabels(Seq((7L, 3L))) == Map(7L -> 3L, 3L -> 3L))
    assert(sparkLabels(Seq((5L, 5L))) == Map.empty[Long, Long]) // self-loop only
  }

  test("property: random graphs match union-find") {
    val edgeGen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1)
      } yield (a, b))
    } yield edges
    (1 to 15).foreach { i =>
      val edges = edgeGen(Gen.Parameters.default, org.scalacheck.rng.Seed(41L + i)).get
      val expect = unionFind(edges.filter(e => e._1 != e._2))
      assert(sparkLabels(edges) == expect, s"seed ${41 + i}")
    }
  }

  test("non-convergence throws by default, returns partial labels on opt-out") {
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Components.labels(edges, maxIter = 0)
    }
    // opt-out keeps the old warn-and-return behavior for callers that want it
    val partial = Components.labels(edges, maxIter = 0, failOnNonConvergence = false)
    assert(partial.count() > 0)
  }

  test("componentGroups distributed path (threshold 0) routes through star contraction") {
    val docs = (0L until 12L).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L), (10L, 11L), (6L, 7L))
      .toDF("id_a", "id_b")
    val got = MinHashDedup.componentGroups(docs, pairs, "id", localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 9L, 10L -> 10L, 11L -> 10L)
    assert(got == expect)
  }
}
