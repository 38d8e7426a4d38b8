package graft.graph

import graft.SparkTestBase

class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference peel. */
  private def ref(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    var changed = true
    while (changed) {
      val deg = es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size)
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != es.size
      es = next
    }
    es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size).toMap
      .filter(_._2 >= k)
  }

  private def run(edges: Seq[(Long, Long)], k: Int, parts: Int = 3): Map[Long, Long] =
    KCore.membership(edges.toDF("a", "b").repartition(parts), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle with a pendant: 2-core is exactly the triangle") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(run(g, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(run(g, 3).isEmpty) // no 3-core in a triangle
  }

  test("long path needs many peel rounds and fully unravels") {
    // 2-core of a path is empty, but each round only removes the two
    // current endpoints — forces the iteration to actually iterate
    val path = (1L until 12L).map(i => (i, i + 1))
    assert(run(path, 2).isEmpty)
    // adding one closing edge makes the whole cycle the 2-core
    val cycle = path :+ ((12L, 1L))
    val got = run(cycle, 2)
    assert(got.keySet == (1L to 12L).toSet && got.values.forall(_ == 2L))
  }

  test("matches reference peel on a layered graph, any partitioning, k=1..4") {
    // clique core + a middle ring + pendant fringe: distinct cores per k
    val clique = for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)
    val ring = (6L to 10L).map(i => (i, if (i == 10L) 6L else i + 1)) ++
      Seq((6L, 1L), (8L, 2L)) // ring tethered to the clique
    val fringe = (11L to 16L).map(i => (i, (i % 5) + 1))
    val g = (clique ++ ring ++ fringe).toSeq
    for (k <- 1 to 4; p <- Seq(1, 7)) {
      val exp = ref(g, k).map { case (n, d) => n -> d.toLong }
      assert(run(g, k, p) == exp, s"k=$k partitions=$p")
    }
  }

  test("k=1 keeps every non-isolated node; invalid k refuses") {
    val g = Seq((1L, 2L), (3L, 4L))
    assert(run(g, 1).keySet == Set(1L, 2L, 3L, 4L))
    intercept[IllegalArgumentException] { run(g, 0) }
  }
}
