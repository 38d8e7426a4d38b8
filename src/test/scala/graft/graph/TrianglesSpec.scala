package graft.graph

import graft.SparkTestBase

class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side brute force: all id-ordered triples with all three edges. */
  private def brute(edges: Seq[(Long, Long)]): (Set[(Long, Long, Long)], Map[Long, Long]) = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      a <- nodes; b <- nodes if a < b && es((a, b))
      c <- nodes if b < c && es((b, c)) && es((a, c))
    } yield (a, b, c)
    val per = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    (tris.toSet, per.withDefaultValue(0L))
  }

  private def run(edges: Seq[(Long, Long)], parts: Int = 3): Map[Long, (Long, Long, Long)] =
    Triangles.perNode(edges.toDF("a", "b").repartition(parts))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("K4: every node in 3 triangles, coefficient exactly 1") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = run(k4)
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    got.values.foreach { case (deg, tri, lcc) =>
      assert(deg == 3L && tri == 3L && lcc == 1000000000L)
    }
  }

  test("path graph has zero triangles and zero coefficients") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    got.values.foreach { case (_, tri, lcc) => assert(tri == 0L && lcc == 0L) }
    // deg-1 endpoints report 0, not a division error
    assert(got(1L) == ((1L, 0L, 0L)))
  }

  test("bowtie: shared apex counts both triangles, coefficient 2*2/(4*3)") {
    // two triangles sharing node 3
    val bow = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 5L))
    val got = run(bow)
    assert(got(3L) == ((4L, 2L, 2L * 2L * 1000000000L / (4L * 3L))))
    assert(got(1L) == ((2L, 1L, 1000000000L)))
  }

  test("matches driver-side brute force on a dense random-ish graph, any partitioning") {
    // deterministic pseudo-random graph: hub-heavy to exercise orientation
    val edges = (for {
      a <- 1L to 20L; b <- (a + 1) to 20L
      if (a * 31 + b * 17) % 3 == 0
    } yield (a, b)) ++ (21L to 40L).map(x => (1L, x)) // node 1 is a hub
    val (tris, per) = brute(edges)
    assert(tris.nonEmpty)
    for (p <- Seq(1, 8)) {
      val got = run(edges, p)
      got.foreach { case (n, (deg, tri, _)) =>
        assert(tri == per(n), s"node $n partitions=$p")
        val expDeg = edges.count(e => e._1 == n || e._2 == n).toLong
        assert(deg == expDeg, s"deg of $n")
      }
      // enumerate() finds each triangle exactly once regardless of column order
      val en = Triangles.enumerate(edges.toDF("a", "b").repartition(p))
        .collect().map(r => {
          val s = Seq(r.getLong(0), r.getLong(1), r.getLong(2)).sorted
          (s(0), s(1), s(2))
        })
      assert(en.length == tris.size && en.toSet == tris, s"partitions=$p")
    }
  }
}
