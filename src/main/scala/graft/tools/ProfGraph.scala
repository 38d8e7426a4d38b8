package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for the graph bench queries (pr1/pr2/cc1/kc1): graph
  * prep vs per-round iteration cost, plus one round's executed plan.
  */
object ProfGraph {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("32", "profgraph")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profgraph] $l%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val li = graft.core.Tables.lineitem(spark, d)
      .select((col("l_suppkey") * 2).as("a"), (col("l_partkey") * 2 + 1).as("b"))
      .distinct()
    val edges0 = li.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(li.select(col("b").as("src"), col("a").as("dst")))
    val nodes = graft.core.Tables.supplier(spark, d)
      .select((col("s_suppkey") * 2).as("id"))
      .unionAll(graft.core.Tables.part(spark, d)
        .select((col("p_partkey") * 2 + 1).as("id")))
      .localCheckpoint(true)
    val e = time("prep") { graft.graph.PageRank.prepareEdges(edges0) }
    println("[profgraph] edges=" + e.count() + " nodes=" + nodes.count())
    for (rep <- 1 to 3)
      time(s"ranks6 rep$rep") {
        graft.graph.PageRank.ranks(e, nodes, iters = 6).count()
      }
    val r1 = graft.graph.PageRank.ranks(e, nodes, iters = 1)
    println(r1.queryExecution.executedPlan.toString.linesIterator
      .take(45).mkString("\n"))
    spark.stop()
  }
}
