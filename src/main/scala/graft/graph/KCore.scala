package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-core extraction by iterative peeling: repeatedly drop
  * nodes with degree < k (and their edges) until no node changes. The
  * k-core is the canonical graph-quality filter — spam/bot subgraphs and
  * boilerplate link farms live in low cores, so corpus link-graph
  * pipelines peel before trusting any centrality signal (the same reason
  * PageRank here is paired with components).
  *
  * Each round is one degree aggregate plus two semi-joins over the
  * CURRENT edge set — per-round state is (node, degree), never an
  * adjacency array, so a 10^7-degree hub costs its edges and nothing
  * more (contrast with h-index coreness iterations that materialize
  * per-node neighbor multisets). Rounds are data-bounded (longest
  * peeling chain); each round's result is localCheckpointed to cut
  * lineage, Components' discipline. Convergence is just the edge COUNT:
  * peeling strictly shrinks the edge set, so equal counts prove equal
  * sets — one cheap aggregate per round, no content hash.
  *
  * The peel operator is monotone and idempotent past its fixpoint:
  * peeling an already-peeled core changes nothing. That is what makes
  * the kc1 oracle sound — a DuckDB restatement unrolled to MORE rounds
  * than Spark needed computes the identical fixpoint.
  */
object KCore {

  /** Nodes of the k-core of the undirected graph `edges` (canonical
    * (a, b), a != b, deduplicated) with their within-core degree.
    * Returns (node, deg) — empty when the graph has no k-core.
    */
  def membership(edges: DataFrame, k: Int, maxIter: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    // Peeling only DELETES edges (next ⊆ cur), so equal counts imply
    // equal sets — the count alone is an exact convergence test, no
    // content hash needed (unlike Components, whose star contractions
    // REWRITE edges and can preserve cardinality across a change).
    var cur = edges.select("a", "b").localCheckpoint(true)
    var cs = cur.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val keep = degrees(cur).filter(col("deg") >= k).select("node")
      val next = cur
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(true)
      val csN = next.count()
      converged = csN == cs
      cur = next
      cs = csN
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(s"k-core peel did not converge in $maxIter rounds")
    degrees(cur).filter(col("deg") >= k)
  }
}
