package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting + local clustering coefficients via
  * degree-ordered edge orientation (Cohen, "Graph Twiddling in a MapReduce
  * World", CiSE'09; the classic compact-forward scheme).
  *
  * Naive triangle enumeration joins the adjacency list with itself around
  * every node — a hub of degree d fans out d^2 wedges, so one celebrity
  * node in a 100 TB graph detonates the shuffle. Orienting every edge from
  * its lower-(degree, id) endpoint to its higher one fixes that
  * structurally: each triangle is counted exactly once (from its
  * lowest-ranked corner), and every node's OUT-degree is bounded by
  * O(sqrt(m)), so total wedge fan-out is O(m^1.5) worst case and far less
  * on real degree distributions — the hub's d^2 never materializes because
  * the hub is the highest-ranked endpoint of almost all its edges and
  * therefore generates no wedges.
  *
  * Everything is two self-joins and a groupBy on edge keys: no driver
  * state, no iteration, no collect. The (degree, id) rank is total, so the
  * orientation — and with it the exact triangle count — is deterministic
  * under any partitioning.
  *
  * The reference engine has no graph surface (SURVEY.md §2 note on G-ops;
  * its only relational dedup is pandas drop_duplicates,
  * /root/reference/dags/CotyData_IPN.py:166); this extends the engine's
  * graph family (PageRank, components) with the standard cohesion metric.
  */
object Triangles {

  /** Per-node triangle participation over an undirected simple graph.
    *
    * `edges` must be canonical: columns (a, b), a != b, one row per
    * undirected edge (enforce upstream with least/greatest + distinct).
    * Returns (node, deg, tri, lcc_ppb): degree, number of triangles the
    * node belongs to, and the local clustering coefficient
    * 2*tri / (deg*(deg-1)) in integer parts-per-billion (exact integer
    * division — no float ever enters the result, so cross-engine
    * comparison is hash-exact). Isolated corners (deg == 1) report 0.
    *
    * Precision ceiling (the PageRank-style overflow contract): the ppb
    * numerator 2*tri*1e9 is bounded by deg*(deg-1)*1e9, so Long holds it
    * while per-node degree <= ~96,000 (deg*(deg-1) < 2^63/1e9). Beyond
    * that — a hub whose NEIGHBORHOOD closure you genuinely enumerate —
    * the counts (deg, tri) stay exact; recompute the coefficient at a
    * coarser grid (ppm buys degree <= ~3M) or in floating point
    * downstream. The enumeration itself has no such bound.
    */
  def perNode(edges: DataFrame): DataFrame = {
    val tri = enumerate(edges)
    val deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val counts = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    deg.join(counts, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        when(col("deg") > 1,
          expr("(2 * coalesce(tri, 0L) * 1000000000L) div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("lcc_ppb"))
  }

  /** One row (u, v, w) per triangle, each exactly once. Column order is
    * orientation rank, not id order — stable because the rank is total.
    */
  def enumerate(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // Orient low-(deg, id) -> high-(deg, id); carry the head's rank so the
    // wedge join below can order a node's out-neighbors without a third
    // join back to the degree table.
    val withDeg = edges
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    val aLower = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aLower, col("a")).otherwise(col("b")).as("src"),
      when(aLower, col("b")).otherwise(col("a")).as("dst"),
      when(aLower, col("db")).otherwise(col("da")).as("ddst"))
    // Wedge (v, w) around u: two out-edges of u with rank(v) < rank(w);
    // the triangle closes iff the oriented edge v -> w exists (it can only
    // be oriented that way, so one equi-join probe suffices).
    val p = oriented.select(col("src").as("u"), col("dst").as("v"), col("ddst").as("dv"))
    val q = oriented.select(col("src").as("u"), col("dst").as("w"), col("ddst").as("dw"))
    val wedges = p.join(q,
      p("u") === q("u") &&
        (col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w"))))
      .select(p("u"), col("v"), col("w"))
    wedges.join(oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      .select("u", "v", "w")
  }
}
