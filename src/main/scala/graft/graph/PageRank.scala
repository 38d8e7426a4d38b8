package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic integer-arithmetic PageRank (Page, Brin, Motwani &
  * Winograd 1999) — the graph-centrality signal a corpus-curation
  * pipeline uses to weight documents by link authority, restated so two
  * engines agree BIT-FOR-BIT: every rank is a long in units of
  * `scale`, every per-edge contribution is an integer floor-division by
  * the out-degree, and the damping mix is integer `dampNum/dampDen`.
  * Floating-point PageRank can never cross the correctness gate (per-node
  * sums accumulate in engine-dependent order); integer micro-units make
  * the aggregation order-immune — the t14 micro-nat trick applied to
  * graph iteration.
  *
  * Semantics per iteration (the dangling-mass-dropped variant: nodes
  * without out-edges contribute nothing, they only collect the base):
  * `r'(v) = base + (dampNum * Σ_{u→v} (r(u) div outdeg(u))) div dampDen`
  * with `base = ((dampDen - dampNum) * scale) div dampDen`.
  *
  * Scale shape: each iteration is one (edges ⋈ ranks) hash join on `src`
  * plus one map-side-combined groupBy on `dst` — shuffle volume is
  * O(edges), never quadratic; ranks materialize per round
  * (localCheckpoint) so the k-th iteration doesn't replan k joins deep,
  * exactly the [[graft.dedup.Components]] round discipline. The reference
  * engine has no graph operator at all (pandas single-node); this is the
  * Spark-native restatement of the standard bulk-synchronous formulation.
  */
object PageRank {

  /** `(id, r)` after `iters` rounds over `edges` (cols `src`, `dst`;
    * should be distinct pairs) starting from every node of `nodes`
    * (col `id`) at rank = `scale`. Nodes absent from `edges`' sources
    * are dangling (drop their mass); nodes absent from `dst` collect
    * only the base. All ids must be non-null.
    *
    * Overflow bound: every intermediate stays within the TOTAL graph
    * mass (<= nodes * scale, since dropped dangling mass only shrinks
    * it), so the caller's contract is `nodes * scale < 2^63` — about
    * 9.2e9 nodes at the default scale. Lower `scale` for larger graphs.
    */
  /** Degree-annotated, materialized edges: one join key (src) serves both
    * the rank lookup and the degree division. Callers running SEVERAL
    * rank computations over one graph (pr1 + pr2 share the supplier-part
    * graph) should call this once and pass the result to [[ranks]] /
    * [[personalizedRanks]], which detect the `outdeg` column and skip the
    * re-prep — the degree groupBy + join + materialization is paid once
    * per graph, not once per variant.
    */
  def prepareEdges(edges: DataFrame): DataFrame =
    edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .select(col("src"), col("dst"),
        // metadata marker: prepEdges accepts an `outdeg` column ONLY when
        // it carries this stamp, so a caller's coincidental (or stale,
        // from a different edge set) `outdeg` column cannot silently skip
        // degree computation and produce wrong ranks — it fails loudly
        // instead. Column metadata survives select/checkpoint, so the
        // stamp travels with frames produced here and only here.
        col("outdeg").as("outdeg", new org.apache.spark.sql.types.MetadataBuilder()
          .putBoolean(PreparedMarker, value = true).build()))
      .localCheckpoint(true)

  /** Metadata key stamped on `outdeg` by [[prepareEdges]]; `outdeg` is a
    * reserved column name on this API's inputs.
    */
  private val PreparedMarker = "graft.pagerank.prepared"

  private def prepEdges(edges: DataFrame): DataFrame =
    edges.schema.find(_.name == "outdeg") match {
      case Some(f) if f.metadata.contains(PreparedMarker) => edges
      case Some(_) => throw new IllegalArgumentException(
        "edges carry an `outdeg` column that was not produced by " +
          "PageRank.prepareEdges; `outdeg` is reserved on this API — " +
          "drop/rename the column, or pass edges through prepareEdges")
      case None => prepareEdges(edges)
    }

  /** One synchronous round. `nodes` carries a per-node restart mass `b`
    * — constant `base` for uniform PageRank, base-on-seeds/0-elsewhere
    * for the personalized variant.
    */
  private def step(e: DataFrame, nodes: DataFrame, pr: DataFrame,
                   dampNum: Long, dampDen: Long): DataFrame = {
    val contrib = e.join(pr, e("src") === pr("id"))
      .select(col("dst").as("id"), expr("r div outdeg").as("c"))
      .groupBy("id").agg(sum("c").as("s"))
    // damping mix as a split multiply: (num*s) div den computed as
    // (s div den)*num + ((s%den)*num) div den — identical for s >= 0
    // (write s = q*den + r: num*s div den = num*q + num*r div den), but
    // intermediates stay bounded by s itself instead of num*s, so the
    // overflow ceiling is the total graph mass (nodes*scale < 2^63,
    // ~9e9 nodes at the default 1e-9 scale) rather than mass*dampNum.
    nodes
      .join(contrib, Seq("id"), "left")
      .select(col("id"),
        (col("b") +
          expr(s"(coalesce(s, 0L) div $dampDen) * $dampNum" +
               s" + ((coalesce(s, 0L) % $dampDen) * $dampNum) div $dampDen"))
          .as("r"))
  }

  def ranks(edges: DataFrame, nodes: DataFrame, iters: Int,
            dampNum: Long = 85L, dampDen: Long = 100L,
            scale: Long = 1000000000L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampNum > 0 && dampDen > dampNum, s"need 0 < dampNum < dampDen")
    val base = (dampDen - dampNum) * scale / dampDen
    val e = prepEdges(edges)
    // materialize the node set once: it is re-joined every round, and
    // recomputing it from source scans k times buys nothing
    val n = nodes.select(col("id"), lit(base).as("b")).localCheckpoint(true)
    var pr = n.select(col("id"), lit(scale).as("r"))
    for (round <- 1 to iters) {
      pr = step(e, n, pr, dampNum, dampDen)
      // materialize every second round (and the last): enough to keep the
      // plan from growing superlinearly, half the action round-trips of
      // checkpointing every round
      if (round % 2 == 0 || round == iters) pr = pr.localCheckpoint(true)
    }
    pr
  }

  /** Personalized PageRank (random walk with restart to the seed set,
    * Haveliwala WWW'02): the restart mass — both the initial rank and
    * the per-round base — lands ONLY on `seeds` (col `id`), so ranks
    * measure proximity to the seeds rather than global authority. The
    * graph-retrieval / related-items primitive ("documents close to this
    * trusted set"). Same integer arithmetic, join shape, checkpoint
    * discipline and overflow bound as [[ranks]] (total seeded mass <=
    * |seeds| * scale only shrinks).
    */
  def personalizedRanks(edges: DataFrame, nodes: DataFrame, seeds: DataFrame,
                        iters: Int, dampNum: Long = 85L, dampDen: Long = 100L,
                        scale: Long = 1000000000L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampNum > 0 && dampDen > dampNum, s"need 0 < dampNum < dampDen")
    val base = (dampDen - dampNum) * scale / dampDen
    val e = prepEdges(edges)
    // distinct: a duplicated seed id must not fan out the node set
    val n = nodes.select("id")
      .join(seeds.select("id").distinct().withColumn("__seed", lit(1)),
        Seq("id"), "left")
      .select(col("id"),
        when(col("__seed").isNotNull, lit(base)).otherwise(lit(0L)).as("b"),
        when(col("__seed").isNotNull, lit(scale)).otherwise(lit(0L)).as("r0"))
      .localCheckpoint(true)
    var pr = n.select(col("id"), col("r0").as("r"))
    for (round <- 1 to iters) {
      pr = step(e, n, pr, dampNum, dampDen)
      if (round % 2 == 0 || round == iters) pr = pr.localCheckpoint(true)
    }
    pr
  }

  /** Iterate until the largest per-node change is <= `tolUnits` rank
    * quanta — an EXACTLY-detectable convergence test, which only the
    * integer formulation has: floating-point PageRank's "converged" is an
    * epsilon policy over drifting ulps, while an integer max-delta is a
    * deterministic comparison. tolUnits defaults to 1 because floor
    * arithmetic dithers in a +/-1-unit 2-cycle around the true fixpoint
    * (measured, not theorized) rather than landing; 1 unit = 1e-9 of a
    * node's initial mass at the default scale, far beyond any ranking
    * use. The round cap stays load-bearing for adversarial damping
    * choices. Convergence costs one (id, r) self-join per round — small
    * next to the contribution join. Returns (ranks, roundsRun,
    * converged).
    */
  def ranksToFixpoint(edges: DataFrame, nodes: DataFrame, maxIters: Int = 60,
                      tolUnits: Long = 1L,
                      dampNum: Long = 85L, dampDen: Long = 100L,
                      scale: Long = 1000000000L): (DataFrame, Int, Boolean) = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    require(tolUnits >= 0, s"tolUnits must be >= 0, got $tolUnits")
    require(dampNum > 0 && dampDen > dampNum, s"need 0 < dampNum < dampDen")
    val base = (dampDen - dampNum) * scale / dampDen
    val e = prepEdges(edges)
    val n = nodes.select(col("id"), lit(base).as("b")).localCheckpoint(true)
    var pr = n.select(col("id"), lit(scale).as("r")).localCheckpoint(true)
    var round = 0
    var maxDelta = Long.MaxValue
    while (round < maxIters && maxDelta > tolUnits) {
      val next = step(e, n, pr, dampNum, dampDen).localCheckpoint(true)
      maxDelta = next.as("n").join(pr.as("o"), "id")
        .agg(max(abs(col("n.r") - col("o.r"))))
        .head().getLong(0)
      pr = next
      round += 1
    }
    (pr, round, maxDelta <= tolUnits)
  }
}
