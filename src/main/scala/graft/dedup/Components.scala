package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star / small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14).
  *
  * Why not plain min-label propagation (the pre-r6 `groups` algorithm,
  * since replaced by delegation to this object)? Propagation
  * needs O(graph diameter) rounds — a 10k-node chain of near-dup documents
  * (boilerplate drift across a crawl) needs 10k rounds. Star contraction
  * halves component heights every alternation and converges in O(log n)
  * rounds REGARDLESS of diameter, each round being two bounded shuffles
  * (a groupBy-min and an equi-join) over the current edge set — never the
  * corpus. That is the difference between "terminates on 100 TB" and not.
  *
  * Semantics per round (node ids are the order; m(u) = min of u and its
  * neighbors):
  *  - large-star: every neighbor v > u re-attaches to m(u),
  *  - small-star: every neighbor v <= u (edges oriented large->small) and u
  *    itself re-attach to m(u).
  * Both preserve connectivity; the fixed point is a star per component
  * centered at its minimum id. Convergence is detected by an edge-multiset
  * checksum (count + sum of row hashes) — one cheap aggregate per round,
  * no `except` shuffle.
  *
  * The reference engine has no graph operator at all (its dedup is a pandas
  * `drop_duplicates`, /root/reference/dags/CotyData_IPN.py:166); this backs
  * the near-dup grouping brief at corpus scale.
  */
object Components {

  /** (node, label) for every node appearing in `pairs` (cols id_a, id_b);
    * label = min node id of the connected component. Nodes outside the pair
    * graph are the caller's concern (they label themselves — see
    * [[MinHashDedup.componentGroups]]).
    *
    * Throws if the contraction has not reached its fixed point within
    * `maxIter` rounds (unreachable in practice: rounds are O(log n)), since
    * a partial labeling is silently-wrong output — downstream near-dup
    * grouping would under-merge with no way to detect it. Callers that
    * prefer partial labels can opt out via `failOnNonConvergence = false`.
    */
  def labels(pairs: DataFrame, maxIter: Int = 30,
             failOnNonConvergence: Boolean = true): DataFrame = {
    // canonical orientation src > dst, self-loops out, exact dedup
    def canon(df: DataFrame): DataFrame =
      df.filter(col("src") =!= col("dst"))
        .select(greatest(col("src"), col("dst")).as("src"),
                least(col("src"), col("dst")).as("dst"))
        .distinct()

    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(sum(xxhash64(col("src"), col("dst"))), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1))
    }

    // large-star: group the SYMMETRIC edge view by u, attach v > u to m(u).
    // v > u >= m(u) keeps the output canonically oriented for free. NOT
    // deduped — the duplicates feed straight into small-star's groupBy/
    // canon, so a distinct here would only add a shuffle per round.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy(col("src").as("u"))
        .agg(min("dst").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      sym.join(mins, sym("src") === mins("u"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
    }

    // small-star: edges are already oriented src > dst, so grouping by src
    // sees exactly the <=-neighbors; re-attach them and src itself to the min.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("src").agg(min("dst").as("m"))
      val moved = e.join(mins, Seq("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
      val centers = mins.select(col("src"), col("m").as("dst"))
      canon(moved.unionByName(centers))
    }

    var edges = canon(
      pairs.select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst")))
      .localCheckpoint(true)
    var prev = checksum(edges)
    var converged = edges.isEmpty
    var i = 0
    while (!converged && i < maxIter) {
      // checkpoint per round: each round reads its input twice (groupBy +
      // join) and the iterated plan otherwise grows exponentially
      edges = smallStar(largeStar(edges)).localCheckpoint(true)
      val cur = checksum(edges)
      converged = cur == prev
      prev = cur
      i += 1
    }
    if (!converged) {
      if (failOnNonConvergence)
        throw new IllegalStateException(
          s"components: not converged after $maxIter rounds — partial labels " +
            "would silently under-merge; raise maxIter or pass " +
            "failOnNonConvergence = false to accept partial output")
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"components: not converged after $maxIter rounds; labels may be partial")
    }
    // fixed point is a star per component: every non-center node appears as
    // src exactly once with dst = component min; centers label themselves
    val centers = edges.select(col("dst").as("node")).distinct()
      .withColumn("label", col("node"))
    edges.select(col("src").as("node"), col("dst").as("label"))
      .unionByName(centers)
      .groupBy("node").agg(min("label").as("label"))
  }
}
