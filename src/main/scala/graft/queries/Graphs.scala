package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.graph.{KCore, Triangles}
import Registry._

/** Graph-analytics queries beyond PageRank/components (which live in
  * DedupSim.defs for historical reasons): cohesion metrics over the
  * part co-purchase graph.
  */
object Graphs {

  /** kc1's oracle: the peel unrolled to 16 rounds. Peeling is idempotent
    * past its fixpoint, so as long as 16 >= the rounds the data actually
    * needs (gate fails loudly otherwise), the unrolled form computes the
    * identical fixpoint Spark's convergence loop reaches.
    */
  private val kcOracle: String = {
    // AS MATERIALIZED: each round is referenced three times by the next;
    // default CTE inlining would expand the chain 3^16-fold (observed as
    // a "too many open files" parquet-scan explosion)
    val sb = new StringBuilder
    sb.append(
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 40),
        |e0 AS MATERIALIZED (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |       FROM li x JOIN li y
        |       ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey)""".stripMargin)
    for (i <- 0 until 16) {
      sb.append(s""",
        |d$i AS MATERIALIZED (SELECT node FROM (SELECT a AS node FROM e$i UNION ALL SELECT b FROM e$i)
        |        GROUP BY 1 HAVING count(*) >= 3),
        |e${i + 1} AS MATERIALIZED (SELECT a, b FROM e$i
        |        WHERE a IN (SELECT node FROM d$i) AND b IN (SELECT node FROM d$i))""".stripMargin)
    }
    sb.append(
      """
        |SELECT node, count(*) AS deg
        |FROM (SELECT a AS node FROM e16 UNION ALL SELECT b FROM e16)
        |GROUP BY 1 HAVING count(*) >= 3 ORDER BY node""".stripMargin)
    sb.toString
  }

  val defs: Seq[(String, Entry)] = Seq(

    // ---- 3-core of the part co-purchase graph: iterative peel with
    //      checksum convergence (graph.KCore) — the graph-quality filter
    //      that strips low-engagement fringes before any centrality
    //      computation. Per-round state is (node, degree) only.
    "kc1_kcore" -> withOracle(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_quantity") >= 40)
          .select("l_orderkey", "l_partkey")
        val e = li.alias("x").join(li.alias("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
          .distinct()
        KCore.membership(e, k = 3).orderBy("node")
      },
      kcOracle),

    // ---- triangle counting + local clustering coefficient over the part
    //      co-purchase graph (parts bought together in one order, high-
    //      quantity lines only so the projection stays sparse). Degree-
    //      ordered orientation: each triangle found once, wedge fan-out
    //      O(m^1.5) — no hub blow-up at scale. The coefficient is exact
    //      integer parts-per-billion, so the oracle comparison is
    //      hash-exact with zero float tolerance. The DuckDB restatement
    //      enumerates unoriented (a < b ordered) triangles — same set by
    //      a different traversal, which is exactly what makes it an
    //      oracle rather than a restatement of the implementation.
    "tc1_triangles" -> withOracle(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_quantity") >= 40)
          .select("l_orderkey", "l_partkey")
        val e = li.alias("x").join(li.alias("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_partkey") < col("y.l_partkey"))
          .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
          .distinct()
        Triangles.perNode(e).orderBy("node")
      },
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 40),
        |e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |      FROM li x JOIN li y
        |      ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        |deg AS (SELECT node, count(*) AS deg
        |        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        |        GROUP BY 1),
        |tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
        |        FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
        |        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |cnt AS (SELECT node, count(*) AS tri
        |        FROM (SELECT u AS node FROM tri
        |              UNION ALL SELECT v FROM tri
        |              UNION ALL SELECT w FROM tri)
        |        GROUP BY 1)
        |SELECT d.node, d.deg, CAST(COALESCE(c.tri, 0) AS BIGINT) AS tri,
        |       CAST(CASE WHEN d.deg > 1
        |                 THEN (2 * COALESCE(c.tri, 0) * 1000000000) // (d.deg * (d.deg - 1))
        |                 ELSE 0 END AS BIGINT) AS lcc_ppb
        |FROM deg d LEFT JOIN cnt c USING (node)
        |ORDER BY node""".stripMargin)
  )
}
