package graft.tools

import org.apache.spark.sql.functions._

/** Dump `.explain("formatted")` for INTERNAL operator fragments whose
  * registered queries hide the plan behind an eager materialization
  * (localCheckpoint / driver union-find): the LSH candidate-pair stage,
  * the exact set-similarity self-join, one PageRank round. Usage:
  *   runMain graft.tools.FragPlans <outDir> <suffix>
  */
object FragPlans {
  def main(a: Array[String]): Unit = {
    require(a.length >= 2, "usage: FragPlans <outDir> <suffix>")
    val outDir = java.nio.file.Paths.get(a(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = a(1)
    val spark = graft.core.Sessions.local("32", "fragplans")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[frag] wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    val docs = graft.core.Tables.documents(spark, d).select("doc_id", "text")
    // LSH candidate-pair stage (m1/d4/d7/st14's pair machinery)
    val sh = graft.dedup.MinHashDedup.shingleSets(docs, "doc_id", "text", 3)
    val keys = graft.dedup.MinHashDedup
      .bandKeysFromShingles(sh, "doc_id", 16, 4)
    dump("frag_candidate_pairs",
      graft.dedup.MinHashDedup.candidatePairs(keys, "doc_id"))
    // exact-Jaccard verify stage (m1/d4/d7/d7b/st14/st15's verify): the
    // shingle kernel + the merge-walk intersect both live in this plan
    dump("frag_verify_pairs",
      graft.dedup.MinHashDedup.verifiedPairsFromShingles(sh,
        graft.dedup.MinHashDedup.candidatePairs(keys, "doc_id"),
        "doc_id", 0.7))
    // exact set-similarity self-join (j14, pre-checkpoint)
    dump("frag_setsim_selfjoin",
      graft.dedup.SetSimJoin.selfJoin(docs, "doc_id", "text", num = 9, den = 10))
    // one PageRank round, pre-checkpoint (pr1's per-round shape)
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
    val e = graft.graph.PageRank.prepareEdges(edges0)
    // iters = 1 with the checkpoint cadence at %2 means the single round
    // below is NOT checkpointed when built via ranks(iters = 1)... it is
    // (round == iters). Rebuild the uncheckpointed round shape by hand:
    val base = 15L * 1000000000L / 100L
    val n = nodes.select(col("id"), lit(base).as("b"))
    val pr0 = n.select(col("id"), lit(1000000000L).as("r"))
    val contrib = e.join(pr0, e("src") === pr0("id"))
      .select(col("dst").as("id"), expr("r div outdeg").as("c"))
      .groupBy("id").agg(sum("c").as("s"))
    dump("frag_pagerank_round",
      n.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (col("b") + expr("(coalesce(s, 0L) div 100) * 85 + " +
            "((coalesce(s, 0L) % 100) * 85) div 100")).as("r")))
    spark.stop()
  }
}
