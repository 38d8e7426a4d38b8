package graft.tools
object Plans {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("8", "plans")
    // static plan audit: with AQE on, codegen collapse happens per query
    // stage at runtime and WholeStageCodegen never appears in the printed
    // plan — disable it HERE ONLY so wscg spans are visible and countable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val d = "/root/testdata/sf0.1"
    def show(name: String): Unit = {
      val plan = graft.SparkEntry.queries(name)(spark, d)
        .queryExecution.executedPlan.toString
      val lines = plan.linesIterator.toSeq
      println(s"===== $name =====")
      println("scans w/ pushdown: " + lines.count(_.contains("PushedFilters: [")))
      lines.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema")).take(6).foreach(l => println("  " + l.trim.take(160)))
      // wscg = DISTINCT codegen stage ids, visible only in the FINALIZED
      // adaptive plan (either "WholeStageCodegen (n)" nodes or "*(n)"
      // operator prefixes, depending on the subtree's rendering)
      val wscg = (lines.flatMap(l =>
          "WholeStageCodegen \\((\\d+)\\)".r.findFirstMatchIn(l).map(_.group(1))) ++
        lines.flatMap(l =>
          "\\*\\((\\d+)\\)".r.findFirstMatchIn(l).map(_.group(1)))).distinct.size
      println("  broadcasts=" + lines.count(_.contains("BroadcastHashJoin")) + " smj=" + lines.count(_.contains("SortMergeJoin")) + " exchanges=" + lines.count(_.contains("Exchange")) + " wscg=" + wscg)
    }
    Seq("j3_dim_lookup","j5_dual_dim","f1_isin","a1_group_sum","p6_derived","e1_knn_brute","pipe_sales_details","j1_join_multikey",
        "j10_bloom_semi","j11_bloom_anti","j12_salted_join","sd1_dup_spans","t10_cooc_lift","d3_snapshot_diff","e5_ann_pq",
        "ld1_line_dedup","a14_cms_counts","z1_zorder_key","w10_session_window","t13_html_strip","smp3_weighted",
        "w6_ntile","a16_heavy_hitters","pk2_pack_rows","smp4_split","e6_ann_ivfpq",
        "a18_equidepth_hist","a19_group_orderstats","dc2_overlap_frac","mm5_image_phash",
        "tc1_triangles","rrf1_hybrid","nb1_nb_classify","coh1_retention","pr2_ppr").foreach(show)
    spark.stop()
  }
}
