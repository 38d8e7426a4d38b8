package graft

/** Pins the physical-plan properties the engine promises (README "Scale
  * design"): dimension joins broadcast (never sort-merge), filters reach
  * the parquet scan, aggregations keep partial (map-side) combine. A
  * regression here means a plan silently degraded even though results
  * stay correct.
  */
class PlanQualitySpec extends SparkTestBase {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf001).queryExecution.executedPlan.toString

  test("dimension-lookup joins broadcast; no sort-merge join") {
    val p = plan("j3_dim_lookup")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dual-dim star join: all five joins hash-based, none sort-merge") {
    val p = plan("j5_dual_dim")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2, p)
  }

  test("dual-dim star join at bench scale: all three dims broadcast") {
    // plan-only at sf0.1 (the scale Bench runs at) — both nation roles AND
    // supplier must be broadcast; fact-fact joins may legitimately SMJ here
    val p = SparkEntry.queries("j5_dual_dim")(spark, sf01)
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3, p)
  }

  test("filter reaches the parquet scan as a pushed filter") {
    val p = plan("f1_isin")
    assert(p.contains("PushedFilters: [In(l_returnflag"), p)
  }

  test("projection prunes the scan schema (no full-width read)") {
    val p = plan("x4_concat")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("c_custkey") && !readSchema.contains("c_acctbal"), readSchema)
  }

  test("group-by aggregation keeps partial (map-side) combine") {
    val p = plan("a1_group_sum")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2, p)
  }

  test("semi/anti joins plan as joins, not IN-subquery re-scans") {
    assert(plan("j7_semi").contains("LeftSemi"), plan("j7_semi"))
    assert(plan("j6_anti").contains("LeftAnti"), plan("j6_anti"))
  }
}
