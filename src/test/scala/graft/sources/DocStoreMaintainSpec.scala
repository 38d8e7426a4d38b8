package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The whole maintenance triad as ONE policy call ([[DocStore.maintain]]):
  * small-file tail merge, clustering repair, COW-garbage vacuum — each leg
  * incremental, each a no-op while its threshold holds, so the operator
  * cron for an indefinitely mutating corpus collapses to one idempotent
  * call after every ingest window.
  */
class DocStoreMaintainSpec extends SparkTestBase {
  import spark.implicits._

  private def freshPath() = {
    val d = java.nio.file.Files.createTempDirectory("graft-maint").toString
    new java.io.File(d).delete()
    d
  }

  private def seeded(path: String, n: Int, files: Int): Unit = {
    DocStore.insertMany((0 until n).map(i => (i.toLong, (i % 7).toLong, s"doc-$i"))
      .toDF("id", "grp", "body"), path)
    DocStore.compact(spark, path, targetFiles = 1, format = Some("parquet"))
    DocStore.cluster(spark, path, col("id"), files, Seq("id"),
      bloomCols = Seq("id"), bloomBits = 1 << 12)
  }

  test("a healthy store pays metadata listings only and commits nothing") {
    val path = freshPath()
    seeded(path, 500, 5)
    val gens = DocStore.generations(spark, path)
    val r = DocStore.maintain(spark, path, keyCol = Some("id"),
      maxDataFiles = 16)
    assert(r == DocStore.MaintenanceReport(compacted = false,
      reclustered = false, rehomed = 0L))
    assert(DocStore.generations(spark, path) == gens)
  }

  test("churn loop with maintain interleaved: bounded files, disjoint layout, exact reads") {
    val path = freshPath()
    seeded(path, 1000, 10)
    var edits = Map.empty[Long, String]
    (0 until 10).foreach { i =>
      // overlapping-range append: every batch spans 2000..2100, so the
      // accumulated tail decays both the file count AND the clustering
      DocStore.insertMany(
        (0 until 10).map(j => ((2000 + j * 10 + i).toLong, 0L, s"new-$i-$j"))
          .toDF("id", "grp", "body").repartition(1), path)
      // a selective COW mutation per window accrues link-home garbage
      val id = (i * 97L + 13L) % 1000L
      DocStore.updateMany(spark, path, col("id") === id,
        Map("body" -> lit(s"edit-$i")))
      edits += id -> s"edit-$i"
      if (i % 3 == 2)
        DocStore.maintain(spark, path, keyCol = Some("id"),
          maxDataFiles = 14, smallBytes = 1L << 20,
          maxOverlapping = 0, minLiveFraction = 0.9)
    }
    DocStore.maintain(spark, path, keyCol = Some("id"), maxDataFiles = 14,
      smallBytes = 1L << 20, maxOverlapping = 0, minLiveFraction = 0.9)
    // file count bounded by the policy
    val st = DocStore.clusterStats(spark, path, "id")
    assert(st.count() <= 14, s"file count ${st.count()} over budget")
    // clustering restored: no overlapping files
    assert(st.filter(col("status") === "overlapping").isEmpty,
      st.collect().mkString("; "))
    // reads stay exact through the whole churn
    val live = DocStore.find(spark, path)
    assert(live.count() == 1100)
    val got = live.filter(col("body").startsWith("edit-"))
      .select("id", "body").as[(Long, String)].collect().toMap
    assert(got == edits)
    assert(DocStore.countFast(spark, path) == 1100L)
    // selective reads still prune after all the rewrites
    val probe = DocStore.find(spark, path, Some(col("id") === 2055L))
    assert(probe.count() == 1)
    assert(probe.inputFiles.length < 14)
    val errs = DocStore.fsck(spark, path).filter(col("severity") === "error")
    assert(errs.isEmpty, errs.collect().mkString("; "))
    // converged: a further pass is a no-op
    assert(DocStore.maintain(spark, path, keyCol = Some("id"),
      maxDataFiles = 14, smallBytes = 1L << 20, maxOverlapping = 0,
      minLiveFraction = 0.9) ==
      DocStore.MaintenanceReport(compacted = false, reclustered = false, 0L))
  }

  test("docstore_maintain TVF drives the same policy") {
    val path = freshPath()
    seeded(path, 400, 4)
    // decay the layout: one overlapping append over the clustered range
    DocStore.insertMany((0 until 50).map(j => ((j * 8).toLong, 0L, "x"))
      .toDF("id", "grp", "body").repartition(1), path)
    val r = spark.sql(
      s"SELECT * FROM docstore_maintain('$path', 'id', 4, ${1L << 20}, 0, 0.5)")
      .head()
    assert(r.getAs[Boolean]("compacted") || r.getAs[Boolean]("reclustered"))
    assert(DocStore.clusterStats(spark, path, "id")
      .filter(col("status") === "overlapping").isEmpty)
    assert(DocStore.find(spark, path).count() == 450)
  }

  test("maintain with an unstatted keyCol refuses loudly (silent no-op = decayed store)") {
    val path = freshPath()
    DocStore.insertMany((0 until 50).map(i => (i.toLong, s"d$i"))
      .toDF("id", "body"), path)
    DocStore.compact(spark, path, targetFiles = 2, format = Some("parquet"))
    assert(intercept[IllegalArgumentException] {
      DocStore.maintain(spark, path, keyCol = Some("id"))
    }.getMessage.contains("no min/max stats"))
  }

  test("the file-count budget respects the file-size budget (no oscillation)") {
    val path = freshPath()
    seeded(path, 500, 5)
    val gens = DocStore.generations(spark, path)
    // 5 disjoint files whose bytes exceed maxDataFiles * maxFileBytes:
    // the count is STRUCTURAL (a recluster would re-split right back),
    // not tail debris — maintain must treat it as healthy instead of
    // compacting toward an unreachable budget and oscillating between
    // two full-corpus rewrites per cron tick
    val r = DocStore.maintain(spark, path, keyCol = Some("id"),
      maxDataFiles = 2, maxFileBytes = 1L)
    assert(r == DocStore.MaintenanceReport(compacted = false,
      reclustered = false, rehomed = 0L))
    assert(DocStore.generations(spark, path) == gens)
  }
}
