package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TrainExportSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-export").toString

  private def corpus = (0L until 300L).map { i =>
    val split = if (i % 10 < 8) "train" else if (i % 10 == 8) "val" else "test"
    (i, s"doc $i", split)
  }.toDF("doc_id", "text", "split")

  test("export writes split-partitioned parquet with a trustworthy manifest") {
    val path = s"${tmpDir()}/export"
    val counts = TrainExport.writeSplits(corpus, path)
    assert(counts == Map("train" -> 240L, "val" -> 30L, "test" -> 30L))
    assert(TrainExport.manifestCounts(spark, path) == counts)
    // every split reads back exactly its rows
    for ((s, n) <- counts) {
      val back = TrainExport.readSplit(spark, path, s)
      assert(back.count() == n, s)
      assert(back.select("doc_id").as[Long].collect().toSet ==
        corpus.filter(col("split") === s).select("doc_id").as[Long].collect().toSet)
    }
    // the layout IS the filter: the split predicate becomes a PARTITION
    // filter (directory pruning), not a row filter over all files
    val scan = TrainExport.readSplit(spark, path, "val")
      .queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.nonEmpty)
    assert(scan.head.partitionFilters.mkString.contains("split"),
      scan.head.partitionFilters.toString)
    val onDiskVal = new java.io.File(s"$path/split=val").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(scan.head.selectedPartitions.totalNumberOfFiles == onDiskVal.toLong,
      "scan should list only the val directory's files")
  }

  test("re-export overwrites cleanly; unknown split labels are counted as other") {
    val path = s"${tmpDir()}/export2"
    TrainExport.writeSplits(corpus, path)
    val withOdd = corpus.withColumn("split",
      when(col("doc_id") === 0L, "holdout").otherwise(col("split")))
    val counts = TrainExport.writeSplits(withOdd, path)
    assert(counts("other") == 1L && counts("train") == 239L)
    assert(TrainExport.manifestCounts(spark, path)("other") == 1L)
    assert(spark.read.parquet(path).count() == 300L)
  }
}
