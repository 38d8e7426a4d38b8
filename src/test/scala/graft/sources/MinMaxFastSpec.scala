package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Metadata-exact min/max ([[DocStore.minMaxFast]], countFast's aggregate
  * sibling): stats-covered columns answer from the sidecar with zero data
  * IO, uncovered files/columns are scanned once, and the result is exact
  * and schema-typed either way.
  */
class MinMaxFastSpec extends SparkTestBase {
  import spark.implicits._

  private def freshPath() = {
    val d = java.nio.file.Files.createTempDirectory("graft-minmax").toString
    new java.io.File(d).delete()
    d
  }

  private def seeded(path: String): Unit = {
    DocStore.insertMany((0 until 500).map(i => (i.toLong, i % 7, s"doc-$i"))
      .toDF("id", "grp", "body").repartition(1), path)
    DocStore.compact(spark, path, targetFiles = 1, format = Some("parquet"))
    DocStore.cluster(spark, path, col("id"), 5, Seq("id"),
      bloomCols = Seq("id"), bloomBits = 1 << 12)
  }

  test("covered column is served from metadata: exact with ZERO data IO") {
    val path = freshPath()
    seeded(path)
    val r = DocStore.minMaxFast(spark, path, Seq("id")).head()
    assert(r.getAs[Long]("min_id") == 0L && r.getAs[Long]("max_id") == 499L)
    // the airtight no-IO pin: truncate every data file — the metadata
    // answer must not notice (countFast's discipline)
    val gen = java.nio.file.Paths.get(path,
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(path, "_MANIFEST")).trim)
    java.nio.file.Files.list(gen).filter(p =>
        !p.getFileName.toString.startsWith("_") &&
          !p.getFileName.toString.startsWith(".") &&
          java.nio.file.Files.isRegularFile(p))
      .forEach(p => java.nio.file.Files.write(p, Array.empty[Byte]))
    val r2 = DocStore.minMaxFast(spark, path, Seq("id")).head()
    assert(r2.getAs[Long]("min_id") == 0L && r2.getAs[Long]("max_id") == 499L)
  }

  test("unstatted column takes the scan path; mixed requests share one scan and stay exact") {
    val path = freshPath()
    seeded(path) // stats cover only `id`
    val r = DocStore.minMaxFast(spark, path, Seq("id", "grp", "body")).head()
    assert(r.getAs[Long]("min_id") == 0L && r.getAs[Long]("max_id") == 499L)
    // json-era inference made grp BIGINT before the parquet migration —
    // minMaxFast types follow the collection schema
    assert(r.getAs[Long]("min_grp") == 0L && r.getAs[Long]("max_grp") == 6L)
    assert(r.getAs[String]("min_body") == "doc-0")
    assert(r.getAs[String]("max_body") == "doc-99")
  }

  test("an appended file joins the metadata path and moves the max") {
    val path = freshPath()
    seeded(path)
    // insertMany re-stats the append with the carried geometry, so the
    // new extreme is served from metadata too
    DocStore.insertMany(Seq((10000L, 9, "late"))
      .toDF("id", "grp", "body").repartition(1), path)
    val r = DocStore.minMaxFast(spark, path, Seq("id")).head()
    assert(r.getAs[Long]("max_id") == 10000L)
    assert(r.getAs[Long]("min_id") == 0L)
  }

  test("all-null column yields a typed null (SQL min/max semantics)") {
    val path = freshPath()
    DocStore.insertMany(
      Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
        .toDF("id", "note").repartition(1), path)
    DocStore.compact(spark, path, targetFiles = 1, format = Some("parquet"))
    DocStore.collectStats(spark, path, Seq("id", "note"))
    val df = DocStore.minMaxFast(spark, path, Seq("id", "note"))
    val r = df.head()
    assert(r.getAs[Long]("min_id") == 1L && r.getAs[Long]("max_id") == 2L)
    assert(r.isNullAt(r.fieldIndex("min_note")) &&
      r.isNullAt(r.fieldIndex("max_note")))
    assert(df.schema("min_note").dataType ==
      org.apache.spark.sql.types.StringType)
  }

  test("matches the direct aggregate on a json store with a widening append") {
    val path = freshPath()
    DocStore.insertMany((0 until 200).map(i => (i.toLong, s"u$i"))
      .toDF("id", "user").repartition(1), path)
    DocStore.collectStats(spark, path, Seq("id", "user"))
    // an appended batch introduces a column the stats never saw: the new
    // column scans, the statted ones stay metadata-served
    DocStore.insertMany(Seq((500L, "zz", 3.5), (501L, "aa", -1.25))
      .toDF("id", "user", "score").repartition(1), path)
    val r = DocStore.minMaxFast(spark, path, Seq("id", "user", "score")).head()
    val e = DocStore.find(spark, path)
      .agg(min("id"), max("id"), min("user"), max("user"),
        min("score"), max("score")).head()
    assert(r.getAs[Long]("min_id") == e.getLong(0))
    assert(r.getAs[Long]("max_id") == e.getLong(1))
    assert(r.getAs[String]("min_user") == e.getString(2))
    assert(r.getAs[String]("max_user") == e.getString(3))
    assert(r.getAs[Double]("min_score") == e.getDouble(4))
    assert(r.getAs[Double]("max_score") == e.getDouble(5))
  }

  test("representation-drifted stats degrade to the scan, never throw") {
    // a JSON collection whose column drifts numeric -> string across
    // statted appends: the schema unifies to string (so the column looks
    // sidecar-safe), but the per-file stats rows carry a numeric bound
    // next to a string bound — incomparable. Every sibling stats consumer
    // treats that as "unknown, read the data"; minMaxFast must too.
    val path = freshPath()
    DocStore.insertMany(Seq((1L, 5L), (2L, 9L)).toDF("id", "v")
      .repartition(1), path)
    DocStore.collectStats(spark, path, Seq("v"))
    DocStore.insertMany(Seq((3L, "aa"), (4L, "zz")).toDF("id", "v")
      .repartition(1), path)
    val r = DocStore.minMaxFast(spark, path, Seq("v")).head()
    // exact under the drifted (string) schema: "5" < "9" < "aa" < "zz"
    assert(r.getAs[String]("min_v") == "5", r.toString)
    assert(r.getAs[String]("max_v") == "zz", r.toString)
  }
}
