package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Incremental aggregate-view maintenance (DocStore.syncAggregate).
  *
  * The load-bearing claim: after EVERY poll, the maintained view equals
  * a full `groupBy(group).agg(count, sum)` of the source's live state —
  * across appends, group-moving updates, group-emptying deletes,
  * multi-generation poll windows, pure-compaction cursor advances, and
  * crash-shaped re-polls (the cursor commits atomically with the
  * aggregate, so a re-poll can never double-count a delta).
  */
class SyncAggregateSpec extends SparkTestBase {
  import spark.implicits._

  private def freshPath() = {
    val d = java.nio.file.Files.createTempDirectory("graft-syncagg").toString
    new java.io.File(d).delete()
    d
  }

  /** The view's defining equation, computed from scratch. */
  private def rebuild(src: String) =
    DocStore.find(spark, src).groupBy("grp")
      .agg(count(lit(1)).as("cnt"),
        sum(coalesce(col("v"), lit(0))).as("sum_v"))

  private def snap(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
    df.select(col("grp"), col("cnt").cast("long"), col("sum_v").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def docs(rows: (Long, String, java.lang.Long)*) =
    rows.toDF("id", "grp", "v")

  test("seed == full groupBy; append/update/delete polls keep the equality") {
    val src = freshPath(); val dst = freshPath()
    DocStore.insertMany(docs((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L)), src)
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    assert(snap(DocStore.find(spark, dst)) == snap(rebuild(src)))
    assert(snap(DocStore.find(spark, dst)) ==
      Set(("a", 2L, 30L), ("b", 1L, 5L)))

    // append (file-level CDC path, no rewrite)
    DocStore.insertMany(docs((4L, "b", 7L), (5L, "c", 1L)), src)
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    assert(snap(DocStore.find(spark, dst)) == snap(rebuild(src)))

    // update that changes the measure
    DocStore.updateMany(spark, src, col("id") === 1L, Map("v" -> lit(100L)))
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    assert(snap(DocStore.find(spark, dst)) == snap(rebuild(src)))
    assert(snap(DocStore.find(spark, dst)).contains(("a", 2L, 120L)))

    // delete
    DocStore.deleteMany(spark, src, Some(col("id") === 2L))
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    assert(snap(DocStore.find(spark, dst)) == snap(rebuild(src)))
  }

  test("an update MOVING a row between groups adjusts both groups") {
    val src = freshPath(); val dst = freshPath()
    DocStore.insertMany(docs((1L, "a", 10L), (2L, "b", 20L)), src)
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    DocStore.updateMany(spark, src, col("id") === 1L, Map("grp" -> lit("b")))
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    assert(snap(DocStore.find(spark, dst)) == Set(("b", 2L, 30L), ("a", 0L, 0L))
      .filter(_._2 > 0L)) // 'a' emptied -> deleted from the view
    assert(snap(DocStore.find(spark, dst)) == snap(rebuild(src)))
  }

  test("a group emptied by delete is REMOVED from the view, and can return") {
    val src = freshPath(); val dst = freshPath()
    DocStore.insertMany(docs((1L, "a", 10L), (2L, "b", 20L)), src)
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    DocStore.deleteMany(spark, src, Some(col("grp") === "a"))
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    assert(snap(DocStore.find(spark, dst)) == Set(("b", 1L, 20L)))
    DocStore.insertMany(docs((3L, "a", 3L)), src)
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    assert(snap(DocStore.find(spark, dst)) == Set(("a", 1L, 3L), ("b", 1L, 20L)))
  }

  test("multi-generation poll window telescopes (update then delete, one poll)") {
    val src = freshPath(); val dst = freshPath()
    DocStore.insertMany(docs((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L)), src)
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"), retain = 3)
    // two rewrites between polls: the intermediate state must not matter
    DocStore.updateMany(spark, src, col("id") === 2L, Map("v" -> lit(50L)),
      retain = 3)
    DocStore.deleteMany(spark, src, Some(col("id") === 2L), retain = 3)
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"), retain = 3)
    assert(snap(DocStore.find(spark, dst)) ==
      Set(("a", 1L, 10L), ("b", 1L, 5L)))
    assert(snap(DocStore.find(spark, dst)) == snap(rebuild(src)))
  }

  test("re-poll without source changes is a metadata no-op (exactly-once under crash-repoll)") {
    val src = freshPath(); val dst = freshPath()
    DocStore.insertMany(docs((1L, "a", 10L)), src)
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    DocStore.insertMany(docs((2L, "a", 5L)), src)
    val c1 = DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    val before = snap(DocStore.find(spark, dst))
    // the caller "crashed" and polls again — the committed cursor already
    // covers the delta, so nothing is re-applied (no double count) and no
    // new generation is written
    val gensBefore = DocStore.generations(spark, dst)
    val c2 = DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    assert(c2 == c1)
    assert(snap(DocStore.find(spark, dst)) == before)
    assert(DocStore.generations(spark, dst) == gensBefore)
    assert(before == Set(("a", 2L, 15L)))
  }

  test("pure compaction of the source advances the cursor without changing the view") {
    val src = freshPath(); val dst = freshPath()
    DocStore.insertMany(docs((1L, "a", 10L), (2L, "b", 2L)), src)
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    DocStore.compact(spark, src) // rewrite, zero row changes
    val c = DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    assert(snap(DocStore.find(spark, dst)) == Set(("a", 1L, 10L), ("b", 1L, 2L)))
    // cursor advanced past the compaction: the next poll is caught up
    assert(DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v")) == c)
  }

  test("NULL measures count rows but add 0 to the sum (both seed and delta paths)") {
    val src = freshPath(); val dst = freshPath()
    DocStore.insertMany(docs((1L, "a", 10L), (2L, "a", null)), src)
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    assert(snap(DocStore.find(spark, dst)) == Set(("a", 2L, 10L)))
    DocStore.insertMany(docs((3L, "a", null)), src)
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    assert(snap(DocStore.find(spark, dst)) == Set(("a", 3L, 10L)))
  }

  test("foreign destination (rows, no cursor) and NULL group keys fail loudly") {
    val src = freshPath(); val dst = freshPath()
    DocStore.insertMany(docs((1L, "a", 1L)), src)
    DocStore.insertMany(docs((9L, "x", 9L)), dst) // not built by syncAggregate
    val e = intercept[IllegalArgumentException] {
      DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    }
    assert(e.getMessage.contains("no committed sync cursor"))
    val src2 = freshPath(); val dst2 = freshPath()
    // a mixed batch keeps the grp column in the schemaless store while
    // carrying a NULL group value — the refused case
    DocStore.insertMany(
      Seq((1L, Option.empty[String], 1L), (2L, Some("a"), 2L))
        .toDF("id", "grp", "v"), src2)
    val e2 = intercept[IllegalArgumentException] {
      DocStore.syncAggregate(spark, src2, dst2, "id", "grp", Seq("v"))
    }
    assert(e2.getMessage.contains("NULL grp"))
  }

  test("seed reads exactly the captured cursor's files (a racing append is not double-counted)") {
    val src = freshPath(); val dst = freshPath()
    DocStore.insertMany(docs((1L, "a", 1L)), src)
    // an append that lands between cursor capture and the seed read is
    // simulated by appending BEFORE the seed and handing syncAggregate a
    // destination whose cursor predates it: seed from the real API, then
    // verify the next poll delivers the late batch exactly once
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    DocStore.insertMany(docs((2L, "a", 2L)), src)
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v"))
    DocStore.syncAggregate(spark, src, dst, "id", "grp", Seq("v")) // replay
    assert(snap(DocStore.find(spark, dst)) == Set(("a", 2L, 3L)))
  }
}
