package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.DocStore

/** SQL surface for index/view maintenance: `sync_aggregate` and
  * `sync_neardup` must be the SAME implementation as the Column API — a
  * store driven entirely from SQL ends in state row-identical to a twin
  * driven through DocStore.syncAggregate / Streams.syncNearDupIndex.
  */
class SyncSqlSpec extends SparkTestBase {
  import spark.implicits._

  private def freshPath() = {
    val d = java.nio.file.Files.createTempDirectory("graft-syncsql").toString
    new java.io.File(d).delete()
    d
  }

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"g${i % 4}", (i * 3).toLong))
      .toDF("id", "grp", "v")

  test("sync_aggregate TVF == DocStore.syncAggregate, poll for poll") {
    val srcA = freshPath(); val dstA = freshPath() // API twin
    val srcB = freshPath(); val dstB = freshPath() // SQL twin
    def sqlPoll() = spark.sql(
      s"SELECT * FROM sync_aggregate('$srcB', '$dstB', 'id', 'grp', 'v')")
    def apiPoll() = DocStore.syncAggregate(spark, srcA, dstA, "id", "grp", Seq("v"))
    def both(df: org.apache.spark.sql.DataFrame): Unit = {
      DocStore.insertMany(df, srcA); DocStore.insertMany(df, srcB)
    }
    def states = (
      DocStore.find(spark, dstA).select("grp", "cnt", "sum_v")
        .orderBy("grp").collect().toSeq,
      DocStore.find(spark, dstB).select("grp", "cnt", "sum_v")
        .orderBy("grp").collect().toSeq)

    both(docs(40))
    apiPoll()
    val viaSql = sqlPoll() // seeds AND returns the view
    assert(viaSql.columns.toSet == Set("grp", "cnt", "sum_v"))
    val (a1, b1) = states
    assert(a1 == b1 && a1.nonEmpty)
    assert(viaSql.select("grp", "cnt", "sum_v").orderBy("grp")
      .collect().toSeq == b1)

    // mutations propagate identically through both surfaces
    // retain=3: the poll consumes BOTH mutation windows at once, so the
    // cursor's base generation must outlive two commits
    DocStore.updateMany(spark, srcA, col("id") % 5 === 0,
      Map("v" -> lit(1000L)), retain = 3)
    DocStore.updateMany(spark, srcB, col("id") % 5 === 0,
      Map("v" -> lit(1000L)), retain = 3)
    DocStore.deleteMany(spark, srcA, Some(col("grp") === "g3"), retain = 3)
    DocStore.deleteMany(spark, srcB, Some(col("grp") === "g3"), retain = 3)
    apiPoll(); sqlPoll()
    val (a2, b2) = states
    assert(a2 == b2)
    // a caught-up SQL poll is a no-op returning the same view
    assert(sqlPoll().orderBy("grp").collect().toSeq ==
      DocStore.find(spark, dstB).select(sqlPoll().columns.map(col): _*)
        .orderBy("grp").collect().toSeq)
  }

  test("sync_neardup TVF == Streams.syncNearDupIndex, state for state") {
    def doc(c: Int, variant: Int): (Long, String) = {
      val toks = (0 until 12).map(i =>
        if (i == variant) s"x${c}_$variant" else s"w${c}_$i")
      (c * 10L + variant, toks.mkString(" "))
    }
    val srcA = freshPath(); val idxA = freshPath()
    val srcB = freshPath(); val idxB = freshPath()
    def sqlPoll() = spark.sql(
      s"SELECT * FROM sync_neardup('$srcB', '$idxB', 'doc_id', 'text', 3, 0.5D)")
    def apiPoll() = graft.streaming.Streams.syncNearDupIndex(
      spark, srcA, idxA, idCol = "doc_id", textCol = "text",
      k = 3, threshold = 0.5)
    def both(df: org.apache.spark.sql.DataFrame): Unit = {
      DocStore.insertMany(df, srcA); DocStore.insertMany(df, srcB)
    }
    def matchesOf(idx: String) =
      spark.read.parquet(s"$idx/matches").select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    both((0 until 3).map(c => doc(c, 0)).toDF("doc_id", "text"))
    apiPoll(); sqlPoll() // seed
    both((0 until 3).map(c => doc(c, 1)).toDF("doc_id", "text"))
    apiPoll()
    val sqlMatches = sqlPoll() // arrival-time matching of the append
    assert(matchesOf(idxA) == matchesOf(idxB) && matchesOf(idxB).nonEmpty)
    assert(sqlMatches.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == matchesOf(idxB))
    // a source delete propagates as a takedown through both surfaces
    DocStore.deleteMany(spark, srcA, Some(col("doc_id") === 0L))
    DocStore.deleteMany(spark, srcB, Some(col("doc_id") === 0L))
    apiPoll(); sqlPoll()
    assert(matchesOf(idxA) == matchesOf(idxB))
    assert(!matchesOf(idxB).exists(p => p._1 == 0L || p._2 == 0L))
  }
}
