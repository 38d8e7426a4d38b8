package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.DocStore

/** SQL surface for corpus mutations (`docstore_update` / `docstore_delete`
  * TVFs) and the idempotence-token machinery underneath.
  *
  * Pins: SQL == Column-API state identity (same mutations, same final
  * corpus, same counts); the SQL path still takes the COPY-ON-WRITE route
  * (links present — the TVF's parsed filter must prune like the Column
  * one); a repeated statement with the same token is a NO-OP returning
  * the recorded count (the analyzer-double-evaluation / orchestrator-
  * retry guarantee); distinct tokens mutate independently; the token
  * window is the retention window.
  */
class SqlMutationSpec extends SparkTestBase {
  import spark.implicits._

  private def freshPath() = {
    val d = java.nio.file.Files.createTempDirectory("graft-sqlmut").toString
    new java.io.File(d).delete()
    d
  }

  /** 0..n-1 rows clustered by id into parquet files with id stats. */
  private def seeded(path: String, n: Int = 400, files: Int = 8): Unit = {
    DocStore.insertMany((0 until n).map(i => (i.toLong, i % 7, s"doc-$i"))
      .toDF("id", "grp", "body"), path)
    DocStore.compact(spark, path, targetFiles = 1, format = Some("parquet"))
    DocStore.cluster(spark, path, col("id"), files, Seq("id"),
      bloomCols = Seq("id"), bloomBits = 1 << 12)
  }

  private def liveGen(path: String): String =
    java.nio.file.Files.readString(java.nio.file.Paths.get(path, "_MANIFEST")).trim

  private def links(path: String): Seq[String] = {
    val p = java.nio.file.Paths.get(path, liveGen(path), "_LINKS")
    if (!java.nio.file.Files.exists(p)) Nil
    else java.nio.file.Files.readString(p).split("\n").toSeq
      .map(_.trim).filter(_.nonEmpty)
  }

  // grp reads back BIGINT: the seed round-trips a JSON generation
  private def state(path: String): Seq[(Long, Long, String)] =
    DocStore.find(spark, path).select("id", "grp", "body")
      .as[(Long, Long, String)].collect().toSeq.sorted

  test("SQL mutations == Column-API mutations, state for state") {
    val sqlStore = freshPath(); val apiStore = freshPath()
    seeded(sqlStore); seeded(apiStore)
    val m = spark.sql(s"SELECT * FROM docstore_update('$sqlStore', 't-upd', " +
      "'id BETWEEN 100 AND 149', 'body', \"'EDITED'\")")
      .head().getAs[Long]("matched")
    val dd = spark.sql(s"SELECT * FROM docstore_delete('$sqlStore', 't-del', " +
      "'id >= 380L')").head().getAs[Long]("deleted")
    val mApi = DocStore.updateMany(spark, apiStore,
      col("id").between(100L, 149L), Map("body" -> lit("EDITED")))
    val dApi = DocStore.deleteMany(spark, apiStore, Some(col("id") >= 380L))
    assert(m == 50L && m == mApi)
    assert(dd == 20L && dd == dApi)
    assert(state(sqlStore) == state(apiStore))
    assert(DocStore.generations(spark, sqlStore).size ==
      DocStore.generations(spark, apiStore).size)
  }

  test("the SQL path takes the COW route (parsed filter prunes like the Column one)") {
    val path = freshPath()
    seeded(path)
    spark.sql(s"SELECT * FROM docstore_update('$path', 't1', " +
      "'id = 5L', 'body', \"'X'\")").collect()
    // one clustered file rewritten, the rest carried by reference —
    // the parsed SQL filter must reach the same stats pruning
    assert(links(path).size == 7,
      s"expected 7 carried links (COW), got ${links(path)}")
  }

  test("a replayed statement with the same token is a no-op with the recorded count") {
    val path = freshPath()
    seeded(path)
    def run() = spark.sql(s"SELECT * FROM docstore_update('$path', 'tok-1', " +
      "'id < 10L', 'grp', 'grp + 100')").head().getAs[Long]("matched")
    assert(run() == 10L)
    val gens = DocStore.generations(spark, path)
    // the replay: same token -> recorded count, NO new generation, and
    // grp is not incremented twice
    assert(run() == 10L)
    assert(DocStore.generations(spark, path) == gens)
    assert(DocStore.find(spark, path).filter(col("grp") >= 200).isEmpty)
    assert(DocStore.find(spark, path)
      .filter(col("id") < 10L && col("grp") >= 100).count() == 10L)
    // a DIFFERENT token applies again (deliberate second increment)
    assert(spark.sql(s"SELECT * FROM docstore_update('$path', 'tok-2', " +
      "'id < 10L', 'grp', 'grp + 100')").head().getAs[Long]("matched") == 10L)
    assert(DocStore.find(spark, path)
      .filter(col("id") < 10L && col("grp") >= 200).count() == 10L)
  }

  test("token idempotence covers the Column API and delete; window = retention") {
    val path = freshPath()
    seeded(path)
    assert(DocStore.deleteMany(spark, path, Some(col("id") < 20L),
      token = Some("del-1"), retain = 3) == 20L)
    // replay: no-op, recorded count
    assert(DocStore.deleteMany(spark, path, Some(col("id") < 20L),
      token = Some("del-1"), retain = 3) == 20L)
    assert(DocStore.find(spark, path).count() == 380L)
    // slide the retention window past the token's generation: the token
    // is forgotten and a replay re-executes (documented window contract)
    DocStore.updateMany(spark, path, col("id") === 399L, Map("body" -> lit("a")))
    DocStore.updateMany(spark, path, col("id") === 398L, Map("body" -> lit("b")))
    DocStore.updateMany(spark, path, col("id") === 397L, Map("body" -> lit("c")))
    assert(DocStore.deleteMany(spark, path, Some(col("id") < 30L),
      token = Some("del-1")) == 10L) // re-executes: 20..29 remain to delete
    assert(DocStore.find(spark, path).count() == 370L)
  }

  test("docstore_vacuum / docstore_cow_stats TVFs (SQL maintenance surface)") {
    val path = freshPath()
    seeded(path)
    // five single-file COW mutations fragment the clustered home
    (0 until 5).foreach(i =>
      DocStore.updateMany(spark, path, col("id") === (i * 50L + 1L),
        Map("body" -> lit(s"e$i"))))
    val stats = spark.sql(s"SELECT * FROM docstore_cow_stats('$path')")
    assert(stats.columns.contains("dead_bytes"))
    assert(stats.filter(col("dead_bytes") > 0L).count() >= 1)
    val n = spark.sql(s"SELECT * FROM docstore_vacuum('$path', 0.9)")
      .head().getAs[Long]("rehomed")
    assert(n == 3L, s"expected the home's 3 live files re-homed, got $n")
    assert(DocStore.find(spark, path).count() == 400L)
    // naturally idempotent: a second call finds nothing under threshold
    assert(spark.sql(s"SELECT * FROM docstore_vacuum('$path', 0.9)")
      .head().getAs[Long]("rehomed") == 0L)
  }

  test("docstore_recluster / docstore_cluster_stats TVFs (SQL layout surface)") {
    val path = freshPath()
    seeded(path)
    // an append inside one clustered file's range decays the layout
    DocStore.insertMany((100 until 110).map(i => (i.toLong, 9, s"new-$i"))
      .toDF("id", "grp", "body").repartition(1), path)
    val st = spark.sql(s"SELECT * FROM docstore_cluster_stats('$path', 'id')")
    assert(st.filter(col("status") === "overlapping").count() == 2L)
    val n = spark.sql(s"SELECT * FROM docstore_recluster('$path', 'id')")
      .head().getAs[Long]("rewritten")
    assert(n == 2L, s"expected the overlap pair rewritten, got $n")
    assert(spark.sql(s"SELECT * FROM docstore_cluster_stats('$path', 'id')")
      .filter(col("status") =!= "disjoint").isEmpty)
    assert(DocStore.find(spark, path).count() == 410L)
    // naturally idempotent: a converged layout commits nothing
    assert(spark.sql(s"SELECT * FROM docstore_recluster('$path', 'id')")
      .head().getAs[Long]("rewritten") == 0L)
  }

  test("a token containing a newline still round-trips the idempotence sidecar") {
    // tokens are arbitrary caller strings and the sidecar is line-framed;
    // the stored form is Base64, so a raw newline cannot split the token
    // across lines and silently defeat the replay check
    val path = freshPath()
    seeded(path)
    val tok = "job-1\nretry"
    assert(DocStore.updateMany(spark, path, col("id") < 10L,
      Map("grp" -> (col("grp") + lit(100L))), token = Some(tok)) == 10L)
    val gens = DocStore.generations(spark, path)
    assert(DocStore.updateMany(spark, path, col("id") < 10L,
      Map("grp" -> (col("grp") + lit(100L))), token = Some(tok)) == 10L)
    assert(DocStore.generations(spark, path) == gens,
      "the replay must not commit a new generation")
    assert(DocStore.find(spark, path).filter(col("grp") >= 200).isEmpty,
      "the replay must not double-apply the $set")
  }

  test("TVF arity errors name the signature, not an index") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM docstore_delete('/nope', 'tok')").collect()
    }
    assert(e.getMessage.contains("docstore_delete(path, token, filterSql)"),
      e.getMessage)
  }

  test("a pre-Base64 raw token sidecar still suppresses the replay") {
    val path = freshPath()
    seeded(path)
    assert(DocStore.updateMany(spark, path, col("id") < 10L,
      Map("grp" -> (col("grp") + lit(100L))), token = Some("old-tok")) == 10L)
    // rewrite the sidecar to the legacy raw-token frame (what a store
    // mutated by the pre-encoding build carries on disk)
    val gen = java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "_MANIFEST")).trim
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, gen, "_mutation_token"), "old-tok\n10")
    // the raw rewrite bypassed Hadoop's checksum sidecar - drop it so the
    // local FS serves the legacy bytes instead of a ChecksumException
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(path, gen, "._mutation_token.crc"))
    val gens = DocStore.generations(spark, path)
    assert(DocStore.updateMany(spark, path, col("id") < 10L,
      Map("grp" -> (col("grp") + lit(100L))), token = Some("old-tok")) == 10L)
    assert(DocStore.generations(spark, path) == gens,
      "the legacy-framed token must still suppress the replay")
    assert(DocStore.find(spark, path).filter(col("grp") >= 200).isEmpty)
  }

  test("a new token equal to another token's stored frame is NOT a replay") {
    val path = freshPath()
    seeded(path)
    assert(DocStore.updateMany(spark, path, col("id") < 10L,
      Map("grp" -> (col("grp") + lit(100L))), token = Some("req-1")) == 10L)
    // the stored frame of "req-1" used as a GENUINE new token: the
    // mutation must execute, not be swallowed as req-1's replay
    val frame = "b64:" + java.util.Base64.getEncoder
      .encodeToString("req-1".getBytes("UTF-8"))
    val gens = DocStore.generations(spark, path)
    assert(DocStore.updateMany(spark, path, col("id") < 10L,
      Map("grp" -> (col("grp") + lit(100L))), token = Some(frame)) == 10L)
    assert(DocStore.generations(spark, path) != gens,
      "the frame-shaped token is a distinct mutation and must commit")
    assert(DocStore.find(spark, path)
      .filter(col("id") < 10L && col("grp") >= 200).count() == 10L)
  }

  test("docstore_update drives dotted-path nested $set from SQL") {
    val path = freshPath()
    DocStore.insertMany((0 until 200).map(i => (i.toLong, s"doc-$i"))
      .toDF("id", "body")
      .withColumn("meta", struct(lit("en").as("lang"),
        (col("id").cast("double") / lit(4.0d)).as("score"))), path)
    DocStore.compact(spark, path, targetFiles = 1, format = Some("parquet"))
    DocStore.cluster(spark, path, col("id"), 4, Seq("id"))
    // nested same-type replace through the SQL verb, token-idempotent
    val m = spark.sql(s"SELECT * FROM docstore_update('$path', 't-nest', " +
      "'id BETWEEN 0 AND 49', 'meta.score', '0.875')").head().getLong(0)
    assert(m == 50L)
    val live = DocStore.find(spark, path)
    assert(live.filter(col("meta.score") === 0.875d).count() == 50)
    assert(live.filter(col("id") === 100L).select("meta.score")
      .head().getDouble(0) == 25.0)
    assert(live.filter(col("meta.lang") =!= "en").isEmpty)
    // replay with the same token is the recorded no-op
    assert(spark.sql(s"SELECT * FROM docstore_update('$path', 't-nest', " +
      "'id BETWEEN 0 AND 49', 'meta.score', '0.125')").head().getLong(0) == 50L)
    assert(DocStore.find(spark, path)
      .filter(col("meta.score") === 0.125d).isEmpty)
  }
}
