package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.DocStore
import graft.dedup.MinHashDedup

/** CDC-driven near-dup index maintenance (Streams.syncNearDupIndex).
  *
  * The load-bearing claim: after any sequence of source mutations and
  * polls, the index's CONTENT (band keys and shingle sets — batch ids
  * are arrival bookkeeping) equals a fresh one-shot index of the live
  * corpus, matches never reference removed content, and a crashed poll
  * replays byte-identically (idempotent remove + deterministic batch id,
  * pinned by restoring `_SYNC` and re-polling).
  */
class SyncNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private def freshPath() = {
    val d = java.nio.file.Files.createTempDirectory("graft-syncnd").toString
    new java.io.File(d).delete()
    d
  }

  /** variant v of cluster c: 12 tokens, one mutated — near-dups at J>=0.5 */
  private def doc(c: Int, v: Int): (Long, String) = {
    val toks = (0 until 12).map(i => if (i == v) s"x${c}_$v" else s"w${c}_$i")
    (c * 10L + v, toks.mkString(" "))
  }
  private def uniq(u: Int): (Long, String) =
    (1000L + u, (0 until 12).map(i => s"u${u}_$i").mkString(" "))

  /** Rewrite _SYNC the way a crash-sim must: drop the local-FS crc
    * sidecar too, or Hadoop refuses the tampered file for the wrong
    * reason (checksum) instead of exercising the retry path. */
  private def rewriteSync(idx: String, bytes: Array[Byte]): Unit = {
    java.nio.file.Files.write(java.nio.file.Paths.get(idx, "_SYNC"), bytes)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(idx, "._SYNC.crc"))
  }

  private def sync(src: String, idx: String) =
    Streams.syncNearDupIndex(spark, src, idx,
      idCol = "doc_id", textCol = "text", k = 3, threshold = 0.5)

  private def keySet(idx: String): Set[(String, Long, Long)] =
    spark.read.parquet(s"$idx/keys")
      .select(col("band").cast("string"), col("band_hash"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def shingleSet(idx: String): Set[(Long, Seq[Long])] =
    spark.read.parquet(s"$idx/shingles").select("doc_id", "sh")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet

  private def matchSet(idx: String): Set[(Long, Long)] =
    spark.read.parquet(s"$idx/matches").select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def referenceKeys(live: org.apache.spark.sql.DataFrame)
      : (Set[(String, Long, Long)], Set[(Long, Seq[Long])]) = {
    val sh = MinHashDedup.shingleSets(live, "doc_id", "text", 3)
    val keys = MinHashDedup.bandKeysFromShingles(sh, "doc_id", 16, 4)
      .select(col("band").cast("string"), col("band_hash"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val shs = sh.select("doc_id", "sh")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    (keys, shs)
  }

  test("seed/append/delete/update polls keep index content == fresh one-shot index") {
    val src = freshPath(); val idx = freshPath()
    val seedDocs = (for (c <- 0 until 4; v <- 0 until 2) yield doc(c, v)) ++
      (0 until 6).map(uniq)
    DocStore.insertMany(seedDocs.toDF("doc_id", "text"), src)
    val seedMatches = sync(src, idx)
    // within-seed cluster pairs found at seed time
    assert(matchSet(idx).contains((0L, 1L)))
    assert(seedMatches.count() == matchSet(idx).size)

    // APPEND variant 2 of every cluster: each must match its cluster
    DocStore.insertMany((0 until 4).map(c => doc(c, 2)).toDF("doc_id", "text"), src)
    val m2 = sync(src, idx)
    assert(m2.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet.contains((0L, 2L)))

    // DELETE cluster 1 entirely: its keys/shingles/matches must vanish
    DocStore.deleteMany(spark, src, Some(col("doc_id").between(10L, 12L)))
    sync(src, idx)
    assert(!shingleSet(idx).exists(t => t._1 >= 10L && t._1 <= 12L))
    assert(!matchSet(idx).exists(p =>
      (p._1 >= 10L && p._1 <= 12L) || (p._2 >= 10L && p._2 <= 12L)))

    // UPDATE a unique doc into a near-dup of cluster 0: old content
    // leaves, new content matches the cluster
    val nearText = (0 until 12).map(i => if (i == 1) "z0_1" else s"w0_$i")
      .mkString(" ") // mutates token 1: J >= 0.5 vs every early variant
    DocStore.updateMany(spark, src, col("doc_id") === 1000L,
      Map("text" -> lit(nearText)))
    val m4 = sync(src, idx)
    assert(m4.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet.contains((0L, 1000L)))

    // the index CONTENT equals a fresh one-shot index of the live corpus
    val (refK, refS) = referenceKeys(DocStore.find(spark, src)
      .select("doc_id", "text"))
    assert(keySet(idx) == refK)
    assert(shingleSet(idx) == refS)
  }

  test("a crashed poll replays byte-identically (_SYNC restored, re-polled)") {
    val src = freshPath(); val idx = freshPath()
    DocStore.insertMany(((0 until 3).map(v => doc(0, v)) ++
      (0 until 4).map(uniq)).toDF("doc_id", "text"), src)
    sync(src, idx)
    val syncFile = java.nio.file.Paths.get(idx, "_SYNC")
    val before = java.nio.file.Files.readAllBytes(syncFile)
    // the poll: an update (remove + reingest) and an append in one window
    DocStore.updateMany(spark, src, col("doc_id") === 1L,
      Map("text" -> lit(doc(0, 4)._2)))
    DocStore.insertMany(Seq(doc(0, 5)).toDF("doc_id", "text"), src)
    sync(src, idx)
    val (k1, s1, m1) = (keySet(idx), shingleSet(idx), matchSet(idx))
    val batches1 = spark.read.parquet(s"$idx/keys")
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    // crash simulation: the state commit never happened — restore _SYNC
    // and poll again; remove is a no-op, the batch id re-derives, the
    // ingest overwrites identically
    rewriteSync(idx, before)
    sync(src, idx)
    assert(keySet(idx) == k1 && shingleSet(idx) == s1 && matchSet(idx) == m1)
    assert(spark.read.parquet(s"$idx/keys")
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet == batches1)
  }

  test("metadata-only updates touch nothing; caught-up polls are empty") {
    val src = freshPath(); val idx = freshPath()
    DocStore.insertMany(((0 until 2).map(v => doc(0, v)))
      .map { case (id, t) => (id, t, "en") }.toDF("doc_id", "text", "lang"), src)
    sync(src, idx)
    val (k0, s0) = (keySet(idx), shingleSet(idx))
    val batches0 = spark.read.parquet(s"$idx/keys")
      .select(col("batch_id").cast("long")).distinct().collect().toSeq.size
    DocStore.updateMany(spark, src, col("doc_id") === 0L,
      Map("lang" -> lit("de"))) // text unchanged
    assert(sync(src, idx).isEmpty)
    assert(keySet(idx) == k0 && shingleSet(idx) == s0)
    assert(spark.read.parquet(s"$idx/keys")
      .select(col("batch_id").cast("long")).distinct().collect().toSeq.size
      == batches0)
    // and the cursor advanced: the next poll is caught up, not a re-diff
    assert(sync(src, idx).isEmpty)
  }

  test("a crashed SEED retries idempotently via the bid=-1 intent") {
    val src = freshPath(); val idx = freshPath()
    DocStore.insertMany(((0 until 2).map(v => doc(0, v)) ++
      (0 until 2).map(uniq)).toDF("doc_id", "text"), src)
    sync(src, idx)
    val (k0, s0, m0) = (keySet(idx), shingleSet(idx), matchSet(idx))
    // rewind the state to the seed INTENT (what a crash mid-seed leaves)
    val syncFile = java.nio.file.Paths.get(idx, "_SYNC")
    val txt = new String(java.nio.file.Files.readAllBytes(syncFile), "UTF-8")
    rewriteSync(idx, txt.replace("bid=1", "bid=-1").getBytes("UTF-8"))
    sync(src, idx) // redo seed
    assert(keySet(idx) == k0 && shingleSet(idx) == s0 && matchSet(idx) == m0)
    // and a later real mutation still polls correctly
    DocStore.insertMany(Seq(doc(0, 2)).toDF("doc_id", "text"), src)
    assert(sync(src, idx).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet.contains((0L, 2L)))
  }

  test("an index with batches but no _SYNC state is refused loudly") {
    val src = freshPath(); val idx = freshPath()
    DocStore.insertMany(Seq(doc(0, 0)).toDF("doc_id", "text"), src)
    // a stream-built index: keys exist, no _SYNC
    new java.io.File(s"$idx/keys").mkdirs()
    val e = intercept[IllegalArgumentException] { sync(src, idx) }
    assert(e.getMessage.contains("no _SYNC state"))
  }

  test("deleted content is not probeable afterwards") {
    val src = freshPath(); val idx = freshPath()
    DocStore.insertMany(((0 until 2).map(v => doc(0, v)) ++
      (0 until 2).map(uniq)).toDF("doc_id", "text"), src)
    sync(src, idx)
    // before the delete, a probe with cluster-0 text hits the cluster
    val probeText = (0 until 12).map(i => if (i == 1) "q0_1" else s"w0_$i")
      .mkString(" ")
    val probe = Seq((9000L, probeText)).toDF("doc_id", "text")
    assert(Streams.probeNearDupIndex(probe, idx, k = 3, threshold = 0.5)
      .count() > 0)
    DocStore.deleteMany(spark, src, Some(col("doc_id") < 100L))
    sync(src, idx)
    assert(Streams.probeNearDupIndex(probe, idx, k = 3, threshold = 0.5)
      .isEmpty)
  }
}
