package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.DocStore
import graft.dedup.MinHashDedup
import graft.sim.Ann

/** Derived-index batch-dir compaction (Streams.compactNearDupIndex /
  * compactIvfIndex) — the index-side small-file maintenance leg.
  *
  * Load-bearing claims: after any number of CDC polls, folding the
  * accumulated `batch_id=N` dirs (a) bounds the directory count, (b)
  * changes NO result — index content, probe matches, and knn servings are
  * row-identical before/after, (c) never resurrects a taken-down id, and
  * (d) heals a crash at any protocol point on the next entry into any
  * index operation.
  */
class IndexCompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def freshPath() = {
    val d = java.nio.file.Files.createTempDirectory("graft-idxcompact").toString
    new java.io.File(d).delete()
    d
  }

  // ---- near-dup helpers (the SyncNearDupSpec corpus shape) ----------------

  private def doc(c: Int, v: Int): (Long, String) = {
    val toks = (0 until 12).map(i => if (i == v) s"x${c}_$v" else s"w${c}_$i")
    (c * 10L + v, toks.mkString(" "))
  }
  private def uniq(u: Int): (Long, String) =
    (1000L + u, (0 until 12).map(i => s"u${u}_$i").mkString(" "))

  private def sync(src: String, idx: String, maxBatchDirs: Int = 0) =
    Streams.syncNearDupIndex(spark, src, idx,
      idCol = "doc_id", textCol = "text", k = 3, threshold = 0.5,
      maxBatchDirs = maxBatchDirs)

  private def batchDirs(parent: String): Seq[Long] = {
    val f = new java.io.File(parent)
    Option(f.listFiles()).getOrElse(Array.empty).toSeq
      .filter(d => d.isDirectory && d.getName.startsWith("batch_id="))
      .map(_.getName.stripPrefix("batch_id=").toLong).sorted
  }

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

  private def probeSet(idx: String, docs: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long)] =
    Streams.probeNearDupIndex(docs, idx, idCol = "doc_id", textCol = "text",
        k = 3, threshold = 0.5)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("near-dup churn with maxBatchDirs wired: bounded dirs, identical content and probes") {
    val src = freshPath(); val idx = freshPath(); val twin = freshPath()
    val seed = (for (c <- 0 until 3; v <- 0 until 2) yield doc(c, v)) ++
      (0 until 4).map(uniq)
    DocStore.insertMany(seed.toDF("doc_id", "text"), src)
    sync(src, idx, maxBatchDirs = 3)
    sync(src, twin) // the uncompacted control follows the same mutations
    // churn: appends, an update, a delete — each polled into both indexes
    (0 until 6).foreach { i =>
      i % 3 match {
        case 0 => DocStore.insertMany(Seq(doc(i % 3, 2 + i / 3))
          .toDF("doc_id", "text"), src)
        case 1 => DocStore.updateMany(spark, src, col("doc_id") === 1001L,
          Map("text" -> lit((0 until 12).map(j => s"u1_${j}_v$i").mkString(" "))))
        case 2 => DocStore.insertMany(Seq(uniq(100 + i)).toDF("doc_id", "text"), src)
      }
      sync(src, idx, maxBatchDirs = 3)
      sync(src, twin)
    }
    // dir count bounded by the policy (the control accumulated one per
    // ingesting poll); the threshold allows up to maxBatchDirs plus the
    // batch the triggering poll just wrote
    for (p <- Seq("keys", "shingles", "matches")) {
      assert(batchDirs(s"$idx/$p").size <= 4,
        s"$p: ${batchDirs(s"$idx/$p")} not bounded")
      assert(batchDirs(s"$twin/$p").size > 4,
        s"control index unexpectedly small: ${batchDirs(s"$twin/$p")}")
    }
    // content identical to the uncompacted twin AND to a fresh one-shot
    val live = DocStore.find(spark, src).select("doc_id", "text")
    val (refK, refS) = referenceKeys(live)
    assert(keySet(idx) == refK && keySet(twin) == refK)
    assert(shingleSet(idx) == refS && shingleSet(twin) == refS)
    assert(matchSet(idx) == matchSet(twin))
    // probes row-identical against both
    val probes = Seq((9000L, (0 until 12).map(i => s"w0_$i").mkString(" ")),
      (9001L, (0 until 12).map(i => s"q_$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = probeSet(idx, probes)
    assert(got == probeSet(twin, probes))
    assert(got.nonEmpty && got.forall(_._1 == 9000L))
  }

  test("explicit compactNearDupIndex folds to one dir per parent; polls continue") {
    val src = freshPath(); val idx = freshPath()
    DocStore.insertMany(((0 until 2).map(v => doc(0, v)) ++
      (0 until 3).map(uniq)).toDF("doc_id", "text"), src)
    sync(src, idx)
    (0 until 3).foreach { i =>
      DocStore.insertMany(Seq(uniq(10 + i)).toDF("doc_id", "text"), src)
      sync(src, idx)
    }
    val (k0, s0, m0) = (keySet(idx), shingleSet(idx), matchSet(idx))
    assert(batchDirs(s"$idx/keys").size == 4)
    val folded = Streams.compactNearDupIndex(spark, idx)
    assert(folded == 9L, s"folded $folded (3 dirs x 3 parents expected)")
    for (p <- Seq("keys", "shingles", "matches"))
      assert(batchDirs(s"$idx/$p") == Seq(4L), batchDirs(s"$idx/$p").toString)
    assert((keySet(idx), shingleSet(idx), matchSet(idx)) == ((k0, s0, m0)))
    // idempotent: a consolidated index folds nothing
    assert(Streams.compactNearDupIndex(spark, idx) == 0L)
    // the next poll matches new arrivals against the CONSOLIDATED content
    DocStore.insertMany(Seq(doc(0, 2)).toDF("doc_id", "text"), src)
    val polled = sync(src, idx)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(polled == Set((0L, 2L), (1L, 2L)), polled.toString)
  }

  test("compaction after a takedown cannot resurrect the removed id") {
    val src = freshPath(); val idx = freshPath()
    DocStore.insertMany(((0 until 3).map(v => doc(0, v)) ++
      (0 until 2).map(uniq)).toDF("doc_id", "text"), src)
    sync(src, idx)
    DocStore.insertMany(Seq(uniq(50)).toDF("doc_id", "text"), src)
    sync(src, idx)
    DocStore.deleteMany(spark, src, Some(col("doc_id") === 1L))
    sync(src, idx) // the delete propagates as an index takedown
    Streams.compactNearDupIndex(spark, idx)
    assert(!keySet(idx).exists(_._3 == 1L))
    assert(!shingleSet(idx).exists(_._1 == 1L))
    assert(!matchSet(idx).exists(p => p._1 == 1L || p._2 == 1L))
    val live = DocStore.find(spark, src).select("doc_id", "text")
    val (refK, refS) = referenceKeys(live)
    assert(keySet(idx) == refK && shingleSet(idx) == refS)
  }

  test("a crashed consolidation heals at the next entry (mid-delete crash)") {
    val src = freshPath(); val idx = freshPath()
    DocStore.insertMany(((0 until 2).map(v => doc(0, v)) ++
      (0 until 3).map(uniq)).toDF("doc_id", "text"), src)
    sync(src, idx)
    (0 until 2).foreach { i =>
      DocStore.insertMany(Seq(uniq(20 + i)).toDF("doc_id", "text"), src)
      sync(src, idx)
    }
    val (k0, s0) = (keySet(idx), shingleSet(idx))
    // replicate the protocol by hand up to a crash in the delete loop:
    // stage the union, commit the intent, delete SOME source dirs, stop
    val keysDir = s"$idx/keys"
    val ids = batchDirs(keysDir)
    assert(ids.size == 3)
    val target = ids.max
    spark.read.parquet(keysDir)
      .filter(col("batch_id").isin(ids: _*)).drop("batch_id")
      .repartition(col("slot"))
      .write.partitionBy("slot").parquet(s"$keysDir/.compact-sim")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(keysDir, "_COMPACT"),
      s"target=$target\nstaging=.compact-sim\n")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$keysDir/batch_id=${ids.head}"))
    // the next index operation heals: complete delete+rename, clear intent
    DocStore.insertMany(Seq(uniq(40)).toDF("doc_id", "text"), src)
    sync(src, idx)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(keysDir, "_COMPACT")))
    assert(batchDirs(keysDir).size == 2) // consolidated + the new poll's
    val live = DocStore.find(spark, src).select("doc_id", "text")
    val (refK, refS) = referenceKeys(live)
    assert(keySet(idx) == refK, "healed keys lost or duplicated content")
    assert(shingleSet(idx) == refS)
    assert(k0.subsetOf(refK) && s0.subsetOf(refS))
    // debris without an intent is AGE-GATED: a FRESH dir may be a live
    // compaction's staging (reads heal concurrently and must not abort
    // it under the compactor) — kept; stale crash debris is reaped
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(keysDir, ".compact-junk"))
    assert(Streams.compactNearDupIndex(spark, idx) >= 0L)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(keysDir, ".compact-junk")),
      "a fresh intent-less staging was reaped — a live compactor would lose its union")
    assert(new java.io.File(s"$keysDir/.compact-junk").setLastModified(
      System.currentTimeMillis() - 25L * 3600 * 1000))
    assert(Streams.compactNearDupIndex(spark, idx) >= 0L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(keysDir, ".compact-junk")))
  }

  // ---- IVF ----------------------------------------------------------------

  private def vec(i: Long): Array[Double] = {
    val c = (i % 3).toInt
    Array.tabulate(4)(j =>
      (if (j == c) 4.0 else 0.5) + ((i * 7 + j * 3) % 5) * 0.1)
  }
  private def corpusDf(ids: Seq[Long]) =
    ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")

  private def indexContent(idx: String): Set[(Long, Long)] =
    spark.read.parquet(idx).select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF churn with maxBatchDirs wired: bounded dirs, identical content, search == brute") {
    val src = freshPath(); val idx = freshPath()
    DocStore.insertMany(corpusDf(0L until 30L), src)
    DocStore.compact(spark, src, targetFiles = 2, format = Some("parquet"))
    val model = Ann.fitIvf(DocStore.find(spark, src), nCells = 3, lloydIters = 2)
    def poll() = Streams.syncIvfIndex(spark, src, idx, model, maxBatchDirs = 2)
    poll()
    (0 until 5).foreach { i =>
      if (i == 3) DocStore.deleteMany(spark, src, Some(col("vec_id") % 9 === 4))
      else DocStore.insertMany(corpusDf((30L + i * 3) until (33L + i * 3)), src)
      poll()
    }
    assert(batchDirs(idx).size <= 3, batchDirs(idx).toString)
    val live = DocStore.find(spark, src)
    assert(indexContent(idx) == live
      .select(col("vec_id"), model.assign(col("embedding")).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val queries = live.filter(col("vec_id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "rk", "vec_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    assert(rows(Ann.ivfSearch(model, spark.read.parquet(idx), queries,
      k = 4, nProbe = 3)) == rows(Ann.bruteForceTopK(live, queries, k = 4)))
  }

  test("explicit compactIvfIndex: identity before/after, stream-built keeps its max dir") {
    val src = freshPath(); val idx = freshPath()
    DocStore.insertMany(corpusDf(0L until 24L), src)
    DocStore.compact(spark, src, targetFiles = 2, format = Some("parquet"))
    val model = Ann.fitIvf(DocStore.find(spark, src), nCells = 3, lloydIters = 2)
    Streams.syncIvfIndex(spark, src, idx, model)
    (0 until 3).foreach { i =>
      DocStore.insertMany(corpusDf((24L + i * 2) until (26L + i * 2)), src)
      Streams.syncIvfIndex(spark, src, idx, model)
    }
    val before = indexContent(idx)
    assert(batchDirs(idx).size == 4)
    assert(Streams.compactIvfIndex(spark, idx) == 3L)
    assert(batchDirs(idx) == Seq(4L))
    assert(indexContent(idx) == before)
    assert(Streams.compactIvfIndex(spark, idx) == 0L) // idempotent
    // further polls keep working against the consolidated index
    DocStore.updateMany(spark, src, col("vec_id") === 2L,
      Map("embedding" -> transform(col("embedding"), x => x * lit(2.0d))))
    assert(Streams.syncIvfIndex(spark, src, idx, model) == 1L)
    assert(indexContent(idx) == DocStore.find(spark, src)
      .select(col("vec_id"), model.assign(col("embedding")).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)

    // STREAM-BUILT index (no _SYNC): the max batch dir may be redelivered
    // by an at-least-once restart, so compaction must leave it alone
    val sIdx = freshPath()
    Streams.ivfBatch(corpusDf(0L until 8L), 1L, sIdx, model, "vec_id", "embedding")
    Streams.ivfBatch(corpusDf(8L until 16L), 2L, sIdx, model, "vec_id", "embedding")
    Streams.ivfBatch(corpusDf(16L until 24L), 3L, sIdx, model, "vec_id", "embedding")
    val sBefore = indexContent(sIdx)
    assert(Streams.compactIvfIndex(spark, sIdx) == 1L) // folds 1,2 -> 2
    assert(batchDirs(sIdx) == Seq(2L, 3L))
    assert(indexContent(sIdx) == sBefore)
    // a redelivery of batch 3 overwrites its own dir — no duplication
    Streams.ivfBatch(corpusDf(16L until 24L), 3L, sIdx, model, "vec_id", "embedding")
    assert(indexContent(sIdx) == sBefore)
  }

  test("50-batch ingest churn: dir count stays bounded throughout, content exact at the end") {
    val idx = freshPath()
    val src = freshPath()
    DocStore.insertMany(corpusDf(0L until 8L), src)
    DocStore.compact(spark, src, targetFiles = 1, format = Some("parquet"))
    val model = Ann.fitIvf(DocStore.find(spark, src), nCells = 3, lloydIters = 2)
    // the long-lived deployment shape the r11 verdict flagged: one batch
    // dir per ingest forever. 50 batches with the policy run every 4
    // folds the tail each time it exceeds the threshold; the count must
    // stay bounded at EVERY step, not just at the end
    var maxDirs = 0
    (1 to 50).foreach { b =>
      Streams.ivfBatch(corpusDf((b * 8L) until (b * 8L + 8L)), b.toLong,
        idx, model, "vec_id", "embedding")
      if (b % 2 == 0) Streams.compactIvfIndex(spark, idx, maxBatchDirs = 4)
      maxDirs = math.max(maxDirs, batchDirs(idx).size)
    }
    assert(maxDirs <= 5, s"dir count reached $maxDirs during the churn")
    assert(batchDirs(idx).size <= 5, batchDirs(idx).toString)
    // every ingested vector present exactly once, in its model cell
    val expect = corpusDf(8L until 408L)
      .select(col("vec_id"), model.assign(col("embedding")).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(indexContent(idx) == expect)
  }

  test("tombstone sidecar folds with the index; live cutoffs keep protecting replays") {
    val idx = freshPath()
    val src = freshPath()
    DocStore.insertMany(corpusDf(0L until 24L), src)
    DocStore.compact(spark, src, targetFiles = 1, format = Some("parquet"))
    val model = Ann.fitIvf(DocStore.find(spark, src), nCells = 3, lloydIters = 2)
    Streams.ivfBatch(corpusDf(0L until 8L), 1L, idx, model, "vec_id", "embedding")
    Streams.ivfBatch(corpusDf(8L until 16L), 2L, idx, model, "vec_id", "embedding")
    // takedown at maxBid=2 -> its tombstone (cutoff 2) is DEAD once
    // batches <= 2 are consolidated; the later one (cutoff 3) stays live
    Streams.removeFromIvfIndex(spark, idx,
      Seq(3L).toDF("vec_id"), "vec_id")
    Streams.ivfBatch(corpusDf(16L until 24L), 3L, idx, model, "vec_id", "embedding")
    Streams.removeFromIvfIndex(spark, idx,
      Seq(17L).toDF("vec_id"), "vec_id")
    def tombFiles(): Seq[String] = {
      val d = new java.io.File(s"$idx/_tombstones")
      Option(d.listFiles()).getOrElse(Array.empty).toSeq.map(_.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith("."))
    }
    assert(tombFiles().size >= 2)
    assert(Streams.compactIvfIndex(spark, idx) == 1L) // folds {1,2}; keeps 3
    assert(tombFiles().size == 1, tombFiles().toString)
    val tombs = spark.read.parquet(s"$idx/_tombstones")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tombs == Set((17L, 3L)), s"dead cutoff not dropped: $tombs")
    // the live tombstone still guards an at-least-once replay of batch 3
    Streams.ivfBatch(corpusDf(16L until 24L), 3L, idx, model, "vec_id", "embedding")
    val ids = indexContent(idx).map(_._1)
    assert(!ids.contains(17L), "replayed batch reinstated a taken-down id")
    assert(!ids.contains(3L))
    assert(ids.size == 22)
  }

  test("swap lock: a live owner blocks heals loudly; a stale lock is broken and healed") {
    val src = freshPath(); val idx = freshPath()
    DocStore.insertMany(((0 until 2).map(v => doc(0, v)) ++
      (0 until 3).map(uniq)).toDF("doc_id", "text"), src)
    sync(src, idx)
    (0 until 2).foreach { i =>
      DocStore.insertMany(Seq(uniq(60 + i)).toDF("doc_id", "text"), src)
      sync(src, idx)
    }
    val keysDir = s"$idx/keys"
    val ids = batchDirs(keysDir)
    val target = ids.max
    // plant a crashed swap: staged union + committed intent
    spark.read.parquet(keysDir)
      .filter(col("batch_id").isin(ids: _*)).drop("batch_id")
      .repartition(col("slot"))
      .write.partitionBy("slot").parquet(s"$keysDir/.compact-sim")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(keysDir, "_COMPACT"),
      s"target=$target\nstaging=.compact-sim\n")
    // ...whose owner still holds a FRESH lock: heals must NOT run the
    // destructive leg concurrently — they wait, then fail loudly
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(keysDir, "_COMPACT.lock"))
    System.setProperty("graft.index.healWaitMs", "200")
    try {
      val e = intercept[java.io.IOException] {
        Streams.compactNearDupIndex(spark, idx)
      }
      assert(e.getMessage.contains("mid-swap layout"), e.getMessage)
      // every original batch dir is still intact — nothing was lost
      assert(batchDirs(keysDir) == ids)
      // the owner crashed: once the lock AGES past its TTL the next heal
      // breaks it and completes the swap — no content loss
      assert(new java.io.File(s"$keysDir/_COMPACT.lock").setLastModified(
        System.currentTimeMillis() - 16L * 60 * 1000))
      DocStore.insertMany(Seq(uniq(80)).toDF("doc_id", "text"), src)
      sync(src, idx)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(keysDir, "_COMPACT")))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(keysDir, "_COMPACT.lock")))
      val live = DocStore.find(spark, src).select("doc_id", "text")
      val (refK, refS) = referenceKeys(live)
      assert(keySet(idx) == refK, "healed keys lost or duplicated content")
      assert(shingleSet(idx) == refS)
    } finally System.clearProperty("graft.index.healWaitMs")
  }

  test("concurrent heals of one crashed intent: one completes, the rest wait; content exact") {
    val src = freshPath(); val idx = freshPath()
    DocStore.insertMany(((0 until 2).map(v => doc(1, v)) ++
      (0 until 3).map(uniq)).toDF("doc_id", "text"), src)
    sync(src, idx)
    (0 until 2).foreach { i =>
      DocStore.insertMany(Seq(uniq(70 + i)).toDF("doc_id", "text"), src)
      sync(src, idx)
    }
    val keysDir = s"$idx/keys"
    val ids = batchDirs(keysDir)
    spark.read.parquet(keysDir)
      .filter(col("batch_id").isin(ids: _*)).drop("batch_id")
      .repartition(col("slot"))
      .write.partitionBy("slot").parquet(s"$keysDir/.compact-sim")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(keysDir, "_COMPACT"),
      s"target=${ids.max}\nstaging=.compact-sim\n")
    // four probes race the heal of the same crashed intent — the r12
    // protocol let two of them run delete+rename concurrently and lose
    // every folded batch; under the lock exactly one completes the swap
    // and the rest wait for the intent to clear, then read
    val probes = Seq((9100L, (0 until 12).map(i => s"w1_$i").mkString(" ")))
      .toDF("doc_id", "text")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence((0 until 4).toList.map(_ =>
        Future(scala.util.Try(probeSet(idx, probes))))), 120.seconds)
    assert(results.forall(_.isSuccess),
      results.collect { case scala.util.Failure(e) => e.getMessage }.toString)
    assert(results.map(_.get).distinct.size == 1)
    assert(results.head.get.nonEmpty && results.head.get.forall(_._1 == 9100L))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(keysDir, "_COMPACT")))
    val live = DocStore.find(spark, src).select("doc_id", "text")
    val (refK, refS) = referenceKeys(live)
    assert(keySet(idx) == refK, "a racing heal lost folded content")
    assert(shingleSet(idx) == refS)
  }

  test("a fenced holder that loses the lock mid-swap aborts; the next heal completes with no loss") {
    val src = freshPath(); val idx = freshPath()
    DocStore.insertMany(((0 until 2).map(v => doc(0, v)) ++
      (0 until 3).map(uniq)).toDF("doc_id", "text"), src)
    sync(src, idx)
    (0 until 2).foreach { i =>
      DocStore.insertMany(Seq(uniq(90 + i)).toDF("doc_id", "text"), src)
      sync(src, idx)
    }
    val keysDir = s"$idx/keys"
    val ids = batchDirs(keysDir)
    // plant a committed swap: staged union + intent, as if a compactor
    // reached its destructive leg
    spark.read.parquet(keysDir)
      .filter(col("batch_id").isin(ids: _*)).drop("batch_id")
      .repartition(col("slot"))
      .write.partitionBy("slot").parquet(s"$keysDir/.compact-sim")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(keysDir, "_COMPACT"),
      s"target=${ids.max}\nstaging=.compact-sim\n")
    // holder A owns the lock (token-bearing); a TTL breaker steals it
    // between A's deletes. A's fence must detect the theft at the next
    // operation and ABORT instead of deleting the dir the thief installs.
    val lockPath = java.nio.file.Paths.get(keysDir, "_COMPACT.lock")
    java.nio.file.Files.writeString(lockPath, "token-A")
    val fs = new org.apache.hadoop.fs.Path(keysDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(keysDir)
    val intent = new org.apache.hadoop.fs.Path(dir, "_COMPACT")
    val lock = new org.apache.hadoop.fs.Path(dir.toString, "_COMPACT.lock")
    val inner = Streams.swapFence(fs, lock, "token-A")
    var calls = 0
    val thieving: () => Unit = () => {
      if (calls == 1) // after A's FIRST delete: the theft window
        java.nio.file.Files.writeString(lockPath, "token-B")
      calls += 1
      inner()
    }
    val e = intercept[java.io.IOException] {
      Streams.completeSwap(fs, dir, intent, thieving, expectStaging = true)
    }
    assert(e.getMessage.contains("lost swap-lock ownership"), e.getMessage)
    // A aborted mid-sequence: the intent is STILL COMMITTED and the
    // staged union intact, so the thief (or any later heal) completes the
    // swap — nothing was lost even though A had already deleted a dir
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(keysDir, "_COMPACT")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(keysDir, ".compact-sim")))
    java.nio.file.Files.delete(lockPath) // the thief's claim, released
    DocStore.insertMany(Seq(uniq(95)).toDF("doc_id", "text"), src)
    sync(src, idx) // entry heal completes the crashed swap
    val live = DocStore.find(spark, src).select("doc_id", "text")
    val (refK, refS) = referenceKeys(live)
    assert(keySet(idx) == refK, "fenced abort + heal lost folded content")
    assert(shingleSet(idx) == refS)
  }

  test("byte-budgeted consolidation: over the budget the fold writes multiple files, rows exact") {
    val src = freshPath(); val idx = freshPath()
    DocStore.insertMany(((0 until 4).map(v => doc(0, v)) ++
      (0 until 4).map(uniq)).toDF("doc_id", "text"), src)
    sync(src, idx)
    (0 until 2).foreach { i =>
      DocStore.insertMany(Seq(doc(0, 4 + i)).toDF("doc_id", "text"), src)
      sync(src, idx)
    }
    val (k0, s0, m0) = (keySet(idx), shingleSet(idx), matchSet(idx))
    def parquetFiles(d: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(d))
    }
    // a 1 KB budget forces every fold over it to split its writers: the
    // unpartitioned matches fold must NOT be a single coalesce(1) task,
    // and a slot past the budget salts across multiple files
    assert(Streams.compactNearDupIndex(spark, idx, maxFileBytes = 1024) > 0L)
    for (p <- Seq("keys", "shingles", "matches"))
      assert(batchDirs(s"$idx/$p").size == 1, batchDirs(s"$idx/$p").toString)
    assert(parquetFiles(s"$idx/matches/batch_id=${batchDirs(s"$idx/matches").head}")
      .size > 1, "matches fold still writes a single file over the byte budget")
    assert(parquetFiles(s"$idx/shingles/batch_id=${batchDirs(s"$idx/shingles").head}")
      .size > batchDirs(s"$idx/shingles").size,
      "partitioned fold did not split past the budget")
    // row-identical content and probes after the multi-file fold
    assert((keySet(idx), shingleSet(idx), matchSet(idx)) == ((k0, s0, m0)))
    val probes = Seq((9200L, (0 until 12).map(i => s"w0_$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = probeSet(idx, probes)
    assert(got.nonEmpty && got.forall(_._1 == 9200L))
  }

  test("tombstones fold on their own trigger even when batch dirs are under the threshold") {
    val idx = freshPath(); val src = freshPath()
    DocStore.insertMany(corpusDf(0L until 24L), src)
    DocStore.compact(spark, src, targetFiles = 1, format = Some("parquet"))
    val model = Ann.fitIvf(DocStore.find(spark, src), nCells = 3, lloydIters = 2)
    Streams.ivfBatch(corpusDf(0L until 16L), 1L, idx, model, "vec_id", "embedding")
    Streams.ivfBatch(corpusDf(16L until 24L), 2L, idx, model, "vec_id", "embedding")
    // takedown-heavy, ingest-light: five takedowns, batch dirs stay at 2
    (0 until 5).foreach { i =>
      Streams.removeFromIvfIndex(spark, idx, Seq(20L + i).toDF("vec_id"), "vec_id")
    }
    def tombFiles(): Seq[String] = {
      val d = new java.io.File(s"$idx/_tombstones")
      Option(d.listFiles()).getOrElse(Array.empty).toSeq.map(_.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith("."))
    }
    assert(tombFiles().size == 5)
    // batch dirs (2) are under maxBatchDirs=4 -> zero dirs folded, but
    // the sidecar STILL folds because its file count exceeds the bound
    assert(Streams.compactIvfIndex(spark, idx, maxBatchDirs = 4) == 0L)
    assert(batchDirs(idx) == Seq(1L, 2L))
    assert(tombFiles().size == 1, tombFiles().toString)
    // all five cutoffs survive (nothing was consolidated under them) and
    // a replay of batch 2 still honors them
    val tombs = spark.read.parquet(s"$idx/_tombstones")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tombs == (0 until 5).map(i => (20L + i, 2L)).toSet, tombs.toString)
    Streams.ivfBatch(corpusDf(16L until 24L), 2L, idx, model, "vec_id", "embedding")
    val present = indexContent(idx).map(_._1)
    assert((20L until 25L).forall(!present.contains(_)))
  }

  test("size-tiered fold: a dominant dir is kept in place, small dirs fold around it, a peer triggers the full merge") {
    val idx = freshPath()
    val model = Ann.fitIvf(corpusDf(0L until 60L), nCells = 3, lloydIters = 2)
    // a DOMINANT batch (the consolidated-index stand-in) plus three small
    // deltas — the 100 TB steady state in miniature. Rewriting the big
    // dir on every fold is exactly the O(index) write amplification the
    // tier gate exists to prevent.
    Streams.ivfBatch(corpusDf(0L until 20000L), 1L, idx, model, "vec_id", "embedding")
    Streams.ivfBatch(corpusDf(20000L until 20050L), 2L, idx, model, "vec_id", "embedding")
    Streams.ivfBatch(corpusDf(20050L until 20100L), 3L, idx, model, "vec_id", "embedding")
    Streams.ivfBatch(corpusDf(20100L until 20150L), 4L, idx, model, "vec_id", "embedding")
    val before = indexContent(idx)
    def files(bid: Long): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$idx/batch_id=$bid"))
        .filter(f => f.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val bigBefore = files(1L)
    // stream-built: cutoff = max - 1 -> eligible {1,2,3}; the tier gate
    // keeps the dominant dir 1 and folds {2,3}
    assert(Streams.compactIvfIndex(spark, idx) == 1L)
    assert(batchDirs(idx) == Seq(1L, 3L, 4L), batchDirs(idx).toString)
    assert(files(1L) == bigBefore, "the dominant dir was rewritten by a tiered fold")
    assert(indexContent(idx) == before)
    // a PEER-SIZED batch arrives: the tier invariant no longer shields
    // dir 1 (it is at most TierFactor x the rest), so the next fold is
    // the full merge — tiering defers O(index) rewrites, never forever
    Streams.ivfBatch(corpusDf(30000L until 50000L), 5L, idx, model, "vec_id", "embedding")
    Streams.ivfBatch(corpusDf(50000L until 50050L), 6L, idx, model, "vec_id", "embedding")
    val before2 = indexContent(idx)
    assert(Streams.compactIvfIndex(spark, idx) == 3L) // {1,3,4,5} -> 5
    assert(batchDirs(idx) == Seq(5L, 6L), batchDirs(idx).toString)
    assert(indexContent(idx) == before2)
  }

  test("maintainAll: ONE call bounds store files and every registered index; TVF drives it") {
    val src = freshPath(); val idx = freshPath(); val vIdx = freshPath()
    def docs(ids: Seq[Int]) = ids.map { u =>
      val (id, text) = uniq(u); (id, text, vec(id))
    }.toDF("doc_id", "text", "embedding")
    DocStore.insertMany(docs(0 until 8), src)
    DocStore.compact(spark, src, targetFiles = 1, format = Some("parquet"))
    val model = Ann.fitIvf(DocStore.find(spark, src)
      .select(col("doc_id").as("vec_id"), col("embedding")),
      nCells = 2, lloydIters = 2)
    def pollIvf() = Streams.syncIvfIndex(spark, src, vIdx, model,
      idCol = "doc_id", embCol = "embedding")
    sync(src, idx) // self-registers kind=neardup against src
    pollIvf()      // self-registers kind=ivf
    // churn: every round appends (small files pile up on the store, batch
    // dirs on BOTH indexes); maintainAll is the ONLY maintenance call —
    // no per-index cron lines, no maxBatchDirs wired into the polls
    (0 until 8).foreach { i =>
      DocStore.insertMany(docs(Seq(100 + i)), src)
      sync(src, idx)
      pollIvf()
      val r = Streams.maintainAll(spark, src,
        maxDataFiles = 3, maxBatchDirs = 2)
      assert(r.indexesFolded.keySet == Set(idx, vIdx),
        s"registry surfaced ${r.indexesFolded.keySet}")
      // bounded THROUGHOUT the churn, not just at the end: store files
      // by the triad, index dirs by the registered folds
      assert(DocStore.find(spark, src).inputFiles.length <= 3)
      for (p <- Seq("keys", "shingles", "matches"))
        assert(batchDirs(s"$idx/$p").size <= 3,
          s"$p: ${batchDirs(s"$idx/$p")} not bounded")
      assert(batchDirs(vIdx).size <= 3, batchDirs(vIdx).toString)
    }
    // nothing lost through 8 rounds of fold-while-following: near-dup
    // content equals a fresh one-shot reference, IVF content equals the
    // live corpus under the pinned model
    val live = DocStore.find(spark, src).select("doc_id", "text")
    val (refK, refS) = referenceKeys(live)
    assert(keySet(idx) == refK && shingleSet(idx) == refS)
    assert(spark.read.parquet(vIdx).select(col("doc_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      DocStore.find(spark, src)
        .select(col("doc_id"), model.assign(col("embedding")).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // an index the operator deleted is pruned from the registry on the
    // next pass instead of being probed forever
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(vIdx))
    val r2 = Streams.maintainAll(spark, src, maxBatchDirs = 2)
    assert(r2.indexesFolded.keySet == Set(idx))
    assert(Streams.registeredIndexes(spark, src) == Seq(("neardup", idx)))
    // the SQL surface drives the same call
    val row = spark.sql(s"SELECT * FROM docstore_maintain_all('$src')")
      .collect().head
    assert(row.schema.fieldNames.toSeq ==
      Seq("compacted", "reclustered", "rehomed", "indexes", "folded"))
    assert(row.getAs[Int]("indexes") == 1)
  }

  test("compact_neardup_index / compact_ivf_index TVFs (SQL maintenance surface)") {
    val src = freshPath(); val idx = freshPath()
    DocStore.insertMany(((0 until 2).map(v => doc(0, v)) ++
      (0 until 2).map(uniq)).toDF("doc_id", "text"), src)
    sync(src, idx)
    DocStore.insertMany(Seq(uniq(30)).toDF("doc_id", "text"), src)
    sync(src, idx)
    val k0 = keySet(idx)
    val folded = spark.sql(s"SELECT * FROM compact_neardup_index('$idx')")
      .head().getLong(0)
    assert(folded == 3L, s"folded $folded") // 1 dir folded away x 3 parents
    assert(keySet(idx) == k0)
    assert(spark.sql(s"SELECT * FROM compact_neardup_index('$idx', 1)")
      .head().getLong(0) == 0L)
  }
}
