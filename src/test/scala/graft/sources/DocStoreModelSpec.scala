package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Model-based property test: a seeded-random sequence of DocStore
  * operations (insert / update / delete / compact / maybeCompact /
  * format migration / an append RACING a mutation) runs against BOTH the
  * store and a driver-side reference map; after every mutation the live
  * view must equal the model exactly, and a CDC-replicated FOLLOWER
  * (cursor polls applied via [[DocStore.applyChanges]]) must converge to
  * the same state. This is the interleaving coverage the scenario tests
  * can't enumerate — e.g. update-after-append-after-parquet-migration,
  * delete-to-empty then re-insert, a salvaged straggler later updated,
  * compacted, and CDC-diffed. The raced append's model semantics are the
  * salvage protocol's linearization: the mutation applies to the
  * PRE-append state, the appended rows then land untransformed.
  * Deterministic seed: a red run reproduces.
  */
class DocStoreModelSpec extends SparkTestBase {
  import spark.implicits._

  private def freshPath() = {
    val d = java.nio.file.Files.createTempDirectory("graft-docstore-model").toString
    new java.io.File(d).delete()
    d
  }

  test("30 random ops: live view == reference model; CDC follower converges") {
    val rnd = new scala.util.Random(20260814L)
    val path = freshPath()
    val follower = freshPath()
    var model = Map.empty[Long, (String, Long)] // id -> (v, n)
    var nextId = 0L

    def df(rows: Seq[(Long, String, Long)]) = rows.toDF("id", "v", "n")
    def liveState(p: String): Map[Long, (String, Long)] =
      DocStore.find(spark, p) match {
        case d if d.columns.contains("id") =>
          d.select("id", "v", "n").collect()
            .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
        case _ => Map.empty
      }

    // seed so the CDC cursor has a generational collection to start from
    val seed = (0 until 4).map { _ =>
      nextId += 1; (nextId, s"v$nextId", nextId * 10)
    }
    DocStore.insertMany(df(seed), path)
    model ++= seed.map(t => t._1 -> ((t._2, t._3)))
    var cursor = Option.empty[DocStore.DocCursor]
    cursor = Some(DocStore.replicate(spark, path, follower, "id", None))

    for (step <- 1 to 30) {
      rnd.nextInt(7) match {
        case 0 | 1 => // append 1-3 docs
          val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
            nextId += 1; (nextId, s"v$nextId", nextId * 10)
          }
          DocStore.insertMany(df(rows), path)
          model ++= rows.map(t => t._1 -> ((t._2, t._3)))
        case 2 if model.nonEmpty => // update a random existing id
          val id = model.keys.toSeq.sorted.apply(rnd.nextInt(model.size))
          val nv = s"u$step"
          val matched = DocStore.updateMany(spark, path, col("id") === id,
            Map("v" -> lit(nv)), retain = 6)
          assert(matched == 1, s"step $step: update matched $matched")
          model += id -> ((nv, model(id)._2))
        case 3 if model.nonEmpty => // delete a random existing id
          val id = model.keys.toSeq.sorted.apply(rnd.nextInt(model.size))
          val n = DocStore.deleteMany(spark, path, Some(col("id") === id),
            retain = 6)
          assert(n == 1, s"step $step: delete removed $n")
          model -= id
        case 4 => // compact, sometimes flipping the storage format
          val fmt = rnd.nextInt(3) match {
            case 0 => Some("parquet")
            case 1 => Some("json")
            case _ => None
          }
          DocStore.compact(spark, path, targetFiles = 1 + rnd.nextInt(3),
            retain = 6, format = fmt)
        case 5 => // append RACING a mutation: the salvage protocol's
          // linearization, model-exact — the mutation sees the pre-append
          // state; the appended rows land untransformed after it
          val rows = (0 until 1 + rnd.nextInt(2)).map { _ =>
            nextId += 1; (nextId, s"v$nextId", nextId * 10)
          }
          val mutId = if (model.isEmpty) None
            else Some(model.keys.toSeq.sorted.apply(rnd.nextInt(model.size)))
          val doUpdate = rnd.nextBoolean()
          DocStore.insertManySeamed(df(rows), path,
            afterStage = () => mutId.foreach { id =>
              if (doUpdate) {
                assert(DocStore.updateMany(spark, path, col("id") === id,
                  Map("v" -> lit(s"r$step")), retain = 6) == 1)
              } else {
                assert(DocStore.deleteMany(spark, path,
                  Some(col("id") === id), retain = 6) == 1)
              }
            },
            beforeVisibilityCheck = () => ())
          mutId.foreach { id =>
            if (doUpdate) model += id -> ((s"r$step", model(id)._2))
            else model -= id
          }
          model ++= rows.map(t => t._1 -> ((t._2, t._3)))
        case _ => // small-files policy (often a no-op)
          DocStore.maybeCompact(spark, path, maxDataFiles = 4,
            targetFiles = 2, retain = 6)
      }
      assert(liveState(path) == model, s"step $step: live view diverged")
      // follower poll every few steps — retain = 6 above keeps the cursor
      // inside the retention window between polls
      if (step % 3 == 0) {
        cursor = Some(DocStore.replicate(spark, path, follower, "id", cursor))
        assert(liveState(follower) == model, s"step $step: follower diverged")
      }
    }
    // final convergence
    cursor = Some(DocStore.replicate(spark, path, follower, "id", cursor))
    assert(liveState(follower) == model, "final follower state diverged")
    assert(model.nonEmpty) // the walk exercised real content
  }
}
