package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Document-store source/sink (S7 scan, K8 write): the engine counterpart
  * of the reference's Mongo collection layer
  * (/root/reference/dags/Conectores_BD.py:152-222) over a JSON-lines path —
  * documents are schemaless, so reads infer the union schema across
  * heterogeneous batches the way a document collection does.
  *
  * Operation map (reference -> engine):
  *  - insertOne/insertMany -> [[insertMany]] (append; one-row frames cover
  *    insertOne)
  *  - findDoc(query)       -> [[find]] (filter pushes into the scan)
  *  - update_many($set)    -> [[updateMany]] (conditional column rewrite)
  *  - deleteManyDocuments  -> [[deleteMany]] — INCLUDING the delete-all
  *    guard (Conectores_BD.py:147-151): an absent filter with protection on
  *    raises instead of emptying the collection. The guard is the one
  *    behavior worth porting verbatim; it exists because an empty Mongo
  *    query deletes everything silently.
  *
  * Mutations rewrite the collection in ONE scan: the new contents are
  * written to a sibling `__new` directory, then swapped in with two
  * `FileSystem.rename` calls — a crash anywhere before the first rename
  * leaves the original collection untouched, and each rename is atomic on
  * HDFS-like filesystems. Matched/deleted counts ride the same pass via
  * `Dataset.observe`, so there is no separate count() scan. On a real
  * cluster this is a table-format job (Mongo/Delta/Iceberg sink); the
  * semantics and guard are what the engine promises.
  */
object DocStore {

  final class DeleteProtectionException extends RuntimeException(
    "deleteMany without a filter would delete every document; " +
      "pass deleteProtection = false to allow it")

  /** K8: append documents; returns rows written. Recovery runs first:
    * appending into a collection stranded at `__old` would otherwise
    * recreate the live path and permanently orphan the stranded data (the
    * next swap deletes `__old`).
    */
  def insertMany(df: DataFrame, path: String): Long = {
    recover(df.sparkSession, path)
    val n = df.count()
    df.write.mode(SaveMode.Append).json(path)
    n
  }

  /** S7: scan with an optional query filter (None = full collection). An
    * empty collection (nothing inserted, or everything deleted) reads as an
    * empty frame — the empty-cursor behavior — rather than a schema
    * inference error. A collection stranded at `__old` by an interrupted
    * swap is restored first, so data loss is never masked as emptiness.
    */
  def find(spark: SparkSession, path: String, filter: Option[Column] = None): DataFrame = {
    recover(spark, path)
    try {
      val docs = spark.read.json(path)
      filter.fold(docs)(docs.filter)
    } catch {
      case _: org.apache.spark.sql.AnalysisException => spark.emptyDataFrame
    }
  }

  /** $set-style conditional update; returns matched-document count. Fields
    * in `set` that don't exist yet are added (null for unmatched docs) —
    * document-store schema evolution. A new field keeps the $set value's
    * type: `when(matched, v)` with no `otherwise` makes the else-branch a
    * null of v's own type (an explicit string-typed null would coerce
    * numeric values to string under when/otherwise type widening).
    */
  def updateMany(spark: SparkSession, path: String, filter: Column,
                 set: Map[String, Column]): Long = {
    recover(spark, path)
    val docs = spark.read.json(path)
    val matched = coalesce(filter, lit(false))
    // The observation sits BELOW the $set projections: `matched` must be
    // evaluated on pre-update values, or a $set that writes a column the
    // filter reads (set status -> 'done' where status === 'pending')
    // would count the post-update rows and report 0.
    val obs = Observation()
    val base = docs.observe(obs, count(when(matched, lit(1))).as("matched"))
    val updated = set.foldLeft(base) { case (d, (k, v)) =>
      if (d.columns.contains(k)) d.withColumn(k, when(matched, v).otherwise(col(k)))
      else d.withColumn(k, when(matched, v))
    }
    swapIn(spark, updated, path)
    obs.get("matched").asInstanceOf[Long]
  }

  /** Filtered delete; returns deleted count. `filter = None` (the empty
    * Mongo query) is REFUSED while `deleteProtection` is on.
    */
  def deleteMany(spark: SparkSession, path: String, filter: Option[Column],
                 deleteProtection: Boolean = true): Long = {
    if (deleteProtection && filter.isEmpty) throw new DeleteProtectionException
    recover(spark, path)
    val docs = spark.read.json(path)
    filter match {
      case None =>
        // Guard-off delete-all: the kept-set is provably empty, so the
        // optimizer prunes the scan (and any CollectMetrics on it) to an
        // empty LocalRelation — count directly, then swap in emptiness.
        val n = docs.count()
        swapIn(spark, docs.filter(lit(false)), path)
        n
      case Some(f) =>
        val hit = coalesce(f, lit(false))
        val obs = Observation()
        swapIn(spark,
          docs.observe(obs, count(when(hit, lit(1))).as("deleted")).filter(!hit), path)
        obs.get("deleted").asInstanceOf[Long]
    }
  }

  /** Single-pass, crash-safe collection rewrite: materialize `df` (which
    * reads the live `path`) into `path__new`, then swap via rename. Any
    * failure while computing/writing `__new` leaves the collection intact;
    * the swap itself is two atomic renames with a rollback on the second.
    */
  /** Crash recovery: a death between swapIn's two renames leaves the
    * collection only at `path__old` (the fresh data still at `__new`).
    * Restore `__old` as the live collection — the interrupted mutation
    * reads as never-happened, not as an empty collection. `__new` is
    * untrusted (possibly partial) and is reclaimed by the next swap.
    */
  private def recover(spark: SparkSession, path: String): Unit = {
    val live = new Path(path)
    val retired = new Path(path + "__old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(live) && fs.exists(retired) && !fs.rename(retired, live))
      throw new java.io.IOException(s"docstore recover: cannot restore $retired")
  }

  private def swapIn(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val live = new Path(path)
    val fresh = new Path(path + "__new")
    val retired = new Path(path + "__old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(fresh, true)
    df.write.mode(SaveMode.Overwrite).json(fresh.toString)
    fs.delete(retired, true)
    if (!fs.rename(live, retired))
      throw new java.io.IOException(s"docstore swap: cannot retire $live")
    if (!fs.rename(fresh, live)) {
      fs.rename(retired, live) // roll back so the collection stays readable
      throw new java.io.IOException(s"docstore swap: cannot promote $fresh")
    }
    fs.delete(retired, true)
    ()
  }
}
