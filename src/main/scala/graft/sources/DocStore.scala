package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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
  * Mutations rewrite the path via a tmp materialization (same pattern as
  * Sinks.stagedSync) — on a real cluster this is a table-format job
  * (Mongo/Delta/Iceberg sink); the semantics and guard are what the engine
  * promises.
  */
object DocStore {

  final class DeleteProtectionException extends RuntimeException(
    "deleteMany without a filter would delete every document; " +
      "pass deleteProtection = false to allow it")

  /** K8: append documents; returns rows written. */
  def insertMany(df: DataFrame, path: String): Long = {
    val n = df.count()
    df.write.mode(SaveMode.Append).json(path)
    n
  }

  /** S7: scan with an optional query filter (None = full collection). An
    * empty collection (nothing inserted, or everything deleted) reads as an
    * empty frame — the empty-cursor behavior — rather than a schema
    * inference error.
    */
  def find(spark: SparkSession, path: String, filter: Option[Column] = None): DataFrame =
    try {
      val docs = spark.read.json(path)
      filter.fold(docs)(docs.filter)
    } catch {
      case _: org.apache.spark.sql.AnalysisException => spark.emptyDataFrame
    }

  /** $set-style conditional update; returns matched-document count. Fields
    * in `set` that don't exist yet are added (null for unmatched docs) —
    * document-store schema evolution.
    */
  def updateMany(spark: SparkSession, path: String, filter: Column,
                 set: Map[String, Column]): Long = {
    val docs = spark.read.json(path)
    val matched = coalesce(filter, lit(false))
    val updated = set.foldLeft(docs) { case (d, (k, v)) =>
      val existing = if (d.columns.contains(k)) col(k) else lit(null).cast("string")
      d.withColumn(k, when(matched, v).otherwise(existing))
    }
    val n = docs.filter(matched).count()
    rewrite(spark, updated, path)
    n
  }

  /** Filtered delete; returns deleted count. `filter = None` (the empty
    * Mongo query) is REFUSED while `deleteProtection` is on.
    */
  def deleteMany(spark: SparkSession, path: String, filter: Option[Column],
                 deleteProtection: Boolean = true): Long = {
    if (deleteProtection && filter.isEmpty) throw new DeleteProtectionException
    val docs = spark.read.json(path)
    val hit = coalesce(filter.getOrElse(lit(true)), lit(false))
    val n = docs.filter(hit).count()
    rewrite(spark, docs.filter(!hit), path)
    n
  }

  private def rewrite(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val tmp = path + "__tmp"
    df.write.mode(SaveMode.Overwrite).json(tmp)
    // explicit schema: a delete-to-empty rewrite has zero rows, which JSON
    // schema inference cannot round-trip
    spark.read.schema(df.schema).json(tmp).write.mode(SaveMode.Overwrite).json(path)
    val p = new org.apache.hadoop.fs.Path(tmp)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }
}
