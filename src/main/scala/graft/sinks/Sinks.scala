package graft.sinks

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{AuditLog, LoadResult}

/** Sink family (SURVEY.md §2.2), expressed against the file/table layer.
  *
  * The reference's loads are JDBC-specific (staging table + stored-proc
  * sync K2, ON DUPLICATE KEY upsert K3, truncate-reload K4, Excel dead
  * letter K7, audit-log row K6 — /root/reference/dags/CotyData_IPN.py:207-242,
  * :941-952, :896-898, :190, :19-61). The engine keeps the same semantics
  * over parquet paths so they are testable and cluster-portable; the JDBC
  * transport variant lives in graft.sources.Jdbc.
  *
  * Idempotency contract (the reason K2 exists in the reference): staging is
  * truncated before each write and the merge is keyed, so re-running a load
  * leaves the final table unchanged.
  */
object Sinks {

  /** Key-preferring merge: rows from `delta` win over `existing` on `keys`
    * (the reference's SINCRONIZACION_* / ON DUPLICATE KEY semantics).
    */
  def mergeByKey(existing: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    delta.unionByName(existing.join(delta.select(keys.map(col): _*).distinct(),
      keys, "left_anti"))

  /** K2: two-phase staged sync. 1) overwrite staging (truncate+append);
    * 2) merge staging into final by key. Returns rows loaded.
    */
  def stagedSync(spark: SparkSession, df: DataFrame, stagingPath: String,
                 finalPath: String, keys: Seq[String]): LoadResult = {
    val table = finalPath
    try {
      df.write.mode(SaveMode.Overwrite).parquet(stagingPath)
      val staged = spark.read.parquet(stagingPath)
      val merged =
        if (pathExists(spark, finalPath))
          mergeByKey(spark.read.parquet(finalPath), staged, keys)
        else staged
      // materialize before overwriting the input path
      val tmp = finalPath + "__tmp"
      merged.write.mode(SaveMode.Overwrite).parquet(tmp)
      spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(finalPath)
      deletePath(spark, tmp)
      LoadResult(table, staged.count(), ok = true, None)
    } catch {
      case e: Throwable => LoadResult(table, 0L, ok = false, Some(e.getMessage))
    }
  }

  /** K2 at scale: partition-scoped staged sync. The incremental window
    * maps to partition values (e.g. FECHA date), so a replayed load
    * overwrites ONLY the partitions present in the batch — dynamic
    * partition overwrite — instead of rewriting the whole final table
    * like [[stagedSync]]. Idempotent per window by construction.
    */
  def stagedSyncPartitioned(spark: SparkSession, df: DataFrame, finalPath: String,
                            partitionCols: Seq[String]): LoadResult =
    try {
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(finalPath)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      LoadResult(finalPath, df.count(), ok = true, None)
    } catch {
      case e: Throwable => LoadResult(finalPath, 0L, ok = false, Some(e.getMessage))
    }

  /** K3: upsert without a visible staging area. */
  def upsert(spark: SparkSession, df: DataFrame, path: String, keys: Seq[String]): LoadResult =
    stagedSync(spark, df, path + "__staging", path, keys)

  /** K4: truncate-and-reload. */
  def truncateReload(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** K1: plain append, writers bounded like the reference bounds its JDBC
    * batch fan-out (/root/reference/dags/utils.py:40-46).
    */
  def append(df: DataFrame, path: String, maxWriters: Int = 32): Unit =
    df.coalesce(maxWriters).write.mode(SaveMode.Append).parquet(path)

  /** Date/key-partitioned append — the warehouse layout for incremental
    * loads at scale: each daily window lands in its own partition
    * directories, so replays overwrite only the touched partitions and
    * readers prune by partition column.
    */
  def appendPartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                        maxWriters: Int = 32): Unit =
    df.coalesce(maxWriters).write.mode(SaveMode.Append)
      .partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed table write: co-locates join keys so repeated large-large
    * joins on `bucketCols` skip the shuffle entirely (SURVEY.md §4 —
    * "pre-partitioning for co-located joins").
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int = 16): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Training-data shard export: range-partition by `orderCol` into
    * `shards` sorted shards, each file capped at `maxRecordsPerFile` rows.
    * Range partitioning makes shard boundaries globally ordered (every key
    * in shard i precedes shard i+1), so a training loader can stream the
    * directory in filename order and see one global order — and the
    * per-file cap keeps individual files loader-friendly no matter how
    * skewed the range sampling lands. At 100 TB this is one shuffle
    * (range exchange with sampled bounds), then parallel sorted writes.
    */
  def writeSharded(df: DataFrame, path: String, orderCol: String, shards: Int,
                   maxRecordsPerFile: Long = 0L): Unit = {
    val w = df.repartitionByRange(shards, col(orderCol))
      .sortWithinPartitions(orderCol)
      .write.mode(SaveMode.Overwrite)
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(path)
  }

  /** K5: join-based conditional update replacing the reference's row-wise
    * UPDATE loops (/root/reference/dags/CotyData_IPN.py:713-715): rows in
    * `target` matching `updates` on `keys` take the update's values.
    */
  def applyUpdates(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    mergeByKey(target, updates.select(target.columns.map(col): _*), keys)

  /** K7: run a load; on failure dump the batch to a dead-letter path
    * (Excel dump analog, /root/reference/dags/CotyData_IPN.py:190).
    */
  def withDeadLetter(df: DataFrame, deadLetterPath: String, table: String)
                    (load: DataFrame => Long): LoadResult =
    try LoadResult(table, load(df), ok = true, None)
    catch {
      case e: Throwable =>
        df.write.mode(SaveMode.Overwrite).parquet(deadLetterPath)
        LoadResult(table, 0L, ok = false, Some(e.getMessage))
    }

  /** Small-file compaction: rewrite a parquet path into files sized near
    * `targetFileMB`. Incremental appends (K1/appendPartitioned) accumulate
    * small files; at 100 TB unmanaged small files dominate scan planning
    * time, so compaction is a first-class maintenance op.
    */
  def compact(spark: SparkSession, path: String, targetFileMB: Int = 256): Long = {
    val df = spark.read.parquet(path)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = math.max(1L, (bytes / (targetFileMB.toLong << 20)).toLong).toInt
    val tmp = path + "__compact"
    df.coalesce(files).write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(path)
    deletePath(spark, tmp)
    files.toLong
  }

  /** K6: audit-log append (/root/reference/dags/CotyData_IPN.py:19-61). */
  def audit(spark: SparkSession, path: String, log: AuditLog): Unit = {
    import spark.implicits._
    Seq(log).toDS().write.mode(SaveMode.Append).parquet(path)
  }

  def auditFor(result: LoadResult, total: Long, source: String, at: Timestamp): AuditLog =
    AuditLog(result.table, result.rows, total, result.ok,
      result.error.getOrElse(""), at, source)

  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def deletePath(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
