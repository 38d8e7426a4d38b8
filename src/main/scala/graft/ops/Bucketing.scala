package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the shuffle-elimination lever for repeated
  * joins/aggregations on the same key: both sides hash-partition into the
  * same `nBuckets` AT WRITE TIME, so every later equi-join or groupBy on
  * that key reads co-located buckets and plans with ZERO exchange. At
  * 100 TB this turns the recurring fact-fact join (the one shuffle AQE
  * can't remove) into a scan-local merge; the write-side cost is paid
  * once.
  *
  * The reference re-shuffles per run by construction (pandas merges,
  * /root/reference/dags/Funciones_CotyData.py:200-231); bucketing is the
  * engine-side answer for its recurring daily joins on stable keys.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table (parquet under the
    * session warehouse). Buckets are hash(key) % nBuckets — Spark's own
    * bucket spec, honored by the scan planner.
    */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int, key: String): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, key).sortBy(key).saveAsTable(table)

  /** Equi-join two same-bucketed tables — plans with no Exchange on
    * either side (pinned in BucketingSpec).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
