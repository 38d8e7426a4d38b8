package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-generated star schema (TESTDATA.md).
  *
  * Columnar parquet scans give us what the reference's `SELECT` lists and
  * `usecols` hand-rolled (column pruning, SURVEY.md §4) for free — Catalyst
  * pushes projections and predicates into the scan.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS) — surfaced as nano-epoch long via
    * spark.sql.legacy.parquet.nanosAsLong, converted here to TimestampType
    * with integer division (floor to micros, matching DuckDB's ns->us read).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Rebalance a scan whose split count is below the cluster's parallelism
    * before CPU-heavy per-row work (interpreted higher-order lambdas,
    * generators). A small parquet file is one row-group = one partition =
    * one thread no matter how many cores exist; at real scale the scan has
    * thousands of splits and this is a no-op — the condition makes the
    * shuffle pay only when the input is pathologically under-split.
    * (`.rdd.getNumPartitions` plans the scan but runs no job.)
    */
  def spreadForCpu(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
