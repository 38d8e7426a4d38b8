package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Sessions

/** Measures the streaming drain FLOOR: the fixed cost every st* bench
  * query pays just for being a Structured Streaming query — query
  * start/planning, state-store init, the data micro-batch, the
  * watermark-advance batch, stop — independent of data volume.
  *
  * The probe is an st1-shaped windowed count (file stream + watermark +
  * append to a memory sink) over a FIVE-ROW parquet, so virtually the
  * entire measured time is runtime overhead, not work. Reported as
  * min/median over N reps (SPARK_GRAFT_REPS, default 7).
  *
  * Use: a streaming query's bench time minus this floor is its actual
  * data-dependent cost. `tools/bench_diff.py --floor <sec>` does NOT
  * subtract the floor from st* timings — it SUPPRESSES st* deltas whose
  * absolute size is within 0.5*floor, so run-to-run jitter in the fixed
  * machinery can't read as a large percentage regression while real
  * regressions (bigger than half the floor) still surface.
  */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "7").toInt
    val spark = Sessions.local(appName = "graft-streamfloor")
    import spark.implicits._
    // mirror the st* queries' state-partition sizing (withStatePartitions):
    // per-batch cost includes one state-store commit PER partition, and the
    // floor should measure the configuration the bench actually runs
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8"))

    val dir = java.nio.file.Files.createTempDirectory("graft-floor").toString
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "a", 1.0),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 00:10:02"), "b", 2.0),
        (3L, java.sql.Timestamp.valueOf("2024-01-01 01:00:03"), "a", 3.0),
        (4L, java.sql.Timestamp.valueOf("2024-01-01 02:00:04"), "b", 4.0),
        (5L, java.sql.Timestamp.valueOf("2024-01-01 03:00:05"), "a", 5.0))
      .toDF("user_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    def drainOnce(i: Int): Double = {
      val t0 = System.nanoTime()
      val q = spark.readStream.schema(schema).parquet(dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("append").format("memory")
        .queryName(s"floor_$i").start()
      try q.processAllAvailable() finally q.stop()
      spark.sql(s"DROP TABLE IF EXISTS floor_$i")
      (System.nanoTime() - t0) / 1e9
    }

    drainOnce(0) // warm-up: first query pays one-time codegen/classload
    val times = (1 to reps).map(drainOnce)
    val sorted = times.sorted
    println(f"[floor] reps=${times.map(t => f"$t%5.2f").mkString(" ")}")
    println(f"[floor] min=${sorted.head}%.3f median=${sorted(sorted.size / 2)}%.3f sec")
    spark.stop()
  }
}
