package graft.tools

import graft.core.Sessions

/** Focused micro-bench: run only the named queries (args) N times each
  * against SPARK_GRAFT_SF_DIR, print every run's time — for root-causing
  * individual bench deltas without the full suite.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = Sessions.local(appName = "graft-microbench")
    graft.core.Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().count()
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${times.map(t => f"$t%6.2f").mkString(" ")}  min=${times.min}%6.2f")
    }
    spark.stop()
  }
}
