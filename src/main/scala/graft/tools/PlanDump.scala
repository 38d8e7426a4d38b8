package graft.tools

import graft.core.Sessions

/** Dump executed plans for the named queries (debugging aid for plan pins). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-plandump")
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
