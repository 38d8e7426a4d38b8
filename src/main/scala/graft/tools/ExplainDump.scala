package graft.tools

import graft.core.Sessions

/** Write `.explain("formatted")` for the named queries to
  * `<outDir>/<query>_<suffix>.txt` — the optimization-round evidence files
  * (plans/rNN/<query>_before.txt / _after.txt). Usage:
  *   runMain graft.tools.ExplainDump <outDir> <suffix> <query> [query ...]
  * Building a lifecycle query's frame executes its setup side effects
  * (DocStore scripts, stream drains); the dumped plan is the plan of the
  * RETURNED frame, the one the bench's final action executes.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <suffix> <query>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-explaindump")
    for (name <- args.drop(2)) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[explain] wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
