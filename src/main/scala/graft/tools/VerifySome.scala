package graft.tools

import java.nio.file.{Files, Paths}
import graft.core.Sessions

/** Subset correctness dump: like graft.Verify but only for the named
  * queries — `runMain graft.tools.VerifySome <sfDir> <outDir> q1 q2 ...`
  * then `python3 tools/validate.py <sfDir> <outDir>` checks just those.
  * Keeps the new-query iteration loop seconds-long instead of running all
  * 160 registered queries per attempt.
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = Sessions.local(appName = "graft-verify-some")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
