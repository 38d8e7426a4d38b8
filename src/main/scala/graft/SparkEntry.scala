package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Behavior, Corpus, DedupSim, Extras, Flagship, Graphs, Learn, Registry, Relational, TextDocs}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's correctness surface: one entry per implemented
  * operator from SURVEY.md §2 (names carry the operator IDs), each paired in
  * `oracleSql` with an equivalent DuckDB statement over the same parquet
  * tables. Entries without an oracle are non-SQL-expressible ops (rows-only
  * check).
  */
object SparkEntry {

  private val registry: Seq[(String, Registry.Entry)] =
    Relational.defs ++ Analytics.defs ++ TextDocs.defs ++ DedupSim.defs ++
      Extras.defs ++ Flagship.defs ++ Corpus.defs ++ Graphs.defs ++
      Behavior.defs ++ Learn.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("pipe_sales_details")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, e) => n -> e.q }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (n, Registry.Entry(_, Some(sql))) => n -> sql }.toMap
}
