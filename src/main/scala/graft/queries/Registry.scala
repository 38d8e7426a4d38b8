package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query registry plumbing for the driver's correctness gate.
  *
  * Each entry pairs a Spark implementation with (where SQL-expressible) a
  * DuckDB oracle over the same parquet tables. Column names/aliases MUST
  * match between the two — the driver sorts columns by name before hashing.
  * Every query also ends with a deterministic ORDER BY mirrored in the
  * oracle so row order cannot differ.
  */
object Registry {
  type Q = (SparkSession, String) => DataFrame
  final case class Entry(q: Q, oracle: Option[String])

  def withOracle(q: Q, sql: String): Entry = Entry(q, Some(sql))
  /** Non-SQL-expressible op: driver records a weaker rows-only check. */
  def rowsOnly(q: Q): Entry = Entry(q, None)
}
