package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: fold a new batch's PARTIAL
  * aggregate into a stored aggregate instead of re-aggregating history —
  * the only aggregation shape that stays O(batch) as the table grows to
  * 100 TB. Works for any re-aggregatable combine (sum-of-sums,
  * sum-of-counts, min-of-mins, max-of-maxs); averages must be stored as
  * (sum, count) pairs and divided at read time.
  *
  * The reference recomputes aggregates per run over the re-pulled window
  * (/root/reference/dags/dag_maestros.py:42); this is the engine-side
  * upgrade that makes the daily pass independent of history size.
  */
object Incremental {

  /** Merge a stored aggregate with a delta aggregate of the SAME schema:
    * group back on `keys`, combining each non-key column with `combines`
    * (default sum — correct for sums and counts).
    */
  def mergeAggregate(stored: DataFrame, deltaAgg: DataFrame, keys: Seq[String],
                     combines: Map[String, Column => Column] = Map.empty): DataFrame = {
    val valueCols = stored.columns.filterNot(keys.contains).toSeq
    require(valueCols.nonEmpty, "mergeAggregate: nothing to combine")
    val aggs = valueCols.map { c =>
      combines.getOrElse(c, (x: Column) => sum(x))(col(c)).as(c)
    }
    stored.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Delta rows of a join view V = A ⋈ B when A grows by dA and B by dB:
    * dA⋈B0 ∪ A0⋈dB ∪ dA⋈dB (the standard IVM delta algebra for inserts).
    * Each term is delta-sized on at least one side, so maintenance cost
    * is O(delta), not O(history) — feed the result's partial aggregate to
    * [[mergeAggregate]]. Deletes are the caller's concern (run the same
    * algebra with the removed rows and subtract).
    */
  def deltaJoin(a0: DataFrame, dA: DataFrame, b0: DataFrame, dB: DataFrame)
               (join: (DataFrame, DataFrame) => DataFrame): DataFrame =
    join(dA, b0).unionByName(join(a0, dB)).unionByName(join(dA, dB))
}
