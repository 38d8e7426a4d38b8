package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (median/MAD) per-group outlier detection — the quality filter a
  * corpus pipeline runs where mean/stddev would be dragged by the very
  * outliers it is hunting.
  *
  * Semantics are fully discrete so the result is oracle-exact on integer
  * inputs: the group median is the value at rank ceil(n/2) under
  * (value, tieBreak) — the lower median, quantile_disc-style like
  * [[Ranks.groupOrderStatistics]] — and the MAD is the same statistic over
  * the absolute deviations. A row is an outlier when dev > k * MAD, all in
  * integer arithmetic.
  *
  * Scale: two group-partitioned windows (one task per hash bucket of
  * groups, same distribution story as [[Ranks.groupOrderStatistics]]) and
  * two broadcast joins of per-group scalars (one row per group). The
  * caveat is a single giant group — there the global-rank machinery in
  * [[Ranks.orderStatistics]] on that group's slice is the fallback.
  *
  * The reference has no outlier stage (its quality gates are null/row
  * checks, /root/reference/dags/utils/dataframe_checks.py); this is the
  * brief's quality-scoring extension.
  */
object Robust {

  /** Adds med, dev, mad, is_outlier to `df` (one output row per input
    * row). `k` is the MAD multiple that flags an outlier.
    */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  tieBreak: Column, k: Int): DataFrame = {
    require(k > 0, s"MAD multiple must be positive, got $k")
    val grp = groupCols.map(col)

    def groupLowerMedian(in: DataFrame, c: String, out: String): DataFrame = {
      val w = Window.partitionBy(grp: _*).orderBy(col(c), tieBreak)
      in.withColumn("__rk", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(grp: _*)))
        // integer ceil(n/2) = (n+1) div 2; exact in double far past any n
        .filter(col("__rk") === floor((col("__n") + 1) / 2).cast("long"))
        .select(grp :+ col(c).as(out): _*)
    }

    val med = groupLowerMedian(df, valueCol, "med")
    val withDev = df.join(broadcast(med), groupCols)
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = groupLowerMedian(withDev, "dev", "mad")
    withDev.join(broadcast(mad), groupCols)
      .withColumn("is_outlier",
        (col("dev") > col("mad") * k).cast("long"))
  }

  /** Per-group winsorization at the discrete quartiles: clips each value
    * into [q1, q3] where q1/q3 are the values at ranks ceil(n/4) and
    * ceil(3n/4) under (value, tieBreak) — the same quantile_disc
    * convention as [[madOutliers]]'s medians, with the ranks in pure
    * integer arithmetic ((n+3) div 4) so no float percentile can disagree
    * with an oracle. Adds lo, hi, clipped; one group window + one
    * broadcast join of per-group bounds.
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                tieBreak: Column): DataFrame = {
    val grp = groupCols.map(col)
    val w = Window.partitionBy(grp: _*).orderBy(col(valueCol), tieBreak)
    val bounds = df
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(grp: _*)))
      .filter(col("__rk") === floor((col("__n") + 3) / 4).cast("long") ||
              col("__rk") === floor((col("__n") * 3 + 3) / 4).cast("long"))
      .groupBy(grp: _*)
      .agg(min(valueCol).as("lo"), max(valueCol).as("hi"))
    df.join(broadcast(bounds), groupCols)
      .withColumn("clipped", least(greatest(col(valueCol), col("lo")), col("hi")))
  }
}
