package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Exact heavy hitters in two scan-shaped passes — the frequent-items
  * query a 100 TB corpus can't answer with a plain groupBy (one partial
  * row per distinct key per task; at billions of distinct keys the
  * shuffle IS the problem, the same regime [[Sketch]] addresses for
  * point counts).
  *
  * Pass 1 runs Misra-Gries (Misra & Gries 1982; merge analysis in
  * Agarwal et al., "Mergeable Summaries", PODS 2012) independently per
  * partition: `budget` counters of bounded driver-free state, emitting at
  * most `budget` candidate keys per partition. The guarantee that makes
  * the candidates trustworthy: a key with global count > N/(budget+1)
  * must, by pigeonhole, exceed its partition's N_p/(budget+1) somewhere,
  * and MG never evicts such a key — so candidates ⊇ every key at or above
  * the `minFraction` threshold whenever budget >= 1/minFraction (enforced
  * strictly, so even exact-boundary keys survive). The summaries (at most
  * budget+1 rows per partition, with each partition's row count riding
  * along so the total costs no extra scan) collect to the driver as
  * bounded model state. Pass 2 then counts
  * ONLY the candidates exactly (broadcast
  * semi-join prune, partial-combine groupBy over a bounded key set) and
  * applies the threshold. Output is exact — gate-oracle-able against a
  * plain GROUP BY ... HAVING — while no stage ever holds more than
  * budget-many counters per task or shuffles more than candidate keys.
  *
  * The reference engine's only frequency tool is pandas value_counts
  * (driver-bound); this is the distributed restatement.
  */
object HeavyHitters {

  /** Per-partition MG summaries of `keyed` (a single-column frame):
    * marker rows `(null, partitionCount, true)` carry each partition's row
    * count so the total costs no extra scan; counter rows
    * `(key, mgCount, false)` carry at most `budget` candidates per
    * partition. Bounded collect: <= budget+1 rows per partition — the
    * same model-state class as an IVF codebook.
    */
  private[graft] def partitionSummaries(keyed: DataFrame, budget: Int): Array[Row] =
    keyed.rdd.mapPartitions { it =>
      val counters = new java.util.HashMap[Any, Long](budget * 2)
      var n = 0L
      while (it.hasNext) {
        val k = it.next().get(0)
        n += 1L
        val cur = counters.get(k)
        if (cur > 0L) counters.put(k, cur + 1L)
        else if (counters.size < budget) counters.put(k, 1L)
        else {
          // decrement-all is amortized O(1) per row: each decrement pays
          // back an earlier increment, so total work is linear
          val e = counters.entrySet().iterator()
          while (e.hasNext) {
            val entry = e.next()
            if (entry.getValue <= 1L) e.remove()
            else entry.setValue(entry.getValue - 1L)
          }
        }
      }
      val out = new Array[Row](counters.size + 1)
      out(0) = Row(null, n, true) // partition-count marker
      val e = counters.entrySet().iterator()
      var i = 1
      while (e.hasNext) { val en = e.next(); out(i) = Row(en.getKey, en.getValue, false); i += 1 }
      out.iterator
    }.collect()

  /** Merge MG counters into `acc` under the mergeable-summaries rule
    * (Agarwal et al., PODS 2012): sum counts keywise; if more than
    * `budget` counters remain, subtract the (budget+1)-th largest count
    * from every counter and drop the non-positives. The undercount stays
    * <= n/(budget+1) for the TOTAL stream folded in, whatever the merge
    * tree — what makes per-partition and per-micro-batch summaries
    * composable into one bounded driver-held summary.
    */
  private[graft] def mgMergeInto(acc: java.util.HashMap[Any, Long],
                                 other: Iterator[(Any, Long)],
                                 budget: Int): Unit = {
    other.foreach { case (k, c) => acc.put(k, acc.getOrDefault(k, 0L) + c) }
    if (acc.size > budget) {
      val vals = new Array[Long](acc.size)
      val it = acc.values().iterator()
      var i = 0
      while (it.hasNext) { vals(i) = it.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - budget - 1) // (budget+1)-th largest
      val e = acc.entrySet().iterator()
      while (e.hasNext) {
        val entry = e.next()
        if (entry.getValue <= sub) e.remove()
        else entry.setValue(entry.getValue - sub)
      }
    }
  }

  /** Pass 2: exact counts of `keyed`'s rows over the (bounded, broadcast)
    * candidate set only, thresholded at `minFraction * total`.
    */
  private[graft] def exactOverCandidates(spark: SparkSession, keyed: DataFrame,
                                         candVals: Array[Any], keyType: DataType,
                                         minFraction: Double, total: Long,
                                         outKey: String): DataFrame = {
    val candKeys = spark.createDataFrame(
      java.util.Arrays.asList(candVals.map(Row(_)): _*),
      StructType(Seq(StructField(outKey, keyType))))
    keyed.join(broadcast(candKeys), Seq(outKey))
      .groupBy(outKey)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(minFraction) * lit(total))
      .withColumn("frac", col("cnt").cast("double") / lit(total).cast("double"))
  }

  private[graft] def requireBudget(minFraction: Double, budget: Int): Unit = {
    require(minFraction > 0.0 && minFraction <= 1.0,
      s"minFraction must be in (0, 1], got $minFraction")
    // STRICT bound (budget >= 1/minFraction, not budget+1): MG's undercount
    // can reach exactly N/(budget+1), so a key sitting exactly AT the
    // threshold needs one unit of slack to provably survive pass 1
    require(budget >= 1.0 / minFraction,
      s"budget $budget too small: the candidate guarantee needs " +
        s"budget >= 1/minFraction = ${1.0 / minFraction}")
  }

  /** Keys of `key` whose exact count is >= minFraction * rowcount, with
    * the exact count and fraction. Key column keeps its original type.
    * NULL keys are excluded from the output (the equi-join in the verify
    * pass cannot match them) — unlike SQL's GROUP BY, which would report a
    * NULL group; pre-filter or fill nulls if they can be heavy.
    */
  def heavyHitters(df: DataFrame, key: Column, minFraction: Double,
                   budget: Int = 256, outKey: String = "k"): DataFrame = {
    requireBudget(minFraction, budget)
    val spark = df.sparkSession
    val keyed = df.select(key.as(outKey))
    val keyType = keyed.schema.head.dataType
    val summary = partitionSummaries(keyed, budget)
    val total = summary.iterator.filter(_.getBoolean(2)).map(_.getLong(1)).sum
    val candVals = summary.iterator.filterNot(_.getBoolean(2)).map(_.get(0))
      .toArray.distinct
    exactOverCandidates(spark, keyed, candVals, keyType, minFraction, total, outKey)
  }
}
