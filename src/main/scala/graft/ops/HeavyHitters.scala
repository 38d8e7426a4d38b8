package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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

  /** Keys of `key` whose exact count is >= minFraction * rowcount, with
    * the exact count and fraction. Key column keeps its original type.
    * NULL keys are excluded from the output (the equi-join in the verify
    * pass cannot match them) — unlike SQL's GROUP BY, which would report a
    * NULL group; pre-filter or fill nulls if they can be heavy.
    */
  def heavyHitters(df: DataFrame, key: Column, minFraction: Double,
                   budget: Int = 256, outKey: String = "k"): DataFrame = {
    require(minFraction > 0.0 && minFraction <= 1.0,
      s"minFraction must be in (0, 1], got $minFraction")
    // STRICT bound (budget >= 1/minFraction, not budget+1): MG's undercount
    // can reach exactly N_p/(budget+1), so a key sitting exactly AT the
    // threshold needs one unit of slack to provably survive pass 1
    require(budget >= 1.0 / minFraction,
      s"budget $budget too small: the candidate guarantee needs " +
        s"budget >= 1/minFraction = ${1.0 / minFraction}")
    val spark = df.sparkSession
    val keyed = df.select(key.as(outKey))
    val keyType = keyed.schema.head.dataType

    // pass 1: per-partition MG summaries, with the partition's row count
    // riding along as a marker row — the total must not cost a third scan.
    // The decrement-all step is amortized O(1) per row: each decrement
    // pays back an earlier increment, so total work is linear.
    val summary = keyed.rdd.mapPartitions { it =>
      val counters = new java.util.HashMap[Any, Long](budget * 2)
      var n = 0L
      while (it.hasNext) {
        val k = it.next().get(0)
        n += 1L
        val cur = counters.get(k)
        if (cur > 0L) counters.put(k, cur + 1L)
        else if (counters.size < budget) counters.put(k, 1L)
        else {
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
    }.collect() // bounded: <= budget+1 rows per partition — model state
    val total = summary.iterator.filter(_.getBoolean(2)).map(_.getLong(1)).sum
    val candVals = summary.iterator.filterNot(_.getBoolean(2)).map(_.get(0))
      .toArray.distinct
    val candKeys = spark.createDataFrame(
      java.util.Arrays.asList(candVals.map(Row(_)): _*),
      StructType(Seq(StructField(outKey, keyType))))

    // pass 2: exact counts over candidates only, threshold on the total
    keyed.join(broadcast(candKeys), Seq(outKey))
      .groupBy(outKey)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(minFraction) * lit(total))
      .withColumn("frac", col("cnt").cast("double") / lit(total).cast("double"))
  }
}
