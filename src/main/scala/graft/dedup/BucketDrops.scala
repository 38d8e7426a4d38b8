package graft.dedup

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.util.LongAccumulator

/** Observability for LSH bucket-cap drops (SimHash blocks, MinHash bands,
  * RHP embedding bands).
  *
  * Oversized buckets are a recall cutoff, not an error — but they must
  * never be silent: at corpus scale with a large Hamming radius the block
  * key space collapses and MOST buckets can blow past the cap, turning
  * "dedup ran fine" into "dedup matched almost nothing". The bucket-size
  * frame gets a row-preserving pass that feeds two `LongAccumulator`s
  * (dropped buckets, rows inside them) and WARN-logs once per partition
  * that saw drops. Accumulators — not `Dataset.observe` — because the
  * bucket-count frame is small enough to ride a BroadcastExchange, and
  * CollectMetrics under a broadcast executes outside the action's
  * execution context: its metrics silently never arrive (verified against
  * Spark 4.1). Accumulator updates come from ordinary tasks, broadcast
  * job or not.
  *
  * The pass sits on the tiny post-aggregate frame (one row per bucket),
  * far off the hot path. Counts are at-least-once per physical execution
  * (a re-executed or non-reused subtree re-counts): an observability
  * signal, not an exact metric.
  */
object BucketDrops {

  private val accs = TrieMap.empty[String, (LongAccumulator, LongAccumulator)]

  /** Total dropped buckets/rows across all dedup stages in this process. */
  def totalDroppedBuckets: Long = accs.values.iterator.map(_._1.value.longValue).sum
  def totalDroppedRows: Long = accs.values.iterator.map(_._2.value.longValue).sum

  /** Attach drop counting to a bucket-size frame (`nCol` = per-bucket row
    * count, a non-null long). Call BEFORE filtering out the oversized
    * buckets. Row-preserving; safe under broadcast.
    */
  def observed(counts: DataFrame, nCol: String, maxBucket: Int, what: String): DataFrame = {
    val sc = counts.sparkSession.sparkContext
    val (accB, accR) = accs.getOrElseUpdate(s"${sc.applicationId}/$what", (
      sc.longAccumulator(s"graft.drops.$what.buckets"),
      sc.longAccumulator(s"graft.drops.$what.rows")))
    val idx = counts.schema.fieldIndex(nCol)
    val cap = maxBucket.toLong
    val tag = what
    counts.mapPartitions { it =>
      var localB = 0L
      var localR = 0L
      val mapped = it.map { row =>
        val n = row.getLong(idx)
        if (n > cap) {
          accB.add(1L); accR.add(n)
          localB += 1; localR += n
        }
        row
      }
      new Iterator[org.apache.spark.sql.Row] {
        override def hasNext: Boolean = {
          val h = mapped.hasNext
          if (!h && localB > 0) {
            org.slf4j.LoggerFactory.getLogger(BucketDrops.getClass).warn(
              s"graft.drops.$tag: dropped $localB over-cap bucket(s) covering $localR " +
                s"rows in this partition (maxBucket=$cap); near-dup recall is reduced " +
                "for content in those buckets — raise maxBucket, shrink the radius, " +
                "or exact-dedup degenerate documents upstream")
            localB = 0
          }
          h
        }
        override def next(): org.apache.spark.sql.Row = mapped.next()
      }
    }(Encoders.row(counts.schema))
  }
}
