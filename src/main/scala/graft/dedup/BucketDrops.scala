package graft.dedup

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.LongAccumulator

/** Observability for LSH bucket-cap drops (SimHash blocks, MinHash bands,
  * RHP embedding bands).
  *
  * Oversized buckets are a recall cutoff, not an error — but they must
  * never be silent: at corpus scale with a large Hamming radius the block
  * key space collapses and MOST buckets can blow past the cap, turning
  * "dedup ran fine" into "dedup matched almost nothing". The cap filter
  * itself counts what it rejects into two `LongAccumulator`s (dropped
  * buckets, rows inside them) and WARN-logs per task that saw drops.
  *
  * Why this shape and not the obvious ones:
  *  - `Dataset.observe`/CollectMetrics: the bucket-count frame is small
  *    enough to ride a BroadcastExchange, and CollectMetrics under a
  *    broadcast executes outside the action's execution context — its
  *    metrics silently never arrive (verified against Spark 4.1).
  *  - `mapPartitions`: a row-preserving pass costs a full
  *    serialize/deserialize boundary and breaks whole-stage codegen right
  *    between the aggregate and the join (~0.5 s per dedup query at
  *    sf0.1, measured).
  * The counting predicate is a `CodegenFallback` expression evaluated
  * once per BUCKET (the tiny post-aggregate frame), so the plan shape,
  * size statistics, and broadcast decision are untouched. Accumulator
  * updates come from ordinary tasks, broadcast job or not. Counts are
  * at-least-once per physical execution (a non-reused duplicate subtree
  * re-counts): an observability signal, not an exact metric.
  */
object BucketDrops {

  private val accs = TrieMap.empty[String, (LongAccumulator, LongAccumulator)]

  /** Total dropped buckets/rows across all dedup stages in this process. */
  def totalDroppedBuckets: Long = accs.values.iterator.map(_._1.value.longValue).sum
  def totalDroppedRows: Long = accs.values.iterator.map(_._2.value.longValue).sum

  /** Cap filter over a bucket-size frame (`nCol` = per-bucket row count,
    * a non-null long): keeps buckets with n <= maxBucket, counting and
    * logging every bucket the cap rejects. `requirePair` additionally
    * drops n == 1 buckets (uncounted — they can't produce a pair in an
    * exact-exact self-join); pass false when the other join side reaches
    * buckets via probe keys, where a single exact member still pairs.
    */
  def keepUnderCap(counts: DataFrame, nCol: String, maxBucket: Int, what: String,
                   requirePair: Boolean = true): DataFrame = {
    val sc = counts.sparkSession.sparkContext
    val (accB, accR) = accs.getOrElseUpdate(s"${sc.applicationId}/$what", (
      sc.longAccumulator(s"graft.drops.$what.buckets"),
      sc.longAccumulator(s"graft.drops.$what.rows")))
    val keep = GraftShims.column(
      CountingCapFilter(GraftShims.expression(col(nCol)), maxBucket.toLong, what, accB, accR))
    counts.filter(if (requirePair) keep && col(nCol) > 1 else keep)
  }
}

/** `n <= cap`, side-counting rejects. Nondeterministic so the optimizer
  * never deduplicates, reorders past, or constant-folds it; CodegenFallback
  * because it runs once per bucket, not per row — off the hot path by
  * construction. Logging is rate-limited per task copy (first drop, then
  * every 1000th): at the corpus scale this feature targets, MOST buckets
  * can be over cap, and a WARN per bucket would bury the signal it exists
  * to surface — the accumulators carry the exact totals either way.
  */
case class CountingCapFilter(child: Expression, cap: Long, what: String,
                             accB: LongAccumulator, accR: LongAccumulator)
    extends UnaryExpression with Nondeterministic with CodegenFallback {

  @transient private lazy val log = org.slf4j.LoggerFactory.getLogger(classOf[CountingCapFilter])
  @transient private var localDrops = 0L

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override protected def initializeInternal(partitionIndex: Int): Unit = { localDrops = 0L }

  override protected def evalInternal(input: InternalRow): Any = {
    val n = child.eval(input).asInstanceOf[Long]
    val keep = n <= cap
    if (!keep) {
      accB.add(1L); accR.add(n)
      localDrops += 1
      if (localDrops == 1 || localDrops % 1000 == 0)
        log.warn(s"graft.drops.$what: dropped $localDrops over-cap bucket(s) so far " +
          s"in this task (latest: $n rows, maxBucket=$cap); near-dup recall is " +
          "reduced for their content — raise maxBucket, shrink the radius, or " +
          "exact-dedup degenerate documents upstream")
    }
    keep
  }

  override protected def withNewChildInternal(newChild: Expression): CountingCapFilter =
    copy(child = newChild)
}
