package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order ranking — the two-pass range-partitioned rank
  * that replaces `Window.orderBy(...)` with no `partitionBy`, the one
  * pattern that funnels an entire table through a single task. At 100 TB a
  * single-partition window is THE scale-killer: one executor sorts
  * everything while the rest idle.
  *
  * Plan shape instead:
  *  - pass 1: `repartitionByRange` on the order keys splits the total
  *    order into contiguous balanced ranges; a per-partition probe collects
  *    each range's row count and its maximum key tuple — ONE row per
  *    partition, the same bounded driver-side state class as an IVF
  *    codebook. Crucially the ranges are then frozen as key VALUES, not as
  *    partition ids: Spark's range sampler seeds on the RDD id, so the
  *    physical boundaries differ between jobs and `spark_partition_id` is
  *    only meaningful inside the job that produced it (a lesson this op
  *    learned the hard way — pid-keyed counts joined to a second job's pids
  *    mis-ranked rows).
  *  - pass 2: each row recomputes its range from its own key (count of
  *    frozen boundaries strictly below it — a codegen'd when-chain, no
  *    shuffle), ranks locally per range with an ordinary partitioned
  *    window, and lifts to a global rank via a broadcast prefix-offset
  *    join.
  * Two scans of the input, zero single-partition stages (pinned in
  * PlanQualitySpec); per-range work is parallel across the cluster.
  *
  * Order keys must form a TOTAL order (include a tie-break key) and be
  * non-null, orderable scalars — ties at a range boundary would otherwise
  * make membership placement-dependent.
  *
  * The reference engine sorts in-memory with pandas (e.g. the rank/sort
  * idioms in /root/reference/dags/dag_maestros.py), the same single-node
  * funnel; this is the distributed restatement.
  */
object Ranks {

  /** A possibly-`.desc` sort column decomposed into (value column, desc?). */
  private def sortParts(c: Column): (Column, Boolean) = GraftShims.sortParts(c)

  /** One field compared the way SPARK orders it. Strings must compare as
    * UTF-8 bytes (Spark's UTF8String binary order) — Java's compareTo is
    * UTF-16 code-unit order, which ranks supplementary characters (their
    * surrogates sit below 0xE000) BEFORE some BMP characters, the opposite
    * of code-point order; a boundary frozen under the wrong order would
    * corrupt the pass-2 range assignment. Doubles are fine via compareTo
    * (java.lang.Double agrees with Spark: NaN greatest, -0.0 < 0.0).
    */
  private[graft] def sparkCompare(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) =>
      val (xb, yb) = (x.getBytes("UTF-8"), y.getBytes("UTF-8"))
      var i = 0
      val n = math.min(xb.length, yb.length)
      while (i < n) {
        val c = (xb(i) & 0xff) - (yb(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      xb.length - yb.length
    case _ => a.asInstanceOf[Comparable[Any]].compareTo(b)
  }

  /** Driver-side comparator matching the column order: does `a` sort
    * strictly after `b`? Fields arrive as external JVM types (Long, Double,
    * String, Timestamp, ...).
    */
  private def rowAfter(dirs: Seq[Boolean])(a: Row, b: Row): Boolean = {
    var i = 0
    while (i < dirs.length) {
      val av = a.get(i)
      val bv = b.get(i)
      // fail fast with the position instead of an opaque NPE from deep
      // inside the pass-1 probe — 'non-null order keys' is a documented
      // precondition, so name the violation when it happens
      if (av == null || bv == null) throw new IllegalArgumentException(
        s"order key #$i is null: Ranks requires non-null order keys " +
        "(coalesce or filter nulls before ranking)")
      val c = sparkCompare(av, bv)
      if (c != 0) return if (dirs(i)) c < 0 else c > 0
      i += 1
    }
    false
  }

  /** Codegen'd lexicographic "row's key sorts strictly after boundary `b`"
    * predicate over the same field order.
    */
  private def afterBoundary(parts: Seq[(Column, Boolean)], b: Row): Column =
    parts.zipWithIndex.foldRight(lit(false)) { case (((c, desc), i), rest) =>
      val bv = lit(b.get(i))
      val strict = if (desc) c < bv else c > bv
      strict || (c === bv && rest)
    }

  /** `df` plus a 1-based global row number `out` under the total order
    * `order`. Returns the total row count alongside — the boundary pass
    * computes it for free and ntile needs it.
    */
  def withGlobalRowNumber(df: DataFrame, order: Seq[Column], out: String,
                          numPartitions: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val parts = order.map(sortParts)
    val keyCols = parts.map(_._1)
    val dirs = parts.map(_._2)

    // pass 1: balanced contiguous ranges, then freeze (count, max key) per
    // range — a single streaming probe per partition, one output row each
    val keyed = df.repartitionByRange(p, order: _*)
      .select(keyCols.zipWithIndex.map { case (c, i) => c.as(s"__k$i") }: _*)
    val after = rowAfter(dirs) _
    val stats = keyed.rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L
      var hi: Row = null
      while (it.hasNext) {
        val r = it.next(); n += 1
        if (hi == null || after(r, hi)) hi = r
      }
      if (n == 0) Iterator.empty else Iterator.single((pid, n, hi))
    }.collect().sortBy(_._1)
    // a partition holding only null-keyed rows bypasses rowAfter (nothing
    // to compare against) — catch the null before it becomes a frozen
    // boundary value
    stats.foreach { case (_, _, hi) =>
      dirs.indices.foreach { i =>
        if (hi.get(i) == null) throw new IllegalArgumentException(
          s"order key #$i is null: Ranks requires non-null order keys " +
          "(coalesce or filter nulls before ranking)")
      }
    }

    val total = stats.iterator.map(_._2).sum
    val boundaries = stats.map(_._3) // range maxes, ascending range order
    // range id of a row = number of non-final boundaries strictly below it
    val rangeId = boundaries.dropRight(1).foldLeft(lit(0)) { (acc, b) =>
      acc + when(afterBoundary(parts, b), 1).otherwise(0)
    }
    import spark.implicits._
    val offDf = stats.indices
      .map(i => (i, stats.iterator.take(i).map(_._2).sum)).toDF("__rid", "__off")

    // pass 2: rank locally within each recomputed range (parallel), lift
    // by the range's prefix offset
    val local = Window.partitionBy("__rid").orderBy(order: _*)
    val ranked = df.withColumn("__rid", rangeId)
      .withColumn("__lrn", row_number().over(local))
      .join(broadcast(offDf), Seq("__rid"))
      .withColumn(out, col("__off") + col("__lrn"))
      .drop("__rid", "__off", "__lrn")
    (ranked, total)
  }

  /** Exact order statistics without a global sort: the rows sitting at
    * ranks ceil(p*n) for each requested p (the quantile_disc convention).
    * This is what the distributed rank buys beyond ntile — exact
    * percentile VALUES over data no single task could hold, where
    * approx_percentile gives bounded error and a global-window rank
    * gives a single-partition funnel.
    */
  def orderStatistics(df: DataFrame, order: Seq[Column], ps: Seq[Double],
                      rankCol: String = "rank",
                      numPartitions: Int = 0): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"percentiles must be in (0, 1], got $ps")
    val (ranked, n) = withGlobalRowNumber(df, order, rankCol, numPartitions)
    val targets = ps.map(p => math.max(1L, math.ceil(p * n).toLong)).distinct
    if (n == 0) ranked.filter(lit(false))
    else ranked.filter(col(rankCol).isin(targets: _*))
  }

  /** Exact order statistics PER GROUP: for each group, the rows sitting at
    * ranks ceil(p*n_g) for every requested p (quantile_disc semantics, like
    * [[orderStatistics]] but stratified). Unlike the global case this needs
    * no range machinery — a window partitioned by the group keys is already
    * fully distributed, one task per hash bucket of groups; the scale
    * caveat is a single giant group, where [[orderStatistics]] on that
    * group's slice is the fallback. Output carries `pCol` so a row that is
    * two percentiles at once (tiny groups) appears once per percentile.
    */
  def groupOrderStatistics(df: DataFrame, groupBy: Seq[String],
                           order: Seq[Column], ps: Seq[Double],
                           pCol: String = "p",
                           rankCol: String = "rank"): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"percentiles must be in (0, 1], got $ps")
    val spark = df.sparkSession
    import spark.implicits._
    val grp = groupBy.map(col)
    val ranked = df
      .withColumn(rankCol,
        row_number().over(Window.partitionBy(grp: _*).orderBy(order: _*))
          .cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(grp: _*)))
    ranked
      .join(broadcast(ps.toDF(pCol)),
        col(rankCol) === greatest(lit(1L), ceil(col(pCol) * col("__n"))))
      .drop("__n")
  }

  /** SQL `ntile(buckets)` under a total order, distributed: standard
    * semantics — with n rows, q = n div buckets and r = n mod buckets, the
    * first r buckets get q+1 rows, the rest q. n and the cut are known
    * driver-side from the boundary pass, so the bucket arithmetic is all
    * literal constants over the global rank.
    */
  def ntileSpread(df: DataFrame, buckets: Int, order: Seq[Column],
                  out: String = "bucket", numPartitions: Int = 0): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val (ranked, n) = withGlobalRowNumber(df, order, "__grank", numPartitions)
    val q = n / buckets
    val r = n % buckets
    val bucket =
      if (q == 0) col("__grank") // fewer rows than buckets: rank IS the bucket
      else {
        val cut = r * (q + 1) // last rank inside the fat (q+1-row) buckets
        when(col("__grank") <= cut,
            floor((col("__grank") - 1) / (q + 1)) + 1)
          .otherwise(floor((col("__grank") - cut - 1) / q) + lit(r) + 1)
      }
    ranked.withColumn(out, bucket.cast("int")).drop("__grank")
  }

  /** Per-group value histogram — the quantile SKETCH, realized relationally
    * (the [[graft.ops.Hll]] treatment applied to quantiles): one
    * map-side-combined groupBy yields (group..., bucket, cnt) rows, at most
    * domain/bucketWidth per group however many rows the group holds. The
    * rows are storable and MERGEABLE (cnt sums across days/partitions),
    * which an opaque percentile_approx buffer is not. All-integer
    * bucketing: bucket = floor(value / bucketWidth) via an exact
    * subtract-mod form, so two engines bucket identically.
    */
  def groupQuantileHistogram(df: DataFrame, groupBy: Seq[String],
                             value: Column, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val v = value.cast("long")
    val bucket = ((v - pmod(v, lit(bucketWidth))) / lit(bucketWidth))
      .cast("long")
    df.groupBy((groupBy.map(col) :+ bucket.as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Approximate per-group quantiles over a [[groupQuantileHistogram]]:
    * for each p, the bucket holding rank ceil(p * n_g) (quantile_disc
    * semantics, mirroring [[groupOrderStatistics]]), emitted as its
    * [lo, hi] value bounds — so the estimate error is bounded by
    * `bucketWidth` BY CONSTRUCTION, and the exact per-group quantile
    * provably lies inside the emitted bounds (pinned vs
    * groupOrderStatistics in RanksSpec). The cumulative walk is a window
    * partitioned by group — fully distributed, like a19; unlike a19 it
    * runs over the bounded sketch rows, not the data, so a giant group
    * costs domain/width rows instead of n_g.
    */
  def groupApproxQuantiles(hist: DataFrame, groupBy: Seq[String],
                           ps: Seq[Double], bucketWidth: Long,
                           pCol: String = "p"): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"percentiles must be in (0, 1], got $ps")
    val spark = hist.sparkSession
    import spark.implicits._
    val grp = groupBy.map(col)
    val c = hist
      .withColumn("__cum",
        sum("cnt").over(Window.partitionBy(grp: _*).orderBy("bucket")))
      .withColumn("__n", sum("cnt").over(Window.partitionBy(grp: _*)))
    val target = ceil(col(pCol) * col("__n"))
    c.join(broadcast(ps.toDF(pCol)),
        col("__cum") >= target && col("__cum") - col("cnt") < target)
      .select(grp ++ Seq(col(pCol),
        (col("bucket") * bucketWidth).cast("long").as("lo"),
        (col("bucket") * bucketWidth + bucketWidth - 1).cast("long").as("hi")): _*)
  }
}
