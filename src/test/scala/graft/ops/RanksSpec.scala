package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RanksSpec extends SparkTestBase {
  import spark.implicits._

  // values with heavy ties; (v, id) is the total order
  private def data(n: Int) =
    (0 until n).map(i => ((i * 7919) % 97, i.toLong)).toDF("v", "id")

  test("global row number equals the single-partition window's, with ties") {
    val df = data(500)
    val order = Seq(col("v").desc, col("id"))
    val (ranked, total) = Ranks.withGlobalRowNumber(df, order, "rn", numPartitions = 8)
    assert(total == 500L)
    val expect = df.withColumn("rn", row_number().over(Window.orderBy(order: _*)))
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = ranked.select("id", "rn").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("ntileSpread matches the built-in ntile across sizes and bucket counts") {
    // exact multiple, remainder, n < buckets, n == 1
    for ((n, b) <- Seq((120, 4), (121, 4), (7, 10), (1, 3), (97, 5))) {
      val df = data(n)
      val order = Seq(col("v").desc, col("id"))
      val got = Ranks.ntileSpread(df, b, order, out = "t", numPartitions = 6)
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val expect = df
        .withColumn("t", ntile(b).over(Window.orderBy(order: _*)))
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expect, s"n=$n buckets=$b")
    }
  }

  test("string keys with supplementary characters rank identically to Spark's order") {
    // U+1F600 is a surrogate pair in UTF-16 (sorts LOW under Java
    // compareTo) but a 4-byte sequence in UTF-8 (sorts HIGH under Spark's
    // binary order) — the boundary probe must agree with Spark or pass-2
    // range assignment drifts
    val grin = new String(Character.toChars(0x1F600))
    val beam = new String(Character.toChars(0x1F601))
    val words = Seq("\uFFFD", grin, "zz", "aa", beam,
      "mm", "\uFFFD\uFFFD", "", "zz" + grin)
    val df = words.zipWithIndex.map { case (w, i) => (w, i.toLong) }.toDF("w", "id")
    val order = Seq(col("w"), col("id"))
    val (ranked, _) = Ranks.withGlobalRowNumber(df, order, "rn", numPartitions = 4)
    val got = ranked.select("id", "rn").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = df.withColumn("rn", row_number().over(Window.orderBy(order: _*)))
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got == expect)
  }

  test("orderStatistics picks exactly the ceil(p*n) rows of the sorted order") {
    val df = data(97) // odd, non-multiple size
    val order = Seq(col("v"), col("id"))
    val sorted = df.collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(t => (t._1, t._2))
    val got = Ranks.orderStatistics(df, order, Seq(0.1, 0.5, 1.0), numPartitions = 5)
      .collect().map(r => r.getAs[Long]("rank") -> r.getAs[Long]("id")).toMap
    val expect = Seq(0.1, 0.5, 1.0).map { p =>
      val rk = math.max(1, math.ceil(p * 97).toLong)
      rk -> sorted(rk.toInt - 1)._2
    }.toMap
    assert(got == expect)
    intercept[IllegalArgumentException] {
      Ranks.orderStatistics(df, order, Seq(0.0))
    }
    assert(Ranks.orderStatistics(data(0), order, Seq(0.5)).count() == 0)
  }

  test("groupOrderStatistics picks ceil(p*n_g) per group; tiny groups emit one row per p") {
    // group 0: 60 rows, group 1: 37 rows, group 2: 1 row (all three ps hit
    // the same physical row -> must appear three times, once per p)
    val df = (0 until 98).map { i =>
      val g = if (i < 60) 0 else if (i < 97) 1 else 2
      (g, (i * 7919) % 97, i.toLong)
    }.toDF("g", "v", "id")
    val got = Ranks.groupOrderStatistics(df, Seq("g"),
        Seq(col("v"), col("id")), Seq(0.25, 0.5, 0.75))
      .select("g", "p", "rank", "id").collect()
      .map(r => (r.getInt(0), r.getDouble(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val byG = df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3))).toMap
    val expect = (for {
      (g, rows) <- byG; p <- Seq(0.25, 0.5, 0.75)
      rk = math.max(1L, math.ceil(p * rows.length).toLong)
    } yield (g, p) -> (rk, rows(rk.toInt - 1)._3)).toMap
    assert(got == expect)
    assert(got.keys.count(_._1 == 2) == 3) // the 1-row group, once per p
  }

  test("equi-depth buckets differ by at most one row") {
    val counts = Ranks.ntileSpread(data(121), 8,
        Seq(col("v"), col("id")), out = "b", numPartitions = 6)
      .groupBy("b").count().collect().map(_.getLong(1))
    assert(counts.length == 8 && counts.max - counts.min <= 1)
    assert(counts.sum == 121)
  }

  test("group approx quantiles: exact group quantile always lies inside the emitted bounds") {
    // skewed per-group distributions with different sizes
    val df = (0 until 700).map { i =>
      val g = s"g${i % 3}"
      val v = ((i * i * 31) % 1000) + (if (g == "g1") 2000L else 0L)
      (g, v, i.toLong)
    }.toDF("g", "v", "id")
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val w = 50L
    val hist = Ranks.groupQuantileHistogram(df, Seq("g"), col("v"), w)
    val approx = Ranks.groupApproxQuantiles(hist, Seq("g"), ps, w)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val exact = Ranks.groupOrderStatistics(df, Seq("g"), Seq(col("v"), col("id")), ps)
      .collect().map(r => (r.getString(0), r.getDouble(r.fieldIndex("p"))) ->
        r.getLong(r.fieldIndex("v"))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, v) =>
      val (lo, hi) = approx(k)
      assert(lo <= v && v <= hi, s"$k: exact $v outside [$lo, $hi]")
      assert(hi - lo + 1 == w) // error bounded by the bucket width
    }
    // the sketch is mergeable: histograms of two halves sum to the whole
    val (h1, h2) = (df.filter(col("id") % 2 === 0), df.filter(col("id") % 2 === 1))
    val merged = Ranks.groupQuantileHistogram(h1, Seq("g"), col("v"), w)
      .unionByName(Ranks.groupQuantileHistogram(h2, Seq("g"), col("v"), w))
      .groupBy("g", "bucket").agg(sum("cnt").as("cnt"))
    val whole = hist.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap == whole)
  }

  test("a null order key fails fast with a message naming the position") {
    val df = Seq((Some(1L), 1L), (None: Option[Long], 2L), (Some(3L), 3L))
      .toDF("v", "id")
    val ex = intercept[Exception] {
      Ranks.withGlobalRowNumber(df, Seq(col("v"), col("id")), "rn",
        numPartitions = 4)._1.count()
    }
    // the precondition violation must surface as our message, not an
    // opaque NPE/ClassCastException from the probe internals
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("order key #0 is null")), msgs(ex).toString)
  }

  test("empty input yields an empty result, not a failure") {
    val df = data(0)
    val (ranked, total) = Ranks.withGlobalRowNumber(df, Seq(col("id")), "rn")
    assert(total == 0L && ranked.count() == 0L)
    assert(Ranks.ntileSpread(df, 4, Seq(col("id"))).count() == 0L)
  }

  test("plan has no single-partition stage and ranks in parallel ranges") {
    val (ranked, _) = Ranks.withGlobalRowNumber(data(500),
      Seq(col("v"), col("id")), "rn", numPartitions = 8)
    val p = ranked.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), p)
    // ranking pass shuffles by the recomputed range id, in parallel
    assert(p.contains("Exchange hashpartitioning"), p)
  }

  test("ranks are stable across repeated evaluations of the same DataFrame") {
    // the range sampler re-seeds per job; the op must not couple two jobs
    // through physical partition ids (regression probe for exactly that bug)
    val (ranked, _) = Ranks.withGlobalRowNumber(
      data(2000), Seq(col("v").desc, col("id")), "rn", numPartitions = 16)
    val a = ranked.collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val b = ranked.collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(a == b)
    assert(a.values.toSeq.sorted == (1L to 2000L))
  }
}
