package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.QuantileSketch._

class QuantileSketchSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val li = graft.core.Tables.lineitem(spark, sf001)
    .select(col("l_extendedprice").cast("double").as("v"))

  private lazy val exact: (Long, Double => Double) = {
    val arr = li.as[Double].collect().sorted
    (arr.length.toLong, (p: Double) =>
      arr(math.max(0, math.ceil(p * arr.length).toInt - 1)))
  }

  /** Tie-aware rank error of estimate e at prob p: a repeated value
    * occupies a RANGE of ranks [first occurrence, last occurrence]; the
    * error is 0 when the target rank falls inside it (an all-constant
    * input is answered exactly by the only value there is), else the
    * distance to the nearer end, normalized by n.
    */
  private def rankErr(sortedRef: Array[Double], p: Double, e: Double): Double = {
    val n = sortedRef.length
    var lo = java.util.Arrays.binarySearch(sortedRef, e)
    if (lo < 0) lo = -(lo + 1) else while (lo > 0 && sortedRef(lo - 1) == e) lo -= 1
    var hi = lo
    while (hi < n && sortedRef(hi) == e) hi += 1
    val t = p * n
    if (t >= lo && t <= hi) 0.0
    else math.min(math.abs(t - lo), math.abs(t - hi)) / n
  }

  test("small input (n < k): sketch quantiles are the exact order statistics") {
    val b = new QuantileSketch.Buffer(256)
    val vals = (1 to 100).map(_.toDouble)
    vals.foreach(b.add)
    assert(b.quantile(0.5) == 50.0)
    assert(b.quantile(0.01) == 1.0)
    assert(b.quantile(1.0) == 100.0)
  }

  test("rank error <= 1% of n at k=256 on the bench table, two partitionings") {
    val sortedRef = li.as[Double].collect().sorted
    for (df <- Seq(li.repartition(7), li.repartition(32, col("v")))) {
      val bytes = df.agg(quantile_sketch(col("v"), 256).as("s"))
        .head().getAs[Array[Byte]](0)
      val b = QuantileSketch.deserialize(bytes)
      assert(b.n == sortedRef.length)
      for (p <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
        val err = rankErr(sortedRef, p, b.quantile(p))
        assert(err <= 0.01, s"p=$p rank error $err")
      }
    }
  }

  test("stored per-group sketches merge to a within-bound global answer") {
    val sortedRef = li.as[Double].collect().sorted
    val grouped = graft.core.Tables.lineitem(spark, sf001)
      .groupBy("l_returnflag")
      .agg(quantile_sketch(col("l_extendedprice"), 256).as("sk"))
    assert(grouped.count() >= 2) // genuinely merging several sketches
    val merged = grouped.agg(quantile_sketch_merge(col("sk")).as("all"))
      .select(sketch_quantiles(col("all"), Seq(0.1, 0.5, 0.9)).as("q"),
        col("all"))
    val row = merged.head()
    val qs = row.getSeq[Double](0)
    val b = QuantileSketch.deserialize(row.getAs[Array[Byte]](1))
    assert(b.n == sortedRef.length) // no row lost or double-counted
    Seq(0.1, 0.5, 0.9).zip(qs).foreach { case (p, e) =>
      val err = rankErr(sortedRef, p, e)
      assert(err <= 0.015, s"merged p=$p rank error $err")
    }
  }

  test("deterministic: identical bytes on a fixed partitioning; roundtrip stable") {
    val df = li.repartition(4, col("v"))
    def bytes() = df.agg(quantile_sketch(col("v"), 64).as("s"))
      .head().getAs[Array[Byte]](0)
    val a = bytes(); val b = bytes()
    assert(java.util.Arrays.equals(a, b))
    val rt = QuantileSketch.deserialize(a).serialize()
    assert(java.util.Arrays.equals(a, rt))
  }

  test("SQL surface parity: quantile_sketch / merge / sketch_quantiles from SQL") {
    li.createOrReplaceTempView("qs_li_v")
    val sql = spark.sql(
      """SELECT sketch_quantiles(quantile_sketch_merge(sk), array(0.25, 0.5, 0.75)) AS q
        |FROM (SELECT quantile_sketch(v, 256) AS sk FROM qs_li_v GROUP BY v % 4)
        |""".stripMargin).head().getSeq[Double](0)
    val sortedRef = li.as[Double].collect().sorted
    Seq(0.25, 0.5, 0.75).zip(sql).foreach { case (p, e) =>
      assert(rankErr(sortedRef, p, e) <= 0.015, s"SQL p=$p est=$e")
    }
  }

  test("property: rank bound holds across random multisets, orders, and merge trees") {
    // driver-side property sweep (no Spark): adversarial value
    // distributions (heavy duplicates, negatives, constants, exponential
    // skew), random ingestion order, and random merge-tree shapes — the
    // three dimensions the bound must be independent of. Deterministic
    // seed: a red run must reproduce.
    val rnd = new scala.util.Random(20260814L)
    def dist(kind: Int, n: Int): Array[Double] = kind match {
      case 0 => Array.fill(n)(rnd.nextInt(50).toDouble)            // heavy dups
      case 1 => Array.fill(n)(rnd.nextGaussian() * 1e6 - 5e5)      // negatives
      case 2 => Array.fill(n)(math.exp(rnd.nextDouble() * 12))     // exp skew
      case _ => Array.fill(n)(42.0)                                // constant
    }
    for (kind <- 0 to 3; trial <- 0 until 3) {
      val n = 3000 + rnd.nextInt(12000)
      val vals = dist(kind, n)
      // random merge tree: split into 1..7 chunks, sketch each, fold in
      // random order
      val chunks = {
        val nc = 1 + rnd.nextInt(7)
        val shuffled = rnd.shuffle(vals.toSeq)
        shuffled.grouped(math.max(1, shuffled.size / nc + 1)).toSeq
      }
      val parts = chunks.map { c =>
        val b = new QuantileSketch.Buffer(128)
        c.foreach(b.add); b
      }
      val total = parts.reduce { (x, y) => x.mergeIn(y); x }
      assert(total.n == n, s"kind=$kind trial=$trial n")
      val sorted = vals.sorted
      for (p <- Seq(0.05, 0.25, 0.5, 0.75, 0.95)) {
        val err = rankErr(sorted, p, total.quantile(p))
        assert(err <= 0.03, s"kind=$kind trial=$trial p=$p err=$err n=$n")
      }
    }
  }

  test("column-driven probes: identical to the literal path; per-row request arrays") {
    val probs = Seq(0.1, 0.5, 0.9)
    val sk = li.repartition(4).agg(quantile_sketch(col("v"), 128).as("s"))
    val lit0 = sk.select(sketch_quantiles(col("s"), probs).as("q")).head().getSeq[Double](0)
    val colPath = sk.withColumn("probs", typedLit(probs))
      .select(sketch_quantiles(col("s"), col("probs")).as("q")).head().getSeq[Double](0)
    assert(lit0 == colPath) // same probes -> bit-identical estimates
    // per-row DIFFERENT requests: each row answers its own probe list
    val reqs = Seq((1, Seq(0.5)), (2, Seq(0.1, 0.9))).toDF("id", "probs")
    val served = sk.crossJoin(broadcast(reqs))
      .select(col("id"), sketch_quantiles(col("s"), col("probs")).as("q"))
      .orderBy("id").collect()
    assert(served(0).getSeq[Double](1) == Seq(lit0(1)))
    assert(served(1).getSeq[Double](1) == Seq(lit0(0), lit0(2)))
    // SQL surface takes a column too
    sk.createOrReplaceTempView("qs_sk_v")
    val sql = spark.sql(
      """SELECT sketch_quantiles(s, probs) AS q
        |FROM (SELECT s, array(0.1D, 0.5D, 0.9D) AS probs FROM qs_sk_v)
        |""".stripMargin).head().getSeq[Double](0)
    assert(sql == lit0)
    // loud failure on garbage probes, not garbage estimates
    intercept[Exception](
      sk.select(sketch_quantiles(col("s"), typedLit(Seq(1.5)))).head())
  }

  test("nulls are skipped; empty input yields an n=0 sketch") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val b = QuantileSketch.deserialize(
      df.agg(quantile_sketch(col("v"), 16).as("s")).head().getAs[Array[Byte]](0))
    assert(b.n == 2)
    val empty = QuantileSketch.deserialize(
      df.filter(col("v") > 100).agg(quantile_sketch(col("v"), 16).as("s"))
        .head().getAs[Array[Byte]](0))
    assert(empty.n == 0)
    intercept[IllegalArgumentException](empty.quantile(0.5))
  }
}
