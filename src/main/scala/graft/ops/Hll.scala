package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog, realized relationally (Flajolet, Fusy, Gandouet &
  * Meunier 2007) — the [[Sketch]] treatment applied to distinct counting:
  * the sketch IS a DataFrame of (bucket, max_rho) registers, built by one
  * map-side-combined `groupBy max` over built-in hash projections, so a
  * 100 TB build shuffles at most 2^p register rows however many distinct
  * keys exist — and, unlike `approx_count_distinct`'s opaque binary
  * buffer, the register table can be STORED, unioned across days, and
  * merged cell-wise (register-wise max) long after the raw data is gone.
  * That storable/mergeable register table is the point: a8 already
  * exposes Spark's own HLL aggregate for one-shot estimates.
  *
  * Register projection: h = xxhash64(key); bucket = h mod 2^p (built-in
  * pmod, non-negative); rho = leading-zero count of the REMAINING 64-p
  * bits + 1, computed as a when-chain over shifts — all codegen'd
  * built-ins, no UDF. Estimates use the standard alpha_m * m^2 /
  * sum(2^-rho) harmonic mean with the small-range linear-counting
  * correction; the register table is deterministic integer state (pinned
  * in the gate via a registers-vs-SQL-restatement oracle is impossible —
  * DuckDB lacks xxhash64 — so HllSpec pins the error bound against exact
  * counts and exact mergeability instead).
  */
object Hll {

  /** Registers + precision; 2^p buckets, relative error ~ 1.04/sqrt(2^p). */
  final case class HllSketch(registers: DataFrame, p: Int)

  private def rhoExpr(h: Column, p: Int): Column = {
    // rank of the highest set bit among the top (64-p) bits of the hash
    // AFTER removing the bucket bits: shift the hash right by p, then
    // rho = (64-p) - floor(log2(v)) for v > 0, else 64-p+1 (all zeros).
    val v = shiftrightunsigned(h, p)
    val w = 64 - p
    // floor(log2(v)) via a when-chain on shifted comparisons would be 64
    // branches; instead use the bit length from the BIGINT cast through
    // log: log2 on a double is exact for integers < 2^53, and v < 2^52
    // after a 12-bit shift — but p can be as low as 4, so use the
    // guaranteed-integer route: bit_length of the value via a binary
    // search when-chain over 6 comparisons.
    val bitLen = Seq(32, 16, 8, 4, 2, 1).foldLeft((lit(0), v)) {
      case ((len, x), s) =>
        val big = x >= lit(1L << s)
        (when(big, len + s).otherwise(len),
         when(big, shiftrightunsigned(x, s)).otherwise(x))
    } match { case (len, x) => len + when(x >= 1L, 1).otherwise(0) }
    (lit(w + 1) - bitLen).cast("int")
  }

  /** Build the register table: (bucket, max_rho), at most 2^p rows.
    * NULL keys are ignored, matching count(DISTINCT)/approx_count_distinct
    * semantics (xxhash64(null) would otherwise hash to the seed and count
    * as one phantom distinct value).
    */
  def hllBuild(df: DataFrame, key: Column, p: Int = 12): HllSketch = {
    require(p >= 4 && p <= 18, s"p must be in [4,18], got $p")
    val h = xxhash64(key)
    HllSketch(
      df.filter(key.isNotNull)
        .select(pmod(h, lit(1L << p)).cast("int").as("bucket"),
          rhoExpr(h, p).as("rho"))
        .groupBy("bucket").agg(max("rho").as("max_rho")),
      p)
  }

  /** Register tables for MANY sketches in ONE scan: (groupCols...,
    * bucket, max_rho), at most 2^p rows per group — the per-day/per-source
    * sketch-table pattern. Any subset of groups collapses to one sketch
    * with a plain `groupBy(bucket).max(max_rho)` (what [[hllMerge]] does
    * for two), because the registers are just rows. NULL keys are ignored,
    * as in [[hllBuild]] (a group whose keys are all null gets no rows).
    */
  def hllBuildGrouped(df: DataFrame, key: Column, groupCols: Seq[String],
                      p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 18, s"p must be in [4,18], got $p")
    val h = xxhash64(key)
    df.filter(key.isNotNull)
      .select(groupCols.map(col) ++ Seq(
        pmod(h, lit(1L << p)).cast("int").as("bucket"),
        rhoExpr(h, p).as("rho")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rho").as("max_rho"))
  }

  /** Register-wise max merge — the property that makes HLL the sketch of
    * choice for stored per-partition/per-day distinct summaries.
    */
  def hllMerge(a: HllSketch, b: HllSketch): HllSketch = {
    require(a.p == b.p, s"precision differs: ${a.p} vs ${b.p}")
    HllSketch(
      a.registers.unionByName(b.registers)
        .groupBy("bucket").agg(max("max_rho").as("max_rho")),
      a.p)
  }

  /** The estimate projection over (nonzero, hsum) aggregates — shared by
    * the whole-sketch and grouped paths. Zero-holding buckets never
    * appear as rows: they enter the harmonic sum as 2^0 = 1 each and
    * drive linear counting.
    */
  private def estimateCol(p: Int): Column = {
    val m = 1L << p
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = lit(alpha * m * m) /
      (coalesce(col("hsum"), lit(0.0)) + (lit(m) - col("nonzero")))
    when(raw <= lit(2.5 * m) && col("nonzero") < lit(m),
        // linear counting: m * ln(m / zero-buckets)
        round(lit(m) * log(lit(m.toDouble) / (lit(m) - col("nonzero")))))
      .otherwise(round(raw))
      .cast("long")
  }

  /** Cardinality estimate from the registers: one row out. Standard HLL
    * with the linear-counting small-range correction (the large-range
    * correction is unnecessary with 64-bit hashes).
    */
  def hllEstimate(sketch: HllSketch, outCol: String = "est_distinct"): DataFrame =
    sketch.registers
      .agg(count(lit(1)).as("nonzero"),
           sum(pow(lit(2.0), -col("max_rho"))).as("hsum"))
      .select(estimateCol(sketch.p).as(outCol))

  /** Per-group cardinality estimates from a [[hllBuildGrouped]] register
    * table: one row per group. The register table is the stored artifact;
    * this is the cheap read over it — distinct-per-day/per-source without
    * ever rescanning the raw data.
    */
  def hllEstimateGrouped(registers: DataFrame, groupCols: Seq[String], p: Int,
                         outCol: String = "est_distinct"): DataFrame =
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("nonzero"),
           sum(pow(lit(2.0), -col("max_rho"))).as("hsum"))
      .select(groupCols.map(col) :+ estimateCol(p).as(outCol): _*)
}
