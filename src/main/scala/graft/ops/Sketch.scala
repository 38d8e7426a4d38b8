package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch, realized relationally (Cormode & Muthukrishnan 2005).
  *
  * Spark-first formulation: instead of a blob-typed aggregation buffer, the
  * sketch IS a tiny DataFrame of (row, bucket, cnt) cells — `groupBy` gives
  * the counter array, map-side partial aggregation gives the mergeability
  * that makes CMS distributed-friendly, and every stage stays inside
  * whole-stage codegen (the bucket projection is built-ins only:
  * xxhash64 + pmod). At 100 TB the corpus streams once and the shuffle is
  * bounded by depth x width cells, not by the number of distinct keys —
  * the regime where an exact groupBy count's shuffle (one partial row per
  * distinct key per task) stops fitting.
  *
  * Estimates are the classic min over depth rows; they can only
  * OVER-estimate (pinned in SketchSpec), and are exact when no colliding
  * key pair shares all rows — deterministic for a fixed key set, which is
  * what lets the gate pin the estimate path against exact counts.
  *
  * The reference engine has no sketch surface at all; this is part of the
  * brief's scale extensions (alongside a8's HLL and a13's quantile sketch).
  */
object Sketch {

  /** A built sketch carries its own geometry AND its build key's data type:
    * probing with a different depth/width than the build silently
    * UNDER-counts (missing cells read as 0 through the min), and so does
    * probing with a differently-typed key (xxhash64(int 5) != xxhash64(
    * long 5) — different cells, estimate collapses to 0). The API makes
    * both mismatches unrepresentable rather than documented: geometry via
    * require, type via a cast on the probe side.
    */
  final case class CmsSketch(cells: DataFrame, depth: Int, width: Int,
                             keyType: org.apache.spark.sql.types.DataType)

  /** depth bucket indices for a key: row r uses xxhash64(key, r) mod width.
    * Same projection on the build and probe sides by construction.
    */
  private def buckets(key: Column, depth: Int, width: Int): Column =
    transform(sequence(lit(0), lit(depth - 1)),
      r => pmod(xxhash64(key, r), lit(width)))

  /** Build the sketch: one row per touched (row, bucket) cell, cnt = number
    * of input rows hashing there. Never materializes more than depth x width
    * rows, and partial (map-side) combine means each task ships at most
    * that many cells whatever its input size.
    */
  def cmsBuild(df: DataFrame, key: Column, depth: Int, width: Int): CmsSketch =
    CmsSketch(
      df.select(posexplode(buckets(key, depth, width)).as(Seq("r", "bucket")))
        .groupBy("r", "bucket").agg(count(lit(1)).as("cnt")),
      depth, width,
      df.select(key).schema.head.dataType)

  /** Estimated count for each candidate key: min over the depth cells the
    * key hashes to (a cell absent from the sketch is 0 — the key was never
    * seen). The sketch side is depth x width rows at most, so the join
    * broadcasts; the candidate side streams.
    */
  def cmsEstimate(sketch: CmsSketch, candidates: DataFrame, keyName: String,
                  outCol: String = "est_count"): DataFrame =
    candidates
      .select(col(keyName),
        // cast to the BUILD key's type before hashing: an int probe against
        // a long-built sketch would hash to different cells and read 0
        posexplode(buckets(col(keyName).cast(sketch.keyType),
            sketch.depth, sketch.width))
          .as(Seq("r", "bucket")))
      .join(broadcast(sketch.cells), Seq("r", "bucket"), "left")
      .groupBy(keyName)
      .agg(min(coalesce(col("cnt"), lit(0L))).as(outCol))

  /** Cell-wise merge of two sketches built with the same geometry (the
    * mergeability that makes CMS distributed/incremental-friendly).
    */
  def cmsMerge(a: CmsSketch, b: CmsSketch): CmsSketch = {
    require(a.depth == b.depth && a.width == b.width,
      "sketch geometries differ")
    require(a.keyType == b.keyType,
      s"sketch key types differ: ${a.keyType} vs ${b.keyType}")
    CmsSketch(
      a.cells.unionByName(b.cells)
        .groupBy("r", "bucket").agg(sum("cnt").as("cnt")),
      a.depth, a.width, a.keyType)
  }

  /** Equi-join cardinality estimate from two sketches over the join key:
    * the count-min inner product, min over rows of sum(cnt_a * cnt_b)
    * per shared cell (Cormode & Muthukrishnan §4.2). Never under-estimates
    * (every true pair lands in a shared cell; collisions only add), and is
    * exact when no two keys share a cell in some row. This is the
    * optimizer-style pre-flight for a join at 100 TB — both sides reduce
    * to depth x width cells, so the estimate costs two scan-shaped sketch
    * builds and a cell-sized join instead of the join itself.
    */
  def cmsJoinSize(a: CmsSketch, b: CmsSketch): DataFrame = {
    require(a.depth == b.depth && a.width == b.width,
      "sketch geometries differ")
    a.cells.withColumnRenamed("cnt", "cnt_a")
      .join(b.cells.withColumnRenamed("cnt", "cnt_b"), Seq("r", "bucket"))
      .groupBy("r").agg(sum(col("cnt_a") * col("cnt_b")).as("dot"))
      // disjoint key sets can share NO cell at generous width: the join is
      // empty and min-over-nothing would be NULL — but 0 is the exact answer
      .agg(coalesce(min("dot"), lit(0L)).as("est_join_rows"))
  }
}
