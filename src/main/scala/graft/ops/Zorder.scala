package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column data skipping.
  *
  * Sorting a table by one column makes parquet min/max stats selective on
  * that column only — every file still spans the full range of every other
  * column, so predicates on them scan everything. Range-partitioning by the
  * interleaved-bit Z-key instead walks the space-filling curve: each output
  * file covers a compact rectangle of the (x, y) grid, so file- and
  * row-group-level stats prune scans on EITHER column. This is the layout
  * operation Delta/Iceberg call OPTIMIZE ZORDER BY, built from two Spark
  * primitives: a codegen'd key expression and repartitionByRange.
  *
  * At 100 TB this runs as one shuffle (the range exchange samples the key
  * distribution first), and pays for itself on every subsequent selective
  * scan. The reference engine has no layout control at all
  * (/root/reference/dags/CotyData_IPN.py writes unsorted frames); this is
  * part of the brief's scale extensions.
  */
object Zorder {

  /** The clustering key: interleave of the low `bits` bits of x and y.
    * Inputs must already be non-negative and < 2^bits for the key to be a
    * true curve position — use [[quantize]] for arbitrary ranges.
    */
  def zkey(x: Column, y: Column, bits: Int = 16): Column =
    graft.functions.functions.zorder_key(x, y, bits)

  /** Affine-quantize a numeric column onto the [0, 2^bits) grid given its
    * (lo, hi) bounds — monotone, so range predicates survive quantization.
    */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    val cells = (1L << bits) - 1
    least(lit(cells),
      greatest(lit(0L),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * cells).cast("long")))
  }

  /** 3-column curve key (bits <= 21): same contract as [[zkey]] with a
    * stride-3 interleave — each output file covers a compact (x, y, z) box.
    */
  def zkey3(x: Column, y: Column, z: Column, bits: Int = 16): Column =
    graft.functions.functions.zorder_key3(x, y, z, bits)

  /** Cluster `df` into `numFiles` Z-ordered output partitions on two
    * already-quantized columns. Write the result with any file sink; each
    * file's min/max stats then cover a compact (x, y) rectangle.
    */
  def cluster(df: DataFrame, x: Column, y: Column,
              numFiles: Int, bits: Int = 16): DataFrame =
    clusterByKey(df, zkey(x, y, bits), numFiles)

  /** Layout core shared by the 2- and 3-column forms: range-partition on a
    * precomputed curve key, sort within partitions, drop the key.
    */
  def clusterByKey(df: DataFrame, key: Column, numFiles: Int): DataFrame =
    df.withColumn("__zkey", key)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
}
