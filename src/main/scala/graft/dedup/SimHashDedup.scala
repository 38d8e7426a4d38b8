package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.functions.{hamming64, simhash64}

/** SimHash near-duplicate detection: 64-bit signature per document, near
  * duplicates = small Hamming distance.
  *
  * Scale path: split the 64-bit signature into `blocks` bit-blocks. Two
  * signatures within Hamming distance `blocks - 1` must agree exactly on at
  * least one block (pigeonhole), so candidate generation is an equi-join on
  * (block index, block value) — never an all-pairs compare, and the block
  * value is a compact long shuffle key.
  *
  * The pigeonhole guarantee REQUIRES `blocks >= maxHamming + 1`;
  * [[nearPairs]] widens the block count automatically so recall at the
  * requested radius is exact (candidate generation is lossless; the
  * `maxBucket` cap is the only recall cutoff, and every capped bucket is
  * counted and logged via [[BucketDrops]]). Blocks need not divide 64
  * evenly: the first `64 % blocks` blocks are one bit wider.
  *
  * Exact-block envelope: radius <= ~8. The tradeoff is structural — a
  * larger radius means narrower blocks, hence denser buckets: at
  * `maxHamming=16` the 17 blocks carry 3-4 bits each (<= 16 distinct
  * values per block), so at corpus scale most buckets exceed ANY cap and
  * recall collapses; the drop counters make that visible instead of
  * silent.
  *
  * Past that envelope, [[nearPairs]] with `probe1 = true` switches to
  * HmSearch-style 1-error-tolerant blocks (Zhang et al., VLDB'13 — public
  * algorithm): if every block carried >= 2 of the r errors the total would
  * be >= 2b, so `b = r/2 + 1` blocks guarantee some block with <= 1
  * differing bit, and matching a block's exact key against the other
  * side's 1-bit-flip probe set is lossless. At r=16 that is 9 blocks of
  * 7-8 bits (key space 128-256 per block) instead of 17 blocks of 3-4
  * bits — bucket density falls exponentially while the probe side emits
  * only width+1 keys per block (~8x key volume on one join side, still
  * one shuffle, never all-pairs).
  */
object SimHashDedup {

  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def signatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), simhash64(tokens(col(textCol))).as("simhash"))

  private def blockWidths(blocks: Int): (Seq[Int], Seq[Int]) = {
    val base = 64 / blocks
    val extra = 64 % blocks
    val widths = Seq.tabulate(blocks)(b => if (b < extra) base + 1 else base)
    (widths, widths.scanLeft(0)(_ + _))
  }

  private def blockValue(b: Int, widths: Seq[Int], offsets: Seq[Int]): Column = {
    val mask = if (widths(b) == 64) -1L else (1L << widths(b)) - 1
    shiftrightunsigned(col("simhash"), offsets(b)).bitwiseAND(lit(mask))
  }

  /** (id, block, block_value) keys; variable-width blocks covering all 64
    * bits (first `64 % blocks` blocks get the extra bit).
    */
  def blockKeys(sigs: DataFrame, idCol: String, blocks: Int = 4): DataFrame = {
    require(blocks >= 1 && blocks <= 64, s"blocks must be in [1,64], got $blocks")
    val (widths, offsets) = blockWidths(blocks)
    val blockCols = (0 until blocks).map(blockValue(_, widths, offsets))
    sigs.select(col(idCol), col("simhash"), posexplode(array(blockCols: _*)))
      .withColumnsRenamed(Map("pos" -> "block", "col" -> "block_value"))
  }

  /** Probe keys: for each block, the exact value plus every 1-bit flip —
    * the query side of the 1-error-tolerant join. Emits width+1 keys per
    * block.
    */
  def blockKeysProbed(sigs: DataFrame, idCol: String, blocks: Int): DataFrame = {
    require(blocks >= 1 && blocks <= 64, s"blocks must be in [1,64], got $blocks")
    val (widths, offsets) = blockWidths(blocks)
    val structs = (0 until blocks).flatMap { b =>
      val base = blockValue(b, widths, offsets)
      (-1 until widths(b)).map { i =>
        val v = if (i < 0) base else base.bitwiseXOR(lit(1L << i))
        struct(lit(b).as("block"), v.as("block_value"))
      }
    }
    sigs.select(col(idCol), col("simhash"), explode(array(structs: _*)).as("k"))
      .select(col(idCol), col("simhash"), col("k.block"), col("k.block_value"))
  }

  /** Pairs within `maxHamming`, via block-join candidates + exact verify.
    *
    * `probe1 = false` (default): exact block match; `blocks` is widened to
    * `maxHamming + 1` (pigeonhole) — right for radius <= ~8.
    *
    * `probe1 = true`: 1-error-tolerant blocks; `blocks` is widened to
    * `maxHamming / 2 + 1`, and one join side carries the exact block keys
    * while the other carries exact + every 1-bit flip. A pair within the
    * radius has some block with <= 1 differing bit (else total errors
    * >= 2 * blocks > maxHamming), and that block matches either exactly or
    * through the flipped probe — candidate generation stays lossless with
    * far wider blocks (denser key space, sparser buckets) at large radii.
    */
  def nearPairs(df: DataFrame, idCol: String, textCol: String,
                blocks: Int = 4, maxHamming: Int = 3,
                maxBucket: Int = 1000, probe1: Boolean = false): DataFrame =
    nearPairsOnSig(signatures(df, idCol, textCol), idCol,
      blocks, maxHamming, maxBucket, probe1)

  /** [[nearPairs]] over a PRECOMPUTED 64-bit signature column `simhash` —
    * the Hamming block-join is signature-agnostic, so any 64-bit
    * fingerprint (text simhash, image perceptual hash, ...) reuses the
    * same lossless candidate generation + exact verify.
    */
  def nearPairsOnSig(sigs: DataFrame, idCol: String,
                     blocks: Int = 4, maxHamming: Int = 3,
                     maxBucket: Int = 1000, probe1: Boolean = false): DataFrame = {
    val effBlocks = math.max(blocks,
      if (probe1) maxHamming / 2 + 1 else maxHamming + 1)
    val exact = blockKeys(sigs, idCol, effBlocks)
    val counts = exact.groupBy("block", "block_value").agg(count(lit(1)).as("__n"))
    // probe mode must keep single-member buckets: the partner arrives via
    // a flipped probe key, so n == 1 can still produce a pair
    val sized = BucketDrops.keepUnderCap(counts, "__n", maxBucket, "simhash",
        requirePair = !probe1)
      .select("block", "block_value")
    val probeSide = if (probe1) blockKeysProbed(sigs, idCol, effBlocks) else exact
    // prune BOTH sides by the exact-bucket cap: an over-cap bucket is
    // degenerate regardless of which side of the join touches it
    val a = exact.join(sized, Seq("block", "block_value"))
      .select(col("block"), col("block_value"),
        col(idCol).as("id_a"), col("simhash").as("sim_a"))
    val b = probeSide.join(sized, Seq("block", "block_value"))
      .select(col("block"), col("block_value"),
        col(idCol).as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("block", "block_value"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("sim_a"), col("sim_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
