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
  * Supported envelope: radius <= ~8. The tradeoff is structural — a larger
  * radius means narrower blocks, hence denser buckets: at `maxHamming=16`
  * the 17 blocks carry 3-4 bits each (<= 16 distinct values per block), so
  * at corpus scale most buckets exceed ANY cap and recall collapses; the
  * drop counters make that visible instead of silent. Past the envelope,
  * use MinHash (band width keeps the key space exponential in rows-per-
  * band) or HmSearch-style multi-block probing, which trades one shuffle
  * for several narrower ones.
  */
object SimHashDedup {

  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def signatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), simhash64(tokens(col(textCol))).as("simhash"))

  /** (id, block, block_value) keys; variable-width blocks covering all 64
    * bits (first `64 % blocks` blocks get the extra bit).
    */
  def blockKeys(sigs: DataFrame, idCol: String, blocks: Int = 4): DataFrame = {
    require(blocks >= 1 && blocks <= 64, s"blocks must be in [1,64], got $blocks")
    val base = 64 / blocks
    val extra = 64 % blocks
    val widths = Seq.tabulate(blocks)(b => if (b < extra) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    val blockCols = (0 until blocks).map { b =>
      val mask = if (widths(b) == 64) -1L else (1L << widths(b)) - 1
      shiftrightunsigned(col("simhash"), offsets(b)).bitwiseAND(lit(mask))
    }
    sigs.select(col(idCol), col("simhash"), posexplode(array(blockCols: _*)))
      .withColumnsRenamed(Map("pos" -> "block", "col" -> "block_value"))
  }

  /** Pairs within `maxHamming`, via block-join candidates + exact verify.
    * `blocks` is widened to `maxHamming + 1` when too small — fewer blocks
    * than that would silently miss pairs that disagree on every block.
    */
  def nearPairs(df: DataFrame, idCol: String, textCol: String,
                blocks: Int = 4, maxHamming: Int = 3,
                maxBucket: Int = 1000): DataFrame = {
    val effBlocks = math.max(blocks, maxHamming + 1)
    val keys = blockKeys(signatures(df, idCol, textCol), idCol, effBlocks)
    val counts = keys.groupBy("block", "block_value").agg(count(lit(1)).as("__n"))
    val sized = BucketDrops.keepUnderCap(counts, "__n", maxBucket, "simhash")
    val pruned = keys.join(sized.select("block", "block_value"), Seq("block", "block_value"))
    val a = pruned.select(col("block"), col("block_value"),
      col(idCol).as("id_a"), col("simhash").as("sim_a"))
    val b = pruned.select(col("block"), col("block_value"),
      col(idCol).as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("block", "block_value"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("sim_a"), col("sim_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
