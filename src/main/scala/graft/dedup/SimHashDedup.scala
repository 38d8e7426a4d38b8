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
  * (block index, block value) — again no all-pairs compare, and the block
  * value is a compact long shuffle key.
  */
object SimHashDedup {

  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def signatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), simhash64(tokens(col(textCol))).as("simhash"))

  /** (id, block, block_value) keys; blocks of 64/blocks bits each. */
  def blockKeys(sigs: DataFrame, idCol: String, blocks: Int = 4): DataFrame = {
    val width = 64 / blocks
    val mask = if (width == 64) -1L else (1L << width) - 1
    sigs.select(col(idCol), col("simhash"),
      posexplode(array((0 until blocks).map(b =>
        shiftrightunsigned(col("simhash"), b * width).bitwiseAND(lit(mask))): _*)))
      .withColumnsRenamed(Map("pos" -> "block", "col" -> "block_value"))
  }

  /** Pairs within `maxHamming`, via block-join candidates + exact verify. */
  def nearPairs(df: DataFrame, idCol: String, textCol: String,
                blocks: Int = 4, maxHamming: Int = 3,
                maxBucket: Int = 1000): DataFrame = {
    val keys = blockKeys(signatures(df, idCol, textCol), idCol, blocks)
    val sized = keys.groupBy("block", "block_value").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket && col("__n") > 1)
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
