package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** [[BloomWordsAgg]] must reproduce the historical stats-sidecar bloom
  * pipeline (explode positions -> bit_or by (group, word) -> collect_list
  * sorted) byte-for-byte: the DocStore `bw_<col>` rows it now produces in
  * one aggregate must stay comparable with rows older stores persisted.
  */
class BloomWordsAggSpec extends SparkTestBase {
  import spark.implicits._

  private def positions(c: org.apache.spark.sql.Column, bits: Int) =
    array((0 until 4).map(s =>
      pmod(conv(substring(md5(concat_ws(":", lit(s.toString), c.cast("string"))), 1, 15),
        16, 10).cast("long"), lit(bits.toLong)).cast("int")): _*)

  test("one-pass bloom words == the explode/bit_or/collect_list pipeline") {
    val bits = 1024
    val df = (1 to 500).map(i => (i % 7, s"v$i"))
      .toDF("g", "v")
      .union(Seq((3, null.asInstanceOf[String])).toDF("g", "v")) // null path
      .cache()
    val fast = df.groupBy("g")
      .agg(BloomWordsAgg.bloom_words(positions(col("v"), bits), bits).as("bw"))
    val slow = {
      val tagged = df.select(col("g"), explode(positions(col("v"), bits)).as("pos"))
        .selectExpr("g", "CAST(pos / 64 AS INT) AS i",
          "shiftleft(CAST(1 AS BIGINT), pos % 64) AS b")
      tagged.groupBy("g", "i").agg(expr("bit_or(b)").as("w"))
        .groupBy("g")
        .agg(sort_array(collect_list(struct(col("i"), col("w")))).as("bw"))
    }
    val f = fast.orderBy("g").collect().map(r => (r.getInt(0), r.getSeq[Any](1)))
    val s = slow.orderBy("g").collect().map(r => (r.getInt(0), r.getSeq[Any](1)))
    assert(f.toSeq == s.toSeq)
    // every group produced at least one word (non-degenerate fixture)
    assert(f.forall(_._2.nonEmpty))
  }

  test("merge across partitionings is the same filter") {
    val bits = 256
    val df = (1 to 300).map(i => (0, i.toLong)).toDF("g", "v")
    val one = df.coalesce(1).groupBy("g")
      .agg(BloomWordsAgg.bloom_words(positions(col("v"), bits), bits).as("bw"))
      .head().getSeq[Any](1)
    val many = df.repartition(13).groupBy("g")
      .agg(BloomWordsAgg.bloom_words(positions(col("v"), bits), bits).as("bw"))
      .head().getSeq[Any](1)
    assert(one == many)
  }
}
