package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables
import graft.dedup.SimHashDedup

/** Perceptual average-hash: goldens are computed HERE from the pattern
  * definition (which grid cells are the light color), independently of the
  * codec path under test — the encoder/decoder never grades its own
  * homework.
  */
class PhashSpec extends SparkTestBase {
  import spark.implicits._

  private val dark = 0x202020
  private val light = 0xE0E0E0

  /** Expected aHash of a split tile: bits set on the light cells (the dark
    * cells sit below the mean, light above, strictly, whenever both tones
    * are present).
    */
  private def expectedHash(frac8: Int, vertical: Boolean): Long =
    (for {
      y <- 0 until 8; x <- 0 until 8
      if (if (vertical) y else x) >= frac8
    } yield 1L << (y * 8 + x)).foldLeft(0L)(_ | _)

  test("aHash matches the independently-computed bit pattern per split") {
    for (frac <- 1 to 7; vertical <- Seq(false, true)) {
      val png = MediaCodec.encodePngSplit(16, 24, frac, vertical, dark, light)
      assert(MediaCodec.averageHash64(png).contains(expectedHash(frac, vertical)),
        s"frac=$frac vertical=$vertical")
    }
  }

  test("aHash is invariant across render sizes and across a real NN resize") {
    val sizes = Seq((8, 8), (16, 8), (8, 24), (32, 24), (64, 64))
    val hashes = sizes.map { case (w, h) =>
      MediaCodec.averageHash64(
        MediaCodec.encodePngSplit(w, h, 3, vertical = false, dark, light)).get
    }
    assert(hashes.distinct.size == 1)
    // resizing an existing image (decode -> NN resample -> re-encode)
    // preserves the hash too: the dedup promise for resized copies
    val big = MediaCodec.encodePngSplit(64, 64, 3, vertical = false, dark, light)
    val small = MediaCodec.resizeNearest(big, 16, 16).get
    assert(MediaCodec.averageHash64(small) == MediaCodec.averageHash64(big))
  }

  test("solid tiles hash to 0 (strict threshold) and junk bytes to None") {
    assert(MediaCodec.averageHash64(MediaCodec.encodePng(9, 7, 0x336699)).contains(0L))
    assert(MediaCodec.averageHash64("not a png".getBytes).isEmpty)
    assert(MediaCodec.averageHash64(Array.empty[Byte]).isEmpty)
  }

  test("variant corpus groups exactly by pattern, across sizes") {
    val docs = Tables.documents(spark, sf001).limit(200)
    val imgs = Multimodal.synthesizeImageVariants(docs).cache()
    val ph = Multimodal.imagePhash(imgs).toDF()
    val joined = imgs.select("id", "pattern").join(ph, Seq("id"))
    // hash <-> pattern is a bijection on this corpus
    assert(joined.select("pattern", "phash").distinct().count() ==
      joined.select("pattern").distinct().count())
    assert(joined.select("phash").distinct().count() ==
      joined.select("pattern").distinct().count())
    // every declared pattern's hash equals the independent golden
    joined.select("pattern", "phash").distinct().collect().foreach { r =>
      val p = r.getInt(0)
      assert(r.getLong(1) == expectedHash((p % 7) + 1, p >= 7), s"pattern=$p")
    }
    imgs.unpersist()
  }

  test("Hamming near-pairs over phash find the one-column perturbation") {
    // two patterns differing in exactly one grid column (frac 3 vs 4) are
    // 8 bits apart; frac 1 vs 7 are 48 bits apart and must not pair
    val rows = Seq(
      (1L, MediaCodec.encodePngSplit(16, 16, 3, vertical = false, dark, light)),
      (2L, MediaCodec.encodePngSplit(24, 8, 4, vertical = false, dark, light)),
      (3L, MediaCodec.encodePngSplit(16, 16, 1, vertical = false, dark, light)),
      (4L, MediaCodec.encodePngSplit(16, 16, 7, vertical = false, dark, light))
    ).toDF("id", "content")
    val sigs = Multimodal.imagePhash(rows).toDF()
      .withColumnRenamed("phash", "simhash")
    val pairs = SimHashDedup.nearPairsOnSig(sigs, "id", maxHamming = 8)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 8)))
  }
}
