package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.HashImpls

class ZorderSpec extends SparkTestBase {
  import spark.implicits._

  test("zorder2 kernel matches the bit-by-bit definition") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val x = rnd.nextInt(1 << 16).toLong
      val y = rnd.nextInt(1 << 16).toLong
      val expect = (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
      assert(HashImpls.zorder2(x, y, 16) == expect, s"($x,$y)")
    }
    // axis walks: x occupies even bits, y odd bits
    assert(HashImpls.zorder2(0b1111L, 0L, 4) == 0b01010101L)
    assert(HashImpls.zorder2(0L, 0b1111L, 4) == 0b10101010L)
    assert(HashImpls.zorder2(0L, 0L, 32) == 0L)
  }

  test("zorder3 kernel matches the bit-by-bit definition; axes land on strides") {
    val rnd = new scala.util.Random(11)
    (1 to 100).foreach { _ =>
      val (x, y, z) = (rnd.nextInt(1 << 21).toLong, rnd.nextInt(1 << 21).toLong,
        rnd.nextInt(1 << 21).toLong)
      val expect = (0 until 21).map { i =>
        (((x >> i) & 1L) << (3 * i)) | (((y >> i) & 1L) << (3 * i + 1)) |
          (((z >> i) & 1L) << (3 * i + 2))
      }.reduce(_ | _)
      assert(HashImpls.zorder3(x, y, z, 21) == expect, s"($x,$y,$z)")
    }
    assert(HashImpls.zorder3(0b111L, 0L, 0L, 3) == 0b001001001L)
    assert(HashImpls.zorder3(0L, 0b111L, 0L, 3) == 0b010010010L)
    assert(HashImpls.zorder3(0L, 0L, 0b111L, 3) == 0b100100100L)
  }

  test("zorder_key through the SQL surface matches the Column API, incl. int inputs") {
    val df = spark.range(100)
      .select((col("id") % 16).cast("int").as("x"), (col("id") / 16).cast("int").as("y"))
    df.createOrReplaceTempView("zv")
    val viaSql = spark.sql("SELECT zorder_key(x, y, 4) AS z FROM zv ORDER BY x, y")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.orderBy("x", "y")
      .select(graft.functions.functions.zorder_key(col("x"), col("y"), 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)
  }

  test("zorder_key3 through the SQL surface matches the Column API") {
    val df = spark.range(60)
      .select((col("id") % 4).cast("int").as("x"),
        ((col("id") / 4) % 4).cast("int").as("y"),
        (col("id") / 16).cast("int").as("z"))
    df.createOrReplaceTempView("zv3")
    val viaSql = spark.sql("SELECT zorder_key3(x, y, z, 3) AS k FROM zv3 ORDER BY x, y, z")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.orderBy("x", "y", "z")
      .select(Zorder.zkey3(col("x"), col("y"), col("z"), 3).as("k"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)
  }

  test("quantize is monotone and clamps to the grid") {
    val df = Seq(-5.0, 0.0, 50.0, 100.0, 200.0).toDF("v")
      .select(Zorder.quantize(col("v"), 0.0, 100.0, bits = 8).as("q"))
    val qs = df.collect().map(_.getLong(0)).toSeq
    assert(qs == qs.sorted, "monotone")
    assert(qs.head == 0L && qs.last == 255L, "clamped")
  }

  test("Z-ordered layout bounds every partition to a compact rectangle; single-column sort does not") {
    // uniform 64x64 grid, one row per cell
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val nParts = 16

    def partEnvelopes(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Long)] =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    val zparts = partEnvelopes(Zorder.cluster(grid, col("x"), col("y"), nParts, bits = 6))
    val xparts = partEnvelopes(grid.repartitionByRange(nParts, col("x")))

    // area of the min/max envelope, summed: ideal = 4096 (disjoint tiles).
    // Z-order stays within a small factor of ideal; x-sorted partitions
    // each span the full y range (envelope area ~ 64 * x-width each).
    def area(e: (Long, Long, Long, Long)) = (e._2 - e._1 + 1) * (e._4 - e._3 + 1)
    val zArea = zparts.map(area).sum
    val xArea = xparts.map(area).sum
    assert(zArea <= 3 * 4096, s"z envelopes too loose: $zArea")
    assert(xArea >= 60L * 64, s"x-sorted control unexpectedly tight: $xArea")

    // skipping: fraction of partitions whose envelope overlaps a y-band
    // predicate (y in [8, 15]) — the dimension the x-sort knows nothing of
    val zHit = zparts.count(e => e._4 >= 8 && e._3 <= 15)
    val xHit = xparts.count(e => e._4 >= 8 && e._3 <= 15)
    assert(xHit == nParts, "every x-sorted partition spans every y band")
    assert(zHit <= nParts / 2, s"z layout should prune y-band scans, hit $zHit")
  }

  test("parquet written from the Z layout exposes prunable min/max on both columns") {
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Zorder.cluster(grid, col("x"), col("y"), 16, bits = 6)
      .write.mode("overwrite").parquet(dir)
    // per-file envelopes from the files themselves
    val stats = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      .collect()
    assert(stats.length >= 8, "expected multiple files")
    val areas = stats.map(r => (r.getLong(2) - r.getLong(1) + 1) * (r.getLong(4) - r.getLong(3) + 1))
    assert(areas.sum <= 3 * 4096, s"file envelopes too loose: ${areas.sum}")
  }
}
