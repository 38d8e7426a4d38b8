package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables

class MultimodalSpec extends SparkTestBase {

  private lazy val media =
    Multimodal.synthesizeFromDocuments(Tables.documents(spark, sf001)).cache()

  test("synthesized media matches the multimodal schema") {
    assert(media.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(media.select("meta.width").head().getInt(0) > 0)
    assert(media.select(countDistinct("modality")).head().getLong(0) == 3)
  }

  test("extractFeatures: mapPartitions decode produces normalized features") {
    val feats = Multimodal.extractFeatures(media)
    val f = feats.filter(col("id") === 0).head()
    assert(f.features.length == 16)
    assert(math.abs(f.features.sum - 1.0f) < 1e-3, "histogram must be L1-normalized")
    assert(f.n_bytes > 0)
    // deterministic across partitionings
    val a = Multimodal.extractFeatures(media.repartition(1))
      .orderBy("id").collect().map(_.features.toSeq).toSeq
    val b = Multimodal.extractFeatures(media.repartition(7))
      .orderBy("id").collect().map(_.features.toSeq).toSeq
    assert(a == b)
  }

  test("resizePlan clamps the long edge preserving aspect") {
    val out = Multimodal.resizePlan(media, maxEdge = 64)
    val r = out.select("meta.width", "meta.height", "target_width", "target_height")
      .filter(col("meta.width") > 64).head()
    val (w, h, tw, th) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
    assert(math.max(tw, th) <= 65) // ceil can add 1
    assert(math.abs(tw.toDouble / th - w.toDouble / h) < 0.1)
    // small media untouched
    assert(Multimodal.resizePlan(media, 10000)
      .filter(col("target_width") =!= col("meta.width")).count() == 0)
  }

  test("frameSamplePlan emits n evenly spaced frames per video") {
    val plan = Multimodal.frameSamplePlan(media, n = 4)
    val videos = media.filter(col("modality") === "video").count()
    assert(plan.count() == videos * 4)
    val frames = plan.filter(col("id") === 2).orderBy("frame_ms")
      .select("frame_ms").collect().map(_.getLong(0)).toSeq
    val dur = media.filter(col("id") === 2).select("meta.duration_ms").head().getLong(0)
    assert(frames == Seq(0L, dur / 4, dur / 2, dur * 3 / 4))
  }
}
