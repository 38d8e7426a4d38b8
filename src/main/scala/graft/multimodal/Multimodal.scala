package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata (brief requirement).
  *
  * The Spark-side plumbing — schema, partition-friendly batch iteration,
  * decode signature, feature shape — is real and tested. The actual media
  * decode is STUBBED (`fakeDecodeFeatures`): this container ships no
  * image/audio codecs, so a deterministic stand-in derives features from
  * the raw bytes. Swapping in a real decoder is a one-function change with
  * the same `Iterator[Row] => Iterator[Row]`-shaped contract.
  *
  * Scale notes: decode runs via mapPartitions (one codec init per
  * partition, not per row); binary payloads never shuffle — features are
  * extracted scan-side and only the (id, features) projection moves on.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType), StructField("width", IntegerType),
    StructField("height", IntegerType), StructField("duration_ms", LongType)))

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType),   // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", metaSchema)))

  final case class MediaFeatures(id: Long, modality: String, n_bytes: Int,
                                 features: Array[Float])

  /** STUB decode: real deployments replace this with an actual codec
    * (??? in spirit — deterministic fake so the plumbing is testable).
    * Features = 16-bin byte histogram, L1-normalized.
    */
  def fakeDecodeFeatures(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
    val total = math.max(1f, bytes.length.toFloat)
    hist.map(_ / total)
  }

  /** Feature extraction over media rows: mapPartitions so a real decoder
    * initializes once per partition and streams its batch.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val idIdx = media.schema.fieldIndex("id")
    val modIdx = media.schema.fieldIndex("modality")
    val binIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec handles, model, ...)
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) Array.empty[Byte]
                    else r.getAs[Array[Byte]](binIdx)
        MediaFeatures(r.getLong(idIdx), r.getString(modIdx), bytes.length,
          fakeDecodeFeatures(bytes))
      }
    }
  }

  /** Metadata-level resize plan (pure column op — the pixel work happens in
    * the decode stage): clamps the longer edge to `maxEdge` preserving
    * aspect ratio.
    */
  def resizePlan(media: DataFrame, maxEdge: Int): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = least(lit(1.0), lit(maxEdge) / greatest(w, h))
    media.withColumn("target_width", ceil(w * scale).cast("int"))
         .withColumn("target_height", ceil(h * scale).cast("int"))
  }

  /** Frame-sampling plan for video rows: evenly spaced sample timestamps
    * from the duration metadata (`n` frames), exploded to one row per
    * planned frame. Decode of the frame itself happens in the (stubbed)
    * decode stage.
    */
  def frameSamplePlan(media: DataFrame, n: Int): DataFrame =
    media.filter(col("modality") === "video")
      .withColumn("frame_ms", explode(
        transform(sequence(lit(0), lit(n - 1)),
          i => (col("meta.duration_ms") * i / n).cast("long"))))
      .select(col("id"), col("frame_ms"))

  /** Deterministic synthetic media corpus derived from the documents table
    * (for tests/demos; binary content = UTF-8 of the text).
    */
  def synthesizeFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        (col("doc_id") % 1000 + 100).cast("int").as("width"),
        (col("doc_id") % 800 + 80).cast("int").as("height"),
        (col("doc_id") * 40 + 1000).cast("long").as("duration_ms")).as("meta"))
}
