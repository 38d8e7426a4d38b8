package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata (brief requirement).
  *
  * Decode is REAL and JDK-native ([[MediaCodec]]): PNG/JPEG through
  * `javax.imageio` (dimensions, channel means), WAV through a RIFF chunk
  * walk (channels/rate/bits/duration, PCM16 RMS), MP4 through an ISO BMFF
  * box walk (movie timescale/duration, track count, handler types). Frame
  * PIXELS stay behind the one honest boundary left — the JDK ships no
  * video frame codec — but the sampling timestamps come from the parsed
  * container, not from claimed metadata.
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

  final case class MediaFeatures(id: Long, modality: String, kind: String,
                                 n_bytes: Int, features: Array[Float])

  /** Feature extraction over media rows: mapPartitions so a stateful codec
    * initializes once per partition and streams its batch. `kind` is the
    * container actually sniffed from the bytes (png/jpeg/wav/opaque) — it
    * can disagree with the claimed `modality`, which is itself a useful
    * data-quality signal.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val idIdx = media.schema.fieldIndex("id")
    val modIdx = media.schema.fieldIndex("modality")
    val binIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      // ImageIO is static/stateless; a handle-based codec would init here
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) Array.empty[Byte]
                    else r.getAs[Array[Byte]](binIdx)
        val (kind, feats) = MediaCodec.decode(bytes)
        MediaFeatures(r.getLong(idIdx), r.getString(modIdx), kind,
          bytes.length, feats)
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

  final case class ResizedImage(id: Long, src_width: Int, src_height: Int,
                                target_width: Int, target_height: Int,
                                n_bytes: Int, content: Array[Byte])

  /** REAL image resize (not just the plan): image rows decode, resize
    * nearest-neighbor to the aspect-preserving clamp of [[resizePlan]],
    * and re-encode as PNG — all inside mapPartitions, binary never
    * shuffles. Rows whose bytes don't decode are dropped (they carry no
    * pixels to resize); upscaling never happens (scale clamps at 1).
    */
  def resizeImages(media: DataFrame, maxEdge: Int): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    val idIdx = media.schema.fieldIndex("id")
    val binIdx = media.schema.fieldIndex("content")
    media.filter(col("modality") === "image").mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(binIdx)) Array.empty[Byte]
                    else r.getAs[Array[Byte]](binIdx)
        MediaCodec.resizeToMaxEdge(bytes, maxEdge)
          .map(o => ResizedImage(r.getLong(idIdx), o.srcW, o.srcH,
            o.targetW, o.targetH, o.png.length, o.png))
          .iterator
      }
    }
  }

  final case class AudioSegments(id: Long, n_segments: Int, segment_rms: Array[Float])

  /** REAL audio frame sampling: per-segment RMS over the PCM16 data chunk
    * (`nSegments` even spans) — the temporal profile a single global RMS
    * flattens. Non-WAV or non-PCM16 rows are dropped.
    */
  def audioSegments(media: DataFrame, nSegments: Int): Dataset[AudioSegments] = {
    import media.sparkSession.implicits._
    val idIdx = media.schema.fieldIndex("id")
    val binIdx = media.schema.fieldIndex("content")
    media.filter(col("modality") === "audio").mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(binIdx)) Array.empty[Byte]
                    else r.getAs[Array[Byte]](binIdx)
        MediaCodec.wavSegmentRms(bytes, nSegments)
          .map(seg => AudioSegments(r.getLong(idIdx), nSegments, seg)).iterator
      }
    }
  }

  /** Frame-sampling plan for video rows: evenly spaced sample timestamps
    * from the duration metadata (`n` frames), exploded to one row per
    * planned frame. Decode of the frame itself happens in the (stubbed)
    * decode stage. See [[videoMeta]]/[[frameSampleTimestamps]] for the
    * variant that derives the duration from the CONTAINER bytes instead of
    * trusting the claimed metadata.
    */
  def frameSamplePlan(media: DataFrame, n: Int): DataFrame =
    media.filter(col("modality") === "video")
      .withColumn("frame_ms", explode(
        transform(sequence(lit(0), lit(n - 1)),
          i => (col("meta.duration_ms") * i / n).cast("long"))))
      .select(col("id"), col("frame_ms"))

  final case class VideoMeta(id: Long, timescale: Long, duration_ms: Long,
                             n_tracks: Int, has_video: Boolean, has_audio: Boolean)

  /** REAL video container metadata: a pure-JDK MP4/ISO-BMFF box walk
    * ([[MediaCodec.mp4Meta]] — `moov/mvhd` timescale+duration, `trak`
    * count, `hdlr` types), no codec dependency. Rows whose bytes aren't a
    * parseable MP4 are dropped; the claimed `meta.duration_ms` is never
    * consulted — this is the decode-side truth the plan-level stub lacked.
    */
  def videoMeta(media: DataFrame): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    val idIdx = media.schema.fieldIndex("id")
    val binIdx = media.schema.fieldIndex("content")
    media.filter(col("modality") === "video").mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(binIdx)) Array.empty[Byte]
                    else r.getAs[Array[Byte]](binIdx)
        MediaCodec.mp4Meta(bytes)
          .map(m => VideoMeta(r.getLong(idIdx), m.timescale, m.durationMs,
            m.nTracks, m.hasVideo, m.hasAudio)).iterator
      }
    }
  }

  /** Executable frame sampling: `n` evenly spaced timestamps from the
    * PARSED container duration ([[videoMeta]]), one row per planned frame.
    * This is where a real pipeline would hand each (id, frame_ms) to a
    * codec; the JDK ships none, so the boundary is the timestamp list —
    * but the timestamps are now derived from the actual bytes.
    */
  def frameSampleTimestamps(media: DataFrame, n: Int): DataFrame =
    videoMeta(media).toDF()
      .withColumn("frame_ms", explode(
        transform(sequence(lit(0), lit(n - 1)),
          i => (col("duration_ms") * i / n).cast("long"))))
      .select(col("id"), col("frame_ms"))

  final case class ImagePhash(id: Long, phash: Long)

  /** Perceptual hash per image row ([[MediaCodec.averageHash64]]): the
    * image-dedup fingerprint. Same mapPartitions discipline as the other
    * decode stages — binary never shuffles, only (id, 64-bit hash) moves
    * on, so downstream grouping/Hamming-joining touches 8 bytes per image
    * regardless of image size. Undecodable rows are dropped.
    */
  def imagePhash(media: DataFrame, idCol: String = "id",
                 binCol: String = "content"): Dataset[ImagePhash] = {
    import media.sparkSession.implicits._
    val idIdx = media.schema.fieldIndex(idCol)
    val binIdx = media.schema.fieldIndex(binCol)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(binIdx)) Array.empty[Byte]
                    else r.getAs[Array[Byte]](binIdx)
        MediaCodec.averageHash64(bytes)
          .map(h => ImagePhash(r.getLong(idIdx), h)).iterator
      }
    }
  }

  final case class VideoFramePhash(id: Long, n_frames: Int,
                                   frame_hashes: Array[Long], video_phash: Long)

  /** REAL video frame pixels: decode every MJPEG (JPEG-in-MP4) sample via
    * the parsed stsd/stsz/stsc/stco tables ([[MediaCodec.mjpegFramePhashes]])
    * and perceptual-hash each frame. `video_phash` is the per-bit MAJORITY
    * vote across frame hashes (ties -> 0): resized/re-encoded copies of the
    * same footage collapse to one signature, and near-miss videos sit at a
    * small Hamming distance — so video near-dup becomes the same 8-bytes-
    * per-row relational problem as mm5, sharing
    * [[graft.dedup.SimHashDedup.nearPairsOnSig]]. Rows that aren't MJPEG
    * MP4s (or decode to zero frames) are dropped; the codec boundary is
    * now per-codec (JDK decodes JPEG, not H.264), not per-container.
    */
  def videoFramePhashes(media: DataFrame, idCol: String = "id",
                        binCol: String = "content"): Dataset[VideoFramePhash] = {
    import media.sparkSession.implicits._
    val idIdx = media.schema.fieldIndex(idCol)
    val binIdx = media.schema.fieldIndex(binCol)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(binIdx)) Array.empty[Byte]
                    else r.getAs[Array[Byte]](binIdx)
        MediaCodec.mjpegFramePhashes(bytes).filter(_.nonEmpty).map { hs =>
          var vote = 0L
          var bit = 0
          while (bit < 64) {
            var ones = 0
            hs.foreach(h => if ((h >>> bit & 1L) == 1L) ones += 1)
            if (2 * ones > hs.length) vote |= 1L << bit
            bit += 1
          }
          VideoFramePhash(r.getLong(idIdx), hs.length, hs, vote)
        }.iterator
      }
    }
  }

  final case class MjpegVariant(id: Long, pattern: Int, content: Array[Byte])

  /** Deterministic video-dedup corpus: each doc renders a 3-frame MJPEG
    * whose frames are two-tone JPEG tiles ([[MediaCodec.encodeJpegSplit]])
    * of an id-derived pattern sequence, at an id-dependent RESOLUTION —
    * different bytes, same perceptual content per pattern, the video
    * analogue of [[synthesizeImageVariants]].
    */
  def synthesizeMjpegVariants(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // spreadForCpu: see synthesizeFromDocuments — JPEG encode + MP4 mux
    // per row must not run on row-group-count threads
    graft.core.Tables.spreadForCpu(docs.select(col("doc_id").cast("long")))
      .as[Long].mapPartitions { it =>
      it.map { id =>
        val p = (id % 7).toInt
        val w = 8 * ((id % 4) + 1).toInt
        val h = 8 * ((id % 3) + 1).toInt
        val frames = (0 until 3).map { f =>
          MediaCodec.encodeJpegSplit(w, h, ((p + f) % 7) + 1,
            vertical = f % 2 == 0, rgbA = 0x101010, rgbB = 0xF0F0F0)
        }
        MjpegVariant(id, p,
          MediaCodec.encodeMjpegMp4(timescale = 1000, frameDelta = 40,
            frames = frames, width = w, height = h))
      }
    }.toDF()
  }

  final case class ImageVariant(id: Long, pattern: Int, content: Array[Byte])

  /** Deterministic image-dedup corpus: 14 two-tone patterns (7 horizontal
    * + 7 vertical split fractions), each rendered at a doc_id-dependent
    * size with all edges multiples of 8 — so every rendition of a pattern
    * is a DIFFERENT byte payload (different dimensions) but the SAME
    * perceptual content, which is exactly the situation image dedup
    * exists for (re-encoded/resized copies of one image).
    */
  def synthesizeImageVariants(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // spreadForCpu: see synthesizeFromDocuments
    graft.core.Tables.spreadForCpu(docs.select(col("doc_id").cast("long")))
      .as[Long].mapPartitions { it =>
      it.map { id =>
        val p = (id % 14).toInt
        val frac = (p % 7) + 1
        val w = 8 * ((id % 4) + 1).toInt
        val h = 8 * ((id % 3) + 1).toInt
        ImageVariant(id, p, MediaCodec.encodePngSplit(
          w, h, frac, vertical = p >= 7, rgbA = 0x202020, rgbB = 0xE0E0E0))
      }
    }.toDF()
  }

  // NOT private: the Janino-compiled encoder calls these accessors from
  // generated Java — `private` makes that an illegal access, and Spark
  // silently falls back to the interpreted (non-codegen) serializer for
  // every synthesize batch.
  final case class MediaMeta(mime: String, width: Option[Int],
                             height: Option[Int], duration_ms: Option[Long])
  final case class MediaRow(id: Long, modality: String,
                            content: Array[Byte], meta: MediaMeta)

  /** Deterministic media corpus derived from the documents table (for
    * tests/demos). Image rows carry REAL PNG bytes (tiny solid-color tiles,
    * size/color keyed off doc_id), audio rows carry REAL PCM16 WAV bytes
    * (square wave, amplitude/length keyed off doc_id), so the decode stage
    * exercises actual codecs end-to-end. Video rows stay opaque (UTF-8 of
    * the text) — the JDK has no video encoder either — with plan-level
    * metadata for resize/frame-sample.
    */
  def synthesizeFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // spread the CPU-heavy codec work before entering mapPartitions: a
    // small documents scan has one partition per parquet row group (five
    // at sf0.1), which pins all the JDK encode/decode work to that many
    // threads no matter how many cores exist; at real scale the scan has
    // thousands of splits and the spread is a no-op (Tables.spreadForCpu)
    graft.core.Tables.spreadForCpu(
        docs.select(col("doc_id").cast("long"), col("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          (id % 3) match {
            case 0 =>
              val w = (id % 13 + 3).toInt
              val h = (id % 7 + 2).toInt
              val rgb = ((id * 2654435761L) & 0xffffffL).toInt
              MediaRow(id, "image", MediaCodec.encodePng(w, h, rgb),
                MediaMeta("image/png", Some(w), Some(h), None))
            case 1 =>
              val n = (id % 400 + 160).toInt
              val amp = ((id % 9 + 1) * 3000).toShort
              val period = (id % 8 + 2).toInt
              val samples = Array.tabulate(n) { i =>
                if ((i / period) % 2 == 0) amp else (-amp).toShort
              }
              MediaRow(id, "audio", MediaCodec.encodeWav(8000, samples),
                MediaMeta("audio/wav", None, None, Some(n * 1000L / 8000)))
            case _ =>
              // REAL minimal MP4 container (ftyp+moov+mdat): mvhd declares
              // the duration, the text rides in mdat as the opaque payload
              // — so the box walk parses actual bytes, not claimed metadata
              val durMs = id * 40 + 1000
              MediaRow(id, "video",
                MediaCodec.encodeMp4(timescale = 1000, duration = durMs,
                  handlers = if (id % 2 == 0) Seq("vide") else Seq("vide", "soun"),
                  payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
                MediaMeta("video/mp4",
                  Some((id % 1000 + 100).toInt), Some((id % 800 + 80).toInt),
                  Some(durMs)))
          }
        }
      }
      .toDF()
  }
}
