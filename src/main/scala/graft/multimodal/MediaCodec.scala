package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII
import javax.imageio.ImageIO

/** JDK-native media codec for the multimodal pipeline: no external
  * dependency, real bytes in, real features out.
  *
  *  - PNG/JPEG decode via `javax.imageio` → dimensions + per-channel means.
  *  - WAV via a RIFF chunk walk → channels/rate/bits/duration + PCM16 RMS.
  *  - Anything else (incl. video — the JDK ships no video codec) falls back
  *    to a 16-bin byte histogram, the engine's documented opaque-content
  *    feature.
  *
  * The reference treats media as opaque attachments around its tabular flow
  * (/root/reference/dags/Funciones_CotyData.py:349 ships files whole); the
  * engine goes further and extracts features scan-side so only small
  * vectors move through shuffles.
  */
object MediaCodec {

  // in-memory streams only — the default disk-backed ImageIO cache would
  // add a temp-file write per decoded image on every executor
  ImageIO.setUseCache(false)

  /** Container sniffed from magic bytes: "png" | "jpeg" | "wav" | "opaque". */
  def sniff(bytes: Array[Byte]): String = {
    def at(i: Int): Int = bytes(i) & 0xff
    if (bytes.length >= 8 && at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (bytes.length >= 3 && at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if (bytes.length >= 12 &&
      new String(bytes, 0, 4, US_ASCII) == "RIFF" &&
      new String(bytes, 8, 4, US_ASCII) == "WAVE") "wav"
    else "opaque"
  }

  /** Decode: (container kind, feature vector). Image features are
    * `[width, height, meanR, meanG, meanB]` with means in 0..1; WAV features
    * are `[channels, sample_rate, bits_per_sample, duration_ms, rms]` with
    * RMS normalized to 0..1 of full-scale PCM16; opaque content gets the
    * L1-normalized 16-bin byte histogram. A corrupt header demotes the row
    * to opaque rather than failing the partition.
    */
  def decode(bytes: Array[Byte]): (String, Array[Float]) =
    sniff(bytes) match {
      case k @ ("png" | "jpeg") =>
        imageFeatures(bytes).map((k, _)).getOrElse(("opaque", byteHistogram(bytes)))
      case "wav" =>
        wavFeatures(bytes).map(("wav", _)).getOrElse(("opaque", byteHistogram(bytes)))
      case _ => ("opaque", byteHistogram(bytes))
    }

  def imageFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    // ImageIO returns null for unreadable images but THROWS on truncated
    // headers — both demote to the opaque fallback
    scala.util.Try(Option(ImageIO.read(new ByteArrayInputStream(bytes))))
      .toOption.flatten.map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      var (r, g, b) = (0L, 0L, 0L)
      // bulk row reads: per-pixel getRGB(x,y) goes through ImageIO's slow
      // color-model path per call and dominates decode cost at real image
      // sizes in the mapPartitions stage
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val px = row(x)
          r += (px >> 16) & 0xff; g += (px >> 8) & 0xff; b += px & 0xff
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h * 255).toFloat
      Array(w.toFloat, h.toFloat, r / n, g / n, b / n)
    }

  def wavFeatures(bytes: Array[Byte]): Option[Array[Float]] = {
    if (sniff(bytes) != "wav") return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // One walk locates both chunks, data stats are computed AFTER it — the
    // RIFF spec doesn't order chunks, so fmt fields (bits/byteRate) must
    // not be read mid-scan of a data chunk that precedes fmt.
    var (channels, rate, bits) = (0, 0, 0)
    var byteRate = 0
    var (dataPos, dataSize) = (-1, 0)
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, US_ASCII)
      val size = bb.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      id match {
        case "fmt " if size >= 16 =>
          channels = bb.getShort(pos + 10)
          rate = bb.getInt(pos + 12)
          byteRate = bb.getInt(pos + 16)
          bits = bb.getShort(pos + 22)
        case "data" => dataPos = pos + 8; dataSize = size
        case _ => ()
      }
      pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (channels == 0 || rate == 0) return None
    var durationMs = 0f
    var rms = 0f
    if (dataPos >= 0) {
      if (byteRate > 0) durationMs = dataSize * 1000f / byteRate
      if (bits == 16) {
        var sumSq = 0.0
        var i = dataPos
        val end = dataPos + (dataSize & ~1)
        while (i < end) { val s = bb.getShort(i).toDouble; sumSq += s * s; i += 2 }
        val n = math.max(1, dataSize / 2)
        rms = (math.sqrt(sumSq / n) / 32768.0).toFloat
      }
    }
    Some(Array(channels.toFloat, rate.toFloat, bits.toFloat, durationMs, rms))
  }

  /** Deterministic nearest-neighbor resample of one decoded image,
    * re-encoded as PNG. Manual NN over bulk row buffers — not Graphics2D
    * scaling, whose interpolation may vary across JVMs; pixel mapping is
    * pure integer math, so the same bytes resize identically on every
    * executor.
    */
  private def resamplePng(img: BufferedImage, targetW: Int, targetH: Int): Array[Byte] = {
    val (sw, sh) = (img.getWidth, img.getHeight)
    val out = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
    val srcRow = new Array[Int](sw)
    val dstRow = new Array[Int](targetW)
    var y = 0
    while (y < targetH) {
      img.getRGB(0, ((y.toLong * sh) / targetH).toInt, sw, 1, srcRow, 0, sw)
      var x = 0
      while (x < targetW) {
        dstRow(x) = srcRow((x.toLong * sw / targetW).toInt)
        x += 1
      }
      out.setRGB(0, y, targetW, 1, dstRow, 0, targetW)
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  def resizeNearest(bytes: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    scala.util.Try(Option(ImageIO.read(new ByteArrayInputStream(bytes))))
      .toOption.flatten.map(resamplePng(_, targetW, targetH))

  final case class Resized(srcW: Int, srcH: Int, targetW: Int, targetH: Int,
                           png: Array[Byte])

  /** Decode ONCE, clamp the long edge to `maxEdge` preserving aspect
    * (never upscaling), resample, re-encode. The single decode matters:
    * decode dominates per-row cost at real image sizes in the
    * mapPartitions stage.
    */
  def resizeToMaxEdge(bytes: Array[Byte], maxEdge: Int): Option[Resized] =
    scala.util.Try(Option(ImageIO.read(new ByteArrayInputStream(bytes))))
      .toOption.flatten.map { img =>
        val (sw, sh) = (img.getWidth, img.getHeight)
        val scale = math.min(1.0, maxEdge.toDouble / math.max(sw, sh))
        val tw = math.max(1, math.ceil(sw * scale).toInt)
        val th = math.max(1, math.ceil(sh * scale).toInt)
        Resized(sw, sh, tw, th, resamplePng(img, tw, th))
      }

  /** Per-segment RMS over a PCM16 WAV: the data chunk splits into
    * `nSegments` even spans (frame sampling for audio — the temporal
    * feature a single global RMS flattens away). Same two-phase chunk
    * walk as [[wavFeatures]], so chunk order doesn't matter.
    */
  def wavSegmentRms(bytes: Array[Byte], nSegments: Int): Option[Array[Float]] = {
    if (sniff(bytes) != "wav" || nSegments <= 0) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var bits = 0
    var (dataPos, dataSize) = (-1, 0)
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, US_ASCII)
      val size = bb.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      id match {
        case "fmt " if size >= 16 => bits = bb.getShort(pos + 22)
        case "data" => dataPos = pos + 8; dataSize = size
        case _ => ()
      }
      pos += 8 + size + (size & 1)
    }
    if (bits != 16 || dataPos < 0) return None
    val nSamples = dataSize / 2
    if (nSamples == 0) return Some(Array.fill(nSegments)(0f))
    Some(Array.tabulate(nSegments) { seg =>
      val from = (seg.toLong * nSamples / nSegments).toInt
      val until = ((seg + 1).toLong * nSamples / nSegments).toInt
      if (until <= from) 0f
      else {
        var sumSq = 0.0
        var i = from
        while (i < until) { val v = bb.getShort(dataPos + 2 * i).toDouble; sumSq += v * v; i += 1 }
        (math.sqrt(sumSq / (until - from)) / 32768.0).toFloat
      }
    })
  }

  /** Opaque-content fallback: 16-bin byte histogram, L1-normalized. */
  def byteHistogram(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
    val total = math.max(1f, bytes.length.toFloat)
    hist.map(_ / total)
  }

  /** Deterministic tiny PNG: `w`×`h` solid `rgb` — real ImageIO encode, so
    * decode round-trips dimensions and exact channel means.
    */
  def encodePng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic PCM16 mono WAV from raw samples. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataSize).put("WAVE".getBytes(US_ASCII))
    bb.put("fmt ".getBytes(US_ASCII)).putInt(16).putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes(US_ASCII)).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }
}
