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
  *  - MP4 via an ISO BMFF box walk → movie timescale/duration, track
  *    count, handler types (frame pixels need a codec the JDK doesn't
  *    ship; the container level is real).
  *  - Anything else falls back to a 16-bin byte histogram, the engine's
  *    documented opaque-content feature.
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

  /** Container sniffed from magic bytes:
    * "png" | "jpeg" | "wav" | "mp4" | "opaque".
    */
  def sniff(bytes: Array[Byte]): String = {
    def at(i: Int): Int = bytes(i) & 0xff
    if (bytes.length >= 8 && at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (bytes.length >= 3 && at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if (bytes.length >= 12 &&
      new String(bytes, 0, 4, US_ASCII) == "RIFF" &&
      new String(bytes, 8, 4, US_ASCII) == "WAVE") "wav"
    else if (bytes.length >= 12 && new String(bytes, 4, 4, US_ASCII) == "ftyp") "mp4"
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
      case "mp4" =>
        // container metadata only — the JDK ships no video frame codec, so
        // features stop at the moov level: [duration_ms, timescale,
        // n_tracks, has_video, has_audio]
        mp4Meta(bytes).map(m => ("mp4", Array(
          m.durationMs.toFloat, m.timescale.toFloat, m.nTracks.toFloat,
          if (m.hasVideo) 1f else 0f, if (m.hasAudio) 1f else 0f)))
          .getOrElse(("opaque", byteHistogram(bytes)))
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

  /** Perceptual average-hash (aHash) of one image: decode, NN-downsample
    * to the 8x8 grid (the same integer pixel mapping as [[resamplePng]],
    * so hashing an already-resized copy of an image gives the SAME hash —
    * that scale invariance is the whole point of a perceptual hash), take
    * integer luminance per cell (299r+587g+114b milli-lum, no floats), and
    * set bit y*8+x iff the cell is STRICTLY brighter than the grid mean.
    * Strict keeps a solid tile at hash 0 instead of all-ones flicker on
    * rounding. All arithmetic is integer, so the same bytes hash
    * identically on every executor. Undecodable bytes -> None.
    */
  def averageHash64(bytes: Array[Byte]): Option[Long] =
    scala.util.Try(Option(ImageIO.read(new ByteArrayInputStream(bytes))))
      .toOption.flatten.map { img =>
        val (sw, sh) = (img.getWidth, img.getHeight)
        val lum = new Array[Long](64)
        val srcRow = new Array[Int](sw)
        var y = 0
        while (y < 8) {
          img.getRGB(0, ((y.toLong * sh) / 8).toInt, sw, 1, srcRow, 0, sw)
          var x = 0
          while (x < 8) {
            val px = srcRow((x.toLong * sw / 8).toInt)
            lum(y * 8 + x) = 299L * ((px >> 16) & 0xff) +
              587L * ((px >> 8) & 0xff) + 114L * (px & 0xff)
            x += 1
          }
          y += 1
        }
        val total = lum.sum
        var h = 0L
        var i = 0
        while (i < 64) {
          if (lum(i) * 64 > total) h |= 1L << i
          i += 1
        }
        h
      }

  /** Two-tone test tile: an 8-cell grid split at `frac8`/8 (vertical =
    * top/bottom, else left/right), color A below the split, B at or above.
    * The split lands on cell boundaries whenever w and h are multiples of
    * 8, which makes the [[averageHash64]] of every size of the same
    * pattern bit-identical — the fixture generator for perceptual-hash
    * tests and the mm5 corpus.
    */
  def encodePngSplit(w: Int, h: Int, frac8: Int, vertical: Boolean,
                     rgbA: Int, rgbB: Int): Array[Byte] = {
    require(frac8 >= 0 && frac8 <= 8, s"frac8 must be in [0,8], got $frac8")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val cell = if (vertical) cy else x * 8 / w
        row(x) = if (cell < frac8) rgbA else rgbB
        x += 1
      }
      img.setRGB(0, y, w, 1, row, 0, w)
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

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

  // ---- MP4 / ISO BMFF (ISO 14496-12) container metadata ----------------

  final case class Mp4Meta(timescale: Long, duration: Long, nTracks: Int,
                           hasVideo: Boolean, hasAudio: Boolean) {
    def durationMs: Long =
      if (timescale > 0) duration * 1000L / timescale else 0L
  }

  /** One box header at `pos`: (payloadStart, boxEnd, type). ISO BMFF boxes
    * are [size:u32][type:4cc]; size==1 moves the real size to a following
    * u64 ("largesize"), size==0 extends the box to the end of the file.
    * Returns None on any malformed header — truncated sizes, overflow,
    * boxes running past the buffer.
    */
  private def boxAt(bytes: Array[Byte], pos: Int, limit: Int): Option[(Int, Int, String)] = {
    if (pos + 8 > limit) return None
    val bb = ByteBuffer.wrap(bytes)
    val size32 = bb.getInt(pos).toLong & 0xffffffffL
    val tpe = new String(bytes, pos + 4, 4, US_ASCII)
    val (payload, end) =
      if (size32 == 0) (pos + 8L, limit.toLong) // to end of enclosing scope
      else if (size32 == 1) {
        if (pos + 16 > limit) return None
        (pos + 16L, pos + bb.getLong(pos + 8))
      } else (pos + 8L, pos + size32)
    if (end < payload || end > limit) None
    else Some((payload.toInt, end.toInt, tpe))
  }

  /** Walk the direct children of [from, limit), yielding
    * (payloadStart, boxEnd, type). Stops at the first malformed header.
    * Cannot loop: [[boxAt]] guarantees end >= payloadStart > headerStart,
    * so the cursor strictly advances.
    */
  private def boxes(bytes: Array[Byte], from: Int, limit: Int): Iterator[(Int, Int, String)] =
    new Iterator[(Int, Int, String)] {
      private var nextBox = boxAt(bytes, from, limit)
      def hasNext: Boolean = nextBox.isDefined
      def next(): (Int, Int, String) = {
        val b = nextBox.get
        nextBox = boxAt(bytes, b._2, limit)
        b
      }
    }

  /** Pure-JDK MP4 metadata: movie timescale + duration from `moov/mvhd`
    * (version 0 and 1 layouts), track count from `moov/trak`, and the
    * handler types from `trak/mdia/hdlr` ('vide'/'soun'). No codec — just
    * the binary box walk (the same approach that made [[graft.sources.Xlsx]]
    * real without a spreadsheet dependency). Returns None when no parseable
    * `mvhd` exists.
    */
  def mp4Meta(bytes: Array[Byte]): Option[Mp4Meta] = {
    if (sniff(bytes) != "mp4") return None
    val bb = ByteBuffer.wrap(bytes)
    val moov = boxes(bytes, 0, bytes.length).collectFirst {
      case (p, e, "moov") => (p, e)
    }
    moov.flatMap { case (mp, me) =>
      var timescale = -1L
      var duration = 0L
      var nTracks = 0
      var hasVideo = false
      var hasAudio = false
      boxes(bytes, mp, me).foreach {
        case (p, e, "mvhd") if p + 4 <= e =>
          val version = bytes(p) & 0xff
          if (version == 0 && p + 24 <= e) {
            timescale = bb.getInt(p + 12).toLong & 0xffffffffL
            duration = bb.getInt(p + 16).toLong & 0xffffffffL
          } else if (version == 1 && p + 36 <= e) {
            timescale = bb.getInt(p + 20).toLong & 0xffffffffL
            duration = bb.getLong(p + 24)
          }
        case (p, e, "trak") =>
          nTracks += 1
          for {
            (mdp, mde, _) <- boxes(bytes, p, e).filter(_._3 == "mdia")
            (hp, he, _) <- boxes(bytes, mdp, mde).filter(_._3 == "hdlr")
            if hp + 12 <= he
          } {
            new String(bytes, hp + 8, 4, US_ASCII) match {
              case "vide" => hasVideo = true
              case "soun" => hasAudio = true
              case _ => ()
            }
          }
        case _ => ()
      }
      if (timescale < 0) None
      else Some(Mp4Meta(timescale, duration, nTracks, hasVideo, hasAudio))
    }
  }

  // ---- MP4 sample tables (stbl) + MJPEG frame decode --------------------

  /** The video track's sample layout, resolved from the `stbl` tables:
    * `codec` is the stsd sample-entry fourcc ("jpeg" for JPEG-in-MP4 /
    * MJPEG), `sizes(i)`/`offsets(i)` locate sample i's bytes in the file.
    * Offsets come from expanding the stsc chunk runs over the stco chunk
    * offsets and accumulating stsz sizes within each chunk — the full
    * ISO 14496-12 resolution, not a writer-specific shortcut.
    */
  final case class Mp4SampleTable(codec: String, width: Int, height: Int,
                                  sizes: Array[Int], offsets: Array[Long])

  /** Parse the FIRST video (`hdlr` = 'vide') track's sample table. Returns
    * None when any required table (stsd/stsz/stsc/stco) is missing or
    * malformed, or any resolved sample falls outside the buffer. u32
    * `stco` only (no `co64`): a Spark binary cell is capped at 2 GB, so
    * 32-bit offsets cover every payload this engine can hold anyway.
    */
  def mp4VideoSamples(bytes: Array[Byte]): Option[Mp4SampleTable] = {
    if (sniff(bytes) != "mp4") return None
    val bb = ByteBuffer.wrap(bytes)
    def u32(i: Int): Long = bb.getInt(i).toLong & 0xffffffffL
    val stbls = for {
      (mp, me, _) <- boxes(bytes, 0, bytes.length).filter(_._3 == "moov")
      (tp, te, _) <- boxes(bytes, mp, me).filter(_._3 == "trak")
      (mdp, mde, _) <- boxes(bytes, tp, te).filter(_._3 == "mdia")
      // this trak must be the video handler
      isVide = boxes(bytes, mdp, mde).exists { case (hp, he, t) =>
        t == "hdlr" && hp + 12 <= he &&
          new String(bytes, hp + 8, 4, US_ASCII) == "vide"
      }
      if isVide
      (mip, mie, _) <- boxes(bytes, mdp, mde).filter(_._3 == "minf")
      (sp, se, _) <- boxes(bytes, mip, mie).filter(_._3 == "stbl")
    } yield (sp, se)
    stbls.nextOption().flatMap { case (sp, se) =>
      var codec: String = null
      var (width, height) = (0, 0)
      var sizes: Array[Int] = null
      var chunkOffsets: Array[Long] = null
      var stscRuns: Array[(Long, Long)] = null // (first_chunk, samples_per_chunk)
      boxes(bytes, sp, se).foreach {
        case (p, e, "stsd") if p + 8 <= e =>
          // version/flags, entry_count, then the first sample entry:
          // [size][fourcc] ... width@+32 height@+34 (VisualSampleEntry)
          if (u32(p + 4) >= 1 && p + 16 <= e) {
            codec = new String(bytes, p + 12, 4, US_ASCII)
            if (p + 8 + 36 <= e) {
              width = bb.getShort(p + 8 + 32).toInt & 0xffff
              height = bb.getShort(p + 8 + 34).toInt & 0xffff
            }
          }
        case (p, e, "stsz") if p + 12 <= e =>
          val fixed = u32(p + 4)
          val n = u32(p + 8)
          // sample count can't exceed the buffer (samples are >= 1 byte):
          // bounds a malformed count before it allocates
          if (n <= bytes.length) {
            if (fixed != 0) sizes = Array.fill(n.toInt)(fixed.toInt)
            else if (p + 12 + 4L * n <= e)
              sizes = Array.tabulate(n.toInt)(i => u32(p + 12 + 4 * i).toInt)
          }
        case (p, e, "stsc") if p + 8 <= e =>
          val n = u32(p + 4)
          if (p + 8 + 12L * n <= e)
            stscRuns = Array.tabulate(n.toInt)(i =>
              (u32(p + 8 + 12 * i), u32(p + 12 + 12 * i)))
        case (p, e, "stco") if p + 8 <= e =>
          val n = u32(p + 4)
          if (p + 8 + 4L * n <= e)
            chunkOffsets = Array.tabulate(n.toInt)(i => u32(p + 8 + 4 * i))
        case _ => ()
      }
      if (codec == null || sizes == null || chunkOffsets == null ||
          stscRuns == null || stscRuns.isEmpty) return None
      // expand stsc runs over the chunks, accumulating sizes within each
      val offsets = new Array[Long](sizes.length)
      var sample = 0
      var chunk = 0
      while (sample < sizes.length && chunk < chunkOffsets.length) {
        // samples-per-chunk = the last run whose first_chunk <= chunk+1
        var spc = 0L
        var i = 0
        while (i < stscRuns.length && stscRuns(i)._1 <= chunk + 1) {
          spc = stscRuns(i)._2; i += 1
        }
        if (spc <= 0) return None
        var off = chunkOffsets(chunk)
        var s = 0L
        while (s < spc && sample < sizes.length) {
          offsets(sample) = off
          off += sizes(sample)
          sample += 1; s += 1
        }
        chunk += 1
      }
      val complete = sample == sizes.length &&
        sizes.indices.forall(i =>
          offsets(i) >= 0 && sizes(i) >= 0 &&
          offsets(i) + sizes(i) <= bytes.length)
      if (complete) Some(Mp4SampleTable(codec, width, height, sizes, offsets))
      else None
    }
  }

  /** Per-frame perceptual hashes of an MJPEG (JPEG-in-MP4) video: resolve
    * the sample table, slice each sample's JPEG bytes out of `mdat`, and
    * [[averageHash64]] each frame. Frames that fail to decode are skipped
    * (same demote-don't-fail policy as image decode); a non-"jpeg" codec
    * returns None — the honest boundary is now PER-CODEC, not per-container
    * (the JDK decodes JPEG but not H.264).
    */
  def mjpegFramePhashes(bytes: Array[Byte]): Option[Array[Long]] =
    mp4VideoSamples(bytes).filter(_.codec == "jpeg").map { t =>
      t.sizes.indices.iterator.flatMap { i =>
        val frame = java.util.Arrays.copyOfRange(
          bytes, t.offsets(i).toInt, t.offsets(i).toInt + t.sizes(i))
        averageHash64(frame)
      }.toArray
    }

  /** Minimal MJPEG-in-MP4 writer: ftyp + mdat(frames verbatim) + moov with
    * a video trak carrying REAL sample tables (stsd "jpeg" visual entry,
    * stts, one-chunk stsc, per-sample stsz, stco pointing into mdat).
    * mdat precedes moov so chunk offsets are known when the tables are
    * written (the classic non-faststart layout). Each frame must be a
    * complete JPEG; `frameDelta` is the per-frame duration in `timescale`
    * units.
    */
  def encodeMjpegMp4(timescale: Int, frameDelta: Int,
                     frames: Seq[Array[Byte]],
                     width: Int, height: Int): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val ftypLen = 20
    val firstSample = ftypLen + 8 // after mdat header
    val ftyp = {
      val bb = ByteBuffer.allocate(ftypLen)
      bb.putInt(ftypLen).put("ftyp".getBytes(US_ASCII)).put("isom".getBytes(US_ASCII))
        .putInt(0).put("isom".getBytes(US_ASCII))
      bb.array()
    }
    val mdat = {
      val total = 8 + frames.map(_.length).sum
      val bb = ByteBuffer.allocate(total)
      bb.putInt(total).put("mdat".getBytes(US_ASCII))
      frames.foreach(bb.put)
      bb.array()
    }
    val mvhd = {
      val bb = ByteBuffer.allocate(96)
      bb.putInt(0).putInt(0).putInt(timescale)
        .putInt(frames.length * frameDelta)
        .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
        .putLong(0)
      bb.putInt(0x00010000).putInt(0).putInt(0)
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
      (0 until 6).foreach(_ => bb.putInt(0))
      bb.putInt(2)
      fullBox("mvhd", 0, bb.array())
    }
    val hdlr = {
      val bb = ByteBuffer.allocate(21)
      bb.putInt(0).put("vide".getBytes(US_ASCII)).putInt(0).putInt(0).putInt(0)
        .put(0.toByte)
      fullBox("hdlr", 0, bb.array())
    }
    val stsd = {
      // one VisualSampleEntry "jpeg": 8-byte header + 78-byte body
      val entry = ByteBuffer.allocate(86)
      entry.putInt(86).put("jpeg".getBytes(US_ASCII))
        .put(new Array[Byte](6)).putShort(1)          // reserved, dref idx
        .putShort(0).putShort(0).put(new Array[Byte](12)) // pre_defined/reserved
        .putShort(width.toShort).putShort(height.toShort)
        .putInt(0x00480000).putInt(0x00480000)        // 72 dpi
        .putInt(0).putShort(1)                        // reserved, frame_count
        .put(new Array[Byte](32))                     // compressorname
        .putShort(24).putShort(0xffff.toShort)        // depth, pre_defined=-1
      val bb = ByteBuffer.allocate(4 + 86)
      bb.putInt(1).put(entry.array())
      fullBox("stsd", 0, bb.array())
    }
    val stts = {
      val bb = ByteBuffer.allocate(12)
      bb.putInt(1).putInt(frames.length).putInt(frameDelta)
      fullBox("stts", 0, bb.array())
    }
    val stsc = {
      val bb = ByteBuffer.allocate(16)
      bb.putInt(1).putInt(1).putInt(frames.length).putInt(1)
      fullBox("stsc", 0, bb.array())
    }
    val stsz = {
      val bb = ByteBuffer.allocate(8 + 4 * frames.length)
      bb.putInt(0).putInt(frames.length)
      frames.foreach(f => bb.putInt(f.length))
      fullBox("stsz", 0, bb.array())
    }
    val stco = {
      val bb = ByteBuffer.allocate(8)
      bb.putInt(1).putInt(firstSample)
      fullBox("stco", 0, bb.array())
    }
    val moov = box("moov", mvhd,
      box("trak", box("mdia", hdlr,
        box("minf", box("stbl", stsd, stts, stsc, stsz, stco)))))
    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(mdat); out.write(moov)
    out.toByteArray
  }

  /** Deterministic two-tone JPEG tile — [[encodePngSplit]]'s pattern
    * through the JDK JPEG encoder, for MJPEG fixtures. High-contrast
    * cell-aligned tones keep [[averageHash64]] stable under JPEG loss.
    */
  def encodeJpegSplit(w: Int, h: Int, frac8: Int, vertical: Boolean,
                      rgbA: Int, rgbB: Int): Array[Byte] = {
    require(frac8 >= 0 && frac8 <= 8, s"frac8 must be in [0,8], got $frac8")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val cell = if (vertical) cy else x * 8 / w
        row(x) = if (cell < frac8) rgbA else rgbB
        x += 1
      }
      img.setRGB(0, y, w, 1, row, 0, w)
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def fullBox(tpe: String, version: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + payload.length)
    bb.putInt(8 + 4 + payload.length).put(tpe.getBytes(US_ASCII))
      .putInt(version << 24).put(payload)
    bb.array()
  }

  private def box(tpe: String, children: Array[Byte]*): Array[Byte] = {
    val total = 8 + children.map(_.length).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(total).put(tpe.getBytes(US_ASCII))
    children.foreach(bb.put)
    bb.array()
  }

  /** Minimal valid MP4 (ftyp + moov(mvhd + one trak per handler) + mdat):
    * a real ISO BMFF byte layout so [[mp4Meta]] parses exactly what was
    * declared — the test-fixture/synthesis encoder (no codec: `mdat`
    * carries the payload verbatim).
    */
  def encodeMp4(timescale: Int, duration: Long, handlers: Seq[String],
                payload: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val ftyp = {
      val bb = ByteBuffer.allocate(20)
      bb.putInt(20).put("ftyp".getBytes(US_ASCII)).put("isom".getBytes(US_ASCII))
        .putInt(0).put("isom".getBytes(US_ASCII))
      bb.array()
    }
    val mvhd = {
      // version 0: creation, modification, timescale, duration, then rate/
      // volume/reserved/matrix/predefined/next_track_id as fixed fields
      val bb = ByteBuffer.allocate(96)
      bb.putInt(0).putInt(0).putInt(timescale).putInt(duration.toInt)
        .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
        .putLong(0)
      // unity matrix
      bb.putInt(0x00010000).putInt(0).putInt(0)
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
      (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
      bb.putInt(handlers.length + 1) // next_track_ID
      fullBox("mvhd", 0, bb.array())
    }
    val traks = handlers.map { h =>
      val hdlrPayload = {
        val bb = ByteBuffer.allocate(21)
        bb.putInt(0).put(h.getBytes(US_ASCII)).putInt(0).putInt(0).putInt(0)
          .put(0.toByte) // empty null-terminated name
        bb.array()
      }
      box("trak", box("mdia", fullBox("hdlr", 0, hdlrPayload)))
    }
    val moov = box("moov", (mvhd +: traks): _*)
    val mdat = box("mdat", payload)
    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(moov); out.write(mdat)
    out.toByteArray
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
