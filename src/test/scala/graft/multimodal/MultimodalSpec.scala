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
    assert(media.filter(col("modality") === "image")
      .select("meta.width").head().getInt(0) > 0)
    assert(media.select(countDistinct("modality")).head().getLong(0) == 3)
    assert(media.filter(col("modality") === "image")
      .select("meta.mime").head().getString(0) == "image/png")
  }

  test("extractFeatures decodes real PNG/WAV bytes and real MP4 containers") {
    val feats = Multimodal.extractFeatures(media)
    // id 0 -> image: 3x2 solid PNG with rgb = (0*h) & 0xffffff = black
    val img = feats.filter(col("id") === 0).head()
    assert(img.kind == "png")
    assert(img.features.toSeq == Seq(3f, 2f, 0f, 0f, 0f))
    // id 1 -> audio: 161-sample square wave at amp 6000, 8 kHz PCM16 mono
    val wav = feats.filter(col("id") === 1).head()
    assert(wav.kind == "wav")
    assert(wav.features(0) == 1f && wav.features(1) == 8000f && wav.features(2) == 16f)
    assert(math.abs(wav.features(3) - 161 * 2 * 1000f / 16000) < 1e-3) // duration_ms
    assert(math.abs(wav.features(4) - 6000f / 32768) < 1e-4)           // constant-|amp| RMS
    // id 2 -> video: real MP4 container parse (duration 2*40+1000 at
    // timescale 1000, one 'vide' track since id is even)
    val vid = feats.filter(col("id") === 2).head()
    assert(vid.kind == "mp4")
    assert(vid.features.toSeq == Seq(1080f, 1000f, 1f, 1f, 0f))
    // deterministic across partitionings
    val a = Multimodal.extractFeatures(media.repartition(1))
      .orderBy("id").collect().map(_.features.toSeq).toSeq
    val b = Multimodal.extractFeatures(media.repartition(7))
      .orderBy("id").collect().map(_.features.toSeq).toSeq
    assert(a == b)
  }

  test("MediaCodec golden: PNG round-trip is exact, JPEG close, sniff honest") {
    val (kind, f) = MediaCodec.decode(MediaCodec.encodePng(5, 3, 0x336699))
    assert(kind == "png")
    assert(f.toSeq == Seq(5f, 3f, 0x33 / 255f, 0x66 / 255f, 0x99 / 255f))
    // JPEG through the same ImageIO path: dimensions exact, means lossy-close
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 4) img.setRGB(x, y, 0x808080)
    val jout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", jout)
    val (jk, jf) = MediaCodec.decode(jout.toByteArray)
    assert(jk == "jpeg" && jf(0) == 4f && jf(1) == 4f)
    assert(math.abs(jf(2) - 0x80 / 255f) < 0.05)
    // WAV round-trip
    val samples = Array.tabulate(100)(i => (math.sin(i * 0.3) * 12000).toShort)
    val (wk, wf) = MediaCodec.decode(MediaCodec.encodeWav(16000, samples))
    assert(wk == "wav")
    assert(wf(0) == 1f && wf(1) == 16000f && wf(2) == 16f)
    assert(math.abs(wf(3) - 100 * 1000f / 16000) < 1e-3)
    val expectedRms = math.sqrt(samples.map(s => s.toDouble * s).sum / 100) / 32768
    assert(math.abs(wf(4) - expectedRms) < 1e-4)
    // not-media bytes are opaque, and a corrupt header demotes, not throws
    assert(MediaCodec.decode("plain text".getBytes)._1 == "opaque")
    val corrupt = MediaCodec.encodePng(3, 3, 0xffffff).take(12)
    assert(MediaCodec.decode(corrupt)._1 == "opaque")
  }

  test("wavFeatures is chunk-order independent (data before fmt)") {
    // RIFF doesn't order chunks; rebuild a legal WAV with data FIRST
    val samples = Array.tabulate(64)(i => (math.cos(i * 0.5) * 9000).toShort)
    val canonical = MediaCodec.encodeWav(8000, samples)
    val Some(expected) = MediaCodec.wavFeatures(canonical)
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    val Some(reordered) = MediaCodec.wavFeatures(bb.array())
    assert(reordered.toSeq == expected.toSeq) // rms/duration survive reorder
    assert(reordered(4) > 0f)
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

  test("mp4Meta golden: hand-built ISO BMFF fixture parses field-exactly") {
    // hand-assembled bytes (not encodeMp4 — the writer must not grade its
    // own homework): ftyp + moov(mvhd v0 ts=600 dur=3000, trak/mdia/hdlr
    // 'soun') + trailing mdat
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def fourcc(s: String) = s.getBytes("US-ASCII")
    val mvhdBody = be32(0) ++ // version 0 + flags
      be32(0) ++ be32(0) ++ be32(600) ++ be32(3000) ++ // creation, mod, timescale, duration
      Array.fill[Byte](80)(0) // rate..next_track_id, layout irrelevant to the parser
    val mvhd = be32(8 + mvhdBody.length) ++ fourcc("mvhd") ++ mvhdBody
    val hdlrBody = be32(0) ++ be32(0) ++ fourcc("soun") ++ Array.fill[Byte](13)(0)
    val hdlr = be32(8 + hdlrBody.length) ++ fourcc("hdlr") ++ hdlrBody
    val mdia = be32(8 + hdlr.length) ++ fourcc("mdia") ++ hdlr
    val trak = be32(8 + mdia.length) ++ fourcc("trak") ++ mdia
    val moov = be32(8 + mvhd.length + trak.length) ++ fourcc("moov") ++ mvhd ++ trak
    val ftyp = be32(16) ++ fourcc("ftyp") ++ fourcc("isom") ++ be32(0)
    val mdat = be32(11) ++ fourcc("mdat") ++ "abc".getBytes("US-ASCII")
    val fixture = ftyp ++ moov ++ mdat
    assert(MediaCodec.sniff(fixture) == "mp4")
    val m = MediaCodec.mp4Meta(fixture).get
    assert(m.timescale == 600L && m.duration == 3000L)
    assert(m.durationMs == 5000L) // 3000 ticks at 600/s
    assert(m.nTracks == 1 && m.hasAudio && !m.hasVideo)
    // mvhd version 1: 64-bit times; timescale shifts to +20, duration to +24
    val mvhd1Body = Array[Byte](1, 0, 0, 0) ++
      Array.fill[Byte](16)(0) ++ be32(90000) ++
      Array.fill[Byte](4)(0) ++ be32(450000) ++ Array.fill[Byte](76)(0)
    val mvhd1 = be32(8 + mvhd1Body.length) ++ fourcc("mvhd") ++ mvhd1Body
    val moov1 = be32(8 + mvhd1.length) ++ fourcc("moov") ++ mvhd1
    val m1 = MediaCodec.mp4Meta(ftyp ++ moov1).get
    assert(m1.timescale == 90000L && m1.duration == 450000L && m1.durationMs == 5000L)
    // truncation and corruption demote to None/opaque, never throw
    assert(MediaCodec.mp4Meta(fixture.take(30)).isEmpty)
    assert(MediaCodec.mp4Meta(ftyp).isEmpty) // no moov at all
    val bad = fixture.clone; bad(20) = 0x7f // corrupt moov's first child size
    assert(MediaCodec.mp4Meta(bad).isEmpty || MediaCodec.mp4Meta(bad).isDefined) // no throw
    assert(MediaCodec.decode("plain".getBytes)._1 == "opaque")
  }

  test("encodeMp4 round-trips through mp4Meta; videoMeta/frameSampleTimestamps use parsed bytes") {
    val bytes = MediaCodec.encodeMp4(timescale = 1000, duration = 2400,
      handlers = Seq("vide", "soun"), payload = "xyz".getBytes)
    val m = MediaCodec.mp4Meta(bytes).get
    assert(m.timescale == 1000L && m.durationMs == 2400L)
    assert(m.nTracks == 2 && m.hasVideo && m.hasAudio)
    // distributed path: every synthesized video row parses; duration comes
    // from the container, matching what synthesis declared
    val vm = Multimodal.videoMeta(media).collect()
    val videoIds = media.filter(col("modality") === "video")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(vm.map(_.id).toSet == videoIds, "every synthesized MP4 parses")
    vm.foreach { v =>
      assert(v.timescale == 1000L && v.duration_ms == v.id * 40 + 1000)
      assert(v.has_video && (v.has_audio == (v.id % 2 == 1)))
    }
    val frames = Multimodal.frameSampleTimestamps(media, n = 4)
      .filter(col("id") === 2).orderBy("frame_ms")
      .collect().map(_.getLong(1)).toSeq
    assert(frames == Seq(0L, 270L, 540L, 810L)) // 1080 ms from the BYTES
  }

  test("resizeNearest golden: solid tile keeps exact color at exact target dims") {
    val bytes = MediaCodec.encodePng(8, 4, 0x3366cc)
    val out = MediaCodec.resizeNearest(bytes, 4, 2).get
    val Some(f) = MediaCodec.imageFeatures(out)
    assert(f(0) == 4f && f(1) == 2f)
    // solid color survives NN resampling bit-exactly
    assert(math.abs(f(2) - 0x33 / 255f) < 1e-6)
    assert(math.abs(f(3) - 0x66 / 255f) < 1e-6)
    assert(math.abs(f(4) - 0xcc / 255f) < 1e-6)
  }

  test("resizeImages clamps the long edge, never upscales, drops undecodable rows") {
    val r = Multimodal.resizeImages(media, maxEdge = 8).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(math.max(row.target_width, row.target_height) <= 8)
      assert(row.target_width <= row.src_width && row.target_height <= row.src_height)
      // the re-encoded PNG really decodes to the target dims
      val Some(f) = MediaCodec.imageFeatures(row.content)
      assert(f(0).toInt == row.target_width && f(1).toInt == row.target_height)
    }
    // small images pass through at original size (scale clamps at 1)
    assert(r.filter(row => math.max(row.src_width, row.src_height) <= 8)
      .forall(row => row.target_width == row.src_width &&
                     row.target_height == row.src_height))
  }

  test("wavSegmentRms: constant-amplitude square wave has equal segment RMS") {
    val amp: Short = 6000
    val samples = Array.tabulate(800)(i => if ((i / 4) % 2 == 0) amp else (-amp).toShort)
    val bytes = MediaCodec.encodeWav(8000, samples)
    val Some(seg) = MediaCodec.wavSegmentRms(bytes, 4)
    assert(seg.length == 4)
    val expected = amp / 32768.0f
    seg.foreach(s => assert(math.abs(s - expected) < 1e-4, s.toString))
    // segments agree with the global RMS for a stationary signal
    val Some(global) = MediaCodec.wavFeatures(bytes)
    assert(math.abs(seg(0) - global(4)) < 1e-4)
  }

  test("audioSegments drops non-PCM16/non-WAV rows and keeps ids aligned") {
    val out = Multimodal.audioSegments(media, nSegments = 3).collect()
    val audioIds = media.filter(col("modality") === "audio")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out.map(_.id).toSet == audioIds) // synthesized audio is all PCM16
    assert(out.forall(_.segment_rms.length == 3))
    assert(out.forall(_.segment_rms.forall(v => v >= 0f && v <= 1f)))
  }

  // ---- MJPEG sample tables + frame decode --------------------------------

  private def be32(v: Int) =
    Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def fourcc(s: String) = s.getBytes("US-ASCII")

  /** Hand-assembled MJPEG MP4 (NOT encodeMjpegMp4 — the writer must not
    * grade its own homework): TWO chunks (2 samples + 1 sample) so the
    * stsc run expansion is exercised, not just the one-chunk shortcut.
    * Returns (fixture, frames, expected offsets).
    */
  private def handMjpeg(): (Array[Byte], Seq[Array[Byte]], Seq[Long]) = {
    val frames = Seq(
      MediaCodec.encodeJpegSplit(16, 16, 2, vertical = true, 0x101010, 0xF0F0F0),
      MediaCodec.encodeJpegSplit(16, 16, 5, vertical = false, 0x101010, 0xF0F0F0),
      MediaCodec.encodeJpegSplit(16, 16, 7, vertical = true, 0x101010, 0xF0F0F0))
    val ftyp = be32(16) ++ fourcc("ftyp") ++ fourcc("isom") ++ be32(0)
    // mdat: chunk 1 = frames 0,1 back to back; 3 pad bytes; chunk 2 = frame 2
    val pad = Array[Byte](9, 9, 9)
    val mdatPayload = frames(0) ++ frames(1) ++ pad ++ frames(2)
    val mdat = be32(8 + mdatPayload.length) ++ fourcc("mdat") ++ mdatPayload
    val chunk1 = ftyp.length + 8L
    val chunk2 = chunk1 + frames(0).length + frames(1).length + pad.length
    // stbl tables
    val entry = be32(86) ++ fourcc("jpeg") ++ Array.fill[Byte](6)(0) ++ be16(1) ++
      Array.fill[Byte](16)(0) ++ be16(16) ++ be16(16) ++
      be32(0x00480000) ++ be32(0x00480000) ++ be32(0) ++ be16(1) ++
      Array.fill[Byte](32)(0) ++ be16(24) ++ be16(0xffff)
    val stsd = be32(8 + 8 + entry.length) ++ fourcc("stsd") ++ be32(0) ++ be32(1) ++ entry
    val stts2 = be32(8 + 16) ++ fourcc("stts") ++ be32(0) ++ be32(1) ++ be32(3) ++ be32(40)
    val stsc = be32(8 + 4 + 4 + 24) ++ fourcc("stsc") ++ be32(0) ++ be32(2) ++
      be32(1) ++ be32(2) ++ be32(1) ++ // first_chunk=1: 2 samples/chunk
      be32(2) ++ be32(1) ++ be32(1)    // first_chunk=2: 1 sample/chunk
    val stsz = be32(8 + 4 + 8 + 12) ++ fourcc("stsz") ++ be32(0) ++ be32(0) ++ be32(3) ++
      be32(frames(0).length) ++ be32(frames(1).length) ++ be32(frames(2).length)
    val stco = be32(8 + 4 + 4 + 8) ++ fourcc("stco") ++ be32(0) ++ be32(2) ++
      be32(chunk1.toInt) ++ be32(chunk2.toInt)
    val stbl = be32(8 + stsd.length + stts2.length + stsc.length + stsz.length + stco.length) ++
      fourcc("stbl") ++ stsd ++ stts2 ++ stsc ++ stsz ++ stco
    val minf = be32(8 + stbl.length) ++ fourcc("minf") ++ stbl
    val hdlrBody = be32(0) ++ be32(0) ++ fourcc("vide") ++ Array.fill[Byte](13)(0)
    val hdlr = be32(8 + hdlrBody.length) ++ fourcc("hdlr") ++ hdlrBody
    val mdia = be32(8 + hdlr.length + minf.length) ++ fourcc("mdia") ++ hdlr ++ minf
    val trak = be32(8 + mdia.length) ++ fourcc("trak") ++ mdia
    val mvhdBody = be32(0) ++ be32(0) ++ be32(0) ++ be32(1000) ++ be32(120) ++
      Array.fill[Byte](80)(0)
    val mvhd = be32(8 + mvhdBody.length) ++ fourcc("mvhd") ++ mvhdBody
    val moov = be32(8 + mvhd.length + trak.length) ++ fourcc("moov") ++ mvhd ++ trak
    (ftyp ++ mdat ++ moov, frames,
      Seq(chunk1, chunk1 + frames(0).length, chunk2))
  }

  test("mp4VideoSamples golden: hand-built two-chunk MJPEG fixture resolves exactly") {
    val (fixture, frames, wantOffsets) = handMjpeg()
    val t = MediaCodec.mp4VideoSamples(fixture).get
    assert(t.codec == "jpeg" && t.width == 16 && t.height == 16)
    assert(t.sizes.toSeq == frames.map(_.length))
    assert(t.offsets.toSeq == wantOffsets) // chunk-2 offset skips the pad bytes
    // frame hashes equal hashing the same JPEG bytes directly
    val hs = MediaCodec.mjpegFramePhashes(fixture).get
    assert(hs.toSeq == frames.map(f => MediaCodec.averageHash64(f).get))
    // distinct patterns -> distinct frame hashes
    assert(hs.distinct.length == 3)
  }

  test("mp4VideoSamples rejects malformed tables; non-jpeg codecs stay out of mjpeg decode") {
    val (fixture, _, _) = handMjpeg()
    // truncating mid-moov kills a required table -> None, never a throw
    assert(MediaCodec.mp4VideoSamples(fixture.dropRight(20)).isEmpty)
    // an audio-only container has no video trak
    val audioOnly = MediaCodec.encodeMp4(1000, 500, Seq("soun"))
    assert(MediaCodec.mp4VideoSamples(audioOnly).isEmpty)
    // a non-jpeg fourcc parses as a table but refuses frame decode
    val avc1 = fixture.clone()
    val idx = avc1.indexOfSlice(fourcc("jpeg"))
    assert(idx > 0)
    System.arraycopy(fourcc("avc1"), 0, avc1, idx, 4)
    assert(MediaCodec.mp4VideoSamples(avc1).exists(_.codec == "avc1"))
    assert(MediaCodec.mjpegFramePhashes(avc1).isEmpty)
  }

  test("encodeMjpegMp4 round-trips: table matches frames, mvhd still parses") {
    val frames = (1 to 4).map(i =>
      MediaCodec.encodeJpegSplit(24, 16, i, vertical = i % 2 == 0, 0x101010, 0xF0F0F0))
    val bytes = MediaCodec.encodeMjpegMp4(timescale = 1000, frameDelta = 40,
      frames = frames, width = 24, height = 16)
    val t = MediaCodec.mp4VideoSamples(bytes).get
    assert(t.codec == "jpeg" && t.width == 24 && t.height == 16)
    assert(t.sizes.toSeq == frames.map(_.length))
    val hs = MediaCodec.mjpegFramePhashes(bytes).get
    assert(hs.toSeq == frames.map(f => MediaCodec.averageHash64(f).get))
    val m = MediaCodec.mp4Meta(bytes).get
    assert(m.timescale == 1000L && m.duration == 160L && m.hasVideo && !m.hasAudio)
  }

  test("videoFramePhashes: resized re-encodes of the same footage share one video_phash") {
    import spark.implicits._
    val docs = (0L until 56L).toDF("doc_id")
    val vids = Multimodal.synthesizeMjpegVariants(docs)
    val out = Multimodal.videoFramePhashes(vids).collect()
    assert(out.length == 56 && out.forall(_.n_frames == 3))
    // same pattern (id % 7) at different resolutions -> identical signature
    val byPattern = out.groupBy(_.id % 7)
    byPattern.foreach { case (p, vs) =>
      assert(vs.map(_.video_phash).distinct.length == 1,
        s"pattern $p split across signatures")
      assert(vs.map(_.frame_hashes.toSeq).distinct.length == 1,
        s"pattern $p frame hashes differ across resolutions")
    }
    // different patterns -> different signatures
    assert(byPattern.values.map(_.head.video_phash).toSeq.distinct.length == 7)
  }
}
