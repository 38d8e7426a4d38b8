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
}
