package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

/** Multimodal plumbing tests: schema, deterministic stub decode, resize
  * targets, frame sampling, size-based partitioning. The decode kernel is a
  * documented stub; everything Spark-side is real.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image", Array[Byte](1, 2, 3), Some(4000), Some(3000), None, None),
    MediaRow(2L, "audio", Array[Byte](9, 9), None, None, Some(16000), None),
    MediaRow(3L, "video", Array[Byte](7), Some(1920), Some(1080), None, Some(10)),
    MediaRow(4L, "image", null, Some(10), Some(10), None, None),
  ).toDS()

  test("feature extraction is deterministic, fixed-width, null-safe") {
    val f = Multimodal.extractFeatures(media).collect().map(r => r.media_id -> r).toMap
    assert(f(1L).feature.length === Multimodal.FeatureDim)
    assert(f(1L).decode_ok && !f(4L).decode_ok)
    // determinism: same payload → same features on a second run
    val f2 = Multimodal.extractFeatures(media).filter(_.media_id == 1L).head()
    assert(f(1L).feature.toSeq === f2.feature.toSeq)
  }

  test("real image decode via javax.imageio: dims + histogram from actual pixels") {
    val png = Multimodal.syntheticPng(7L, 5, 4)
    val rows = Seq(
      MediaRow(10L, "image", png, None, None, None, None),
      MediaRow(11L, "image", Array[Byte](1, 2, 3), None, None, None, None), // not an image
      MediaRow(12L, "image", null, None, None, None, None),
    ).toDS()
    val got = Multimodal.decodeImages(rows).collect().map(r => r.media_id -> r).toMap
    assert(got(10L).decode_ok)
    assert(got(10L).width === 5 && got(10L).height === 4) // real raster dims
    assert(math.abs(got(10L).feature.sum - 1.0f) < 1e-5) // histogram sums to 1
    // exact parity with a direct local decode of the same bytes
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(got(10L).feature.toSeq === Multimodal.lumaHistogram(img).toSeq)
    assert(!got(11L).decode_ok && !got(12L).decode_ok) // corrupt/null: no crash
    assert(got(11L).feature.forall(_ == 0f))
  }

  test("real audio decode via javax.sound.sampled: format + exact waveform features") {
    // id=0 square wave: half-period 4, amplitude 1000 → RMS is exactly
    // 1000 (every sample is ±1000), 800 samples / half 4 = 200 blocks =
    // 199 sign transitions, peak 1000, duration 800/8000 = 0.1 s
    val wav = Multimodal.syntheticWav(0L, sampleRate = 8000, nSamples = 800)
    val rows = Seq(
      MediaRow(30L, "audio", wav, None, None, None, None),
      MediaRow(31L, "audio", Array[Byte](1, 2, 3), None, None, None, None), // not audio
      MediaRow(32L, "audio", null, None, None, None, None),
    ).toDS()
    val got = Multimodal.decodeAudio(rows).collect().map(r => r.media_id -> r).toMap
    assert(got(30L).decode_ok)
    assert(got(30L).sample_rate === 8000)
    assert(got(30L).n_samples === 800L)
    assert(got(30L).duration_sec === 0.1d)
    assert(got(30L).rms === 1000.0d)
    assert(got(30L).zero_crossings === 199L)
    assert(got(30L).peak === 1000)
    assert(!got(31L).decode_ok && !got(32L).decode_ok) // corrupt/null: no crash
  }

  test("synthetic WAV round-trips sample-exact through the JDK codec") {
    val id = 5L
    val wav = Multimodal.syntheticWav(id, sampleRate = 16000, nSamples = 333)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val data = ais.readAllBytes()
    ais.close()
    val decoded = Array.tabulate(data.length / 2)(i =>
      (((data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff))).toShort)
    assert(decoded.toSeq === Multimodal.syntheticSamples(id, 333).toSeq)
  }

  test("real image resize: aspect-preserving downscale, round-trips through decode") {
    val rows = Seq(
      MediaRow(20L, "image", Multimodal.syntheticPng(1L, 64, 32), None, None, None, None),
      MediaRow(21L, "image", Multimodal.syntheticPng(2L, 8, 8), None, None, None, None),
      MediaRow(22L, "image", Array[Byte](0, 1, 2), None, None, None, None),
    ).toDS()
    val got = Multimodal.resizeImages(rows, maxSide = 16)
      .collect().map(r => r.media_id -> r).toMap
    assert(got(20L).resize_ok && got(20L).width === 16 && got(20L).height === 8)
    assert(got(21L).resize_ok && got(21L).width === 8 && got(21L).height === 8) // no upscale
    assert(!got(22L).resize_ok) // undecodable: payload passthrough, flagged
    assert(got(22L).bytes.toSeq === Seq[Byte](0, 1, 2))
    // the re-encoded payload is itself a decodable image with the new dims
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(got(20L).bytes))
    assert(back.getWidth === 16 && back.getHeight === 8)
  }

  test("resize target preserves aspect ratio and never upscales") {
    val t = Multimodal.withResizeTarget(media.toDF(), maxSide = 1000)
      .filter(col("media_id") === 1)
      .select("target_width", "target_height").as[(Int, Int)].head()
    assert(t === ((1000, 750)))
    val small = Multimodal.withResizeTarget(media.toDF(), maxSide = 1000)
      .filter(col("media_id") === 4)
      .select("target_width", "target_height").as[(Int, Int)].head()
    assert(small === ((10, 10)))
  }

  test("frame sampling: every stride-th frame for video, empty otherwise") {
    val s = Multimodal.withFrameSample(media.toDF(), stride = 3)
      .select(col("media_id"), col("sampled_frames")).as[(Long, Seq[Int])]
      .collect().toMap
    assert(s(3L) === Seq(0, 3, 6, 9))
    assert(s(1L) === Seq.empty)
  }

  test("image near-dups: identical pixels re-encoded are recovered via decode+LSH (qm04)") {
    import graft.functions.Similarity
    import org.apache.spark.sql.functions.col
    val media = (0L until 48L).map { id =>
      val srcId = if (id >= 40) id - 40 else id
      MediaRow(id, "image", Multimodal.syntheticPng(srcId, 8, 8), None, None, None, None)
    }.toDS()
    val feats = Multimodal.decodeImages(media).toDF()
      .filter(col("decode_ok"))
      .select(col("media_id"), col("feature").cast("array<double>").as("embedding"))
    val pairs = Similarity.embeddingNearDups(feats, "media_id", "embedding",
        minCosine = 0.999, nPlanes = 4, dim = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 8L).foreach(i =>
      assert(pairs.contains((i, i + 40L)), s"planted identical-image pair $i missing"))
  }

  test("size-based repartitioning yields ≥1 partition and preserves rows") {
    val rep = Multimodal.repartitionBySize(spark, media.toDF(), bytesPerPartition = 2L)
    assert(rep.count() === 4)
    assert(rep.rdd.getNumPartitions >= 1)
  }

  test("real AVI metadata parse: avih header values recovered exactly (qm05)") {
    val avi = Multimodal.syntheticAvi(width = 640, height = 480, fps = 25, nFrames = 250)
    val m = Multimodal.parseVideoMeta(avi)
    assert(m.parse_ok)
    assert(m.container === "avi")
    assert(m.width === 640)
    assert(m.height === 480)
    assert(m.n_frames === 250L)
    assert(m.fps === 25.0)
    assert(m.duration_sec === 10.0)
  }

  test("real MP4 metadata parse: mvhd/tkhd/stsz box values recovered exactly (qm05)") {
    // timescale 600, duration 1800 → 3 s; 72 samples → 24 fps
    val mp4 = Multimodal.syntheticMp4(width = 1280, height = 720,
      timescale = 600, duration = 1800L, nFrames = 72L)
    val m = Multimodal.parseVideoMeta(mp4)
    assert(m.parse_ok)
    assert(m.container === "mp4")
    assert(m.width === 1280)
    assert(m.height === 720)
    assert(m.n_frames === 72L)
    assert(m.fps === 24.0)
    assert(m.duration_sec === 3.0)
  }

  test("malformed AVI chunk size >= 2^31 terminates (no infinite loop), parse_ok=false") {
    // RIFF/AVI header followed by one chunk whose declared u32 size is
    // 0xFFFFFFF8 — as a wrapped Int that is -8, which froze the old walker
    // (offset stopped advancing). Must return failed, promptly.
    val b = java.nio.ByteBuffer.allocate(12 + 8 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(28).put("AVI ".getBytes("US-ASCII"))
    b.put("JUNK".getBytes("US-ASCII")).putInt(0xFFFFFFF8) // size wraps negative as Int
    b.put(Array.fill[Byte](16)(0))
    val m = Multimodal.parseVideoMeta(b.array())
    assert(!m.parse_ok)

    // Same class of bug inside a LIST: a huge child size must not recurse
    // or stall either.
    val l = java.nio.ByteBuffer.allocate(12 + 8 + 4 + 8 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    l.put("RIFF".getBytes("US-ASCII")).putInt(32).put("AVI ".getBytes("US-ASCII"))
    l.put("LIST".getBytes("US-ASCII")).putInt(20).put("hdrl".getBytes("US-ASCII"))
    l.put("JUNK".getBytes("US-ASCII")).putInt(0x80000000) // 2^31
    l.put(Array.fill[Byte](8)(0))
    assert(!Multimodal.parseVideoMeta(l.array()).parse_ok)
  }

  test("malformed MP4 box size near 2^31 terminates (no throw), parse_ok=false") {
    // A declared u32 box size in [2^31-off, 2^31) passes the `size < 8`
    // guard but wrapped `off + size` negative as Int — the next header
    // read then threw ArrayIndexOutOfBounds instead of returning failed
    // (the walkers' contract). Offsets are now Long with a strict-advance
    // bail-out, mirroring the AVI fix.
    def be(i: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(i).array()
    val b = java.nio.ByteBuffer.allocate(12 + 8 + 16)
    b.put(be(12)).put("ftyp".getBytes("US-ASCII")).put("isom".getBytes("US-ASCII"))
    b.put(be(0x7FFFFFFF)).put("free".getBytes("US-ASCII")) // off+size wraps Int
    b.put(Array.fill[Byte](16)(0))
    assert(!Multimodal.parseVideoMeta(b.array()).parse_ok)

    // the same overflow inside a trak subtree (the scoped trak walker)
    val t = java.nio.ByteBuffer.allocate(12 + 8 + 8 + 8 + 16)
    t.put(be(12)).put("ftyp".getBytes("US-ASCII")).put("isom".getBytes("US-ASCII"))
    t.put(be(40)).put("moov".getBytes("US-ASCII"))
    t.put(be(32)).put("trak".getBytes("US-ASCII"))
    t.put(be(0x7FFFFFFF)).put("stbl".getBytes("US-ASCII"))
    t.put(Array.fill[Byte](16)(0))
    assert(!Multimodal.parseVideoMeta(t.array()).parse_ok)
  }

  test("MP4 n_frames comes from the VIDEO trak, not a larger audio trak") {
    // 3 s @ timescale 600; 72 video frames (24 fps) but 141 AAC packets —
    // the audio trak (0×0 dims) comes first and must NOT win n_frames.
    val mp4 = Multimodal.syntheticMp4WithAudio(width = 1280, height = 720,
      timescale = 600, duration = 1800L, nFrames = 72L, nAudioSamples = 141L)
    val m = Multimodal.parseVideoMeta(mp4)
    assert(m.parse_ok)
    assert(m.container === "mp4")
    assert(m.width === 1280)
    assert(m.height === 720)
    assert(m.n_frames === 72L, "audio trak sample count leaked into n_frames")
    assert(m.fps === 24.0)
  }

  test("video metadata decode through the Dataset seam; garbage is parse_ok=false") {
    val rows = Seq(
      MediaRow(0L, "video", Multimodal.syntheticAvi(320, 240, 30, 90), None, None, None, None),
      MediaRow(1L, "video", Multimodal.syntheticMp4(640, 360, 1000, 5000L, 120L), None, None, None, None),
      MediaRow(2L, "video", Array[Byte](1, 2, 3), None, None, None, None),
      MediaRow(3L, "video", null, None, None, None, None),
      // a RIFF that is NOT an AVI (WAVE) must not parse as video
      MediaRow(4L, "video", Multimodal.syntheticWav(4L, 8000, 100), None, None, None, None),
    ).toDS()
    val out = Multimodal.decodeVideoMeta(rows).collect().map(m => m.media_id -> m).toMap
    assert(out(0L).parse_ok && out(0L).container === "avi" && out(0L).n_frames === 90L)
    assert(out(1L).parse_ok && out(1L).container === "mp4" && out(1L).width === 640)
    assert(!out(2L).parse_ok)
    assert(!out(3L).parse_ok)
    assert(!out(4L).parse_ok)
  }

  test("real MJPEG frame decode: every mid-bin gray survives JPEG into a one-hot histogram (qm06)") {
    // the assumption qm06's DuckDB oracle rests on, pinned mechanically:
    // a uniform gray g = 16·bin + 8 round-trips quality-0.95 JPEG to a
    // histogram that is EXACTLY 1.0 at `bin` — for all 16 bins
    val rows = (0 until 16).map { bin =>
      MediaRow(bin.toLong, "video",
        Multimodal.syntheticMjpegAvi(16, 12, 10, Seq(bin * 16 + 8)),
        None, None, None, None)
    }.toDS()
    val out = Multimodal.decodeVideoFrames(rows, maxFrames = 3)
      .collect().map(f => f.media_id -> f).toMap
    assert(out.size === 16)
    for (bin <- 0 until 16) {
      val f = out(bin.toLong)
      assert(f.decode_ok && f.width === 16 && f.height === 12 && f.frame_idx === 0)
      assert(f.feature(bin) === 1.0f,
        s"bin $bin: decoded histogram not one-hot (${f.feature.toSeq})")
      assert(f.feature.count(_ != 0f) === 1)
    }
  }

  test("MJPEG frame decode: even frame sampling, per-frame values, non-AVI fallbacks (qm06)") {
    // 5 frames, maxFrames 3 → sampled indices k·5/3 = 0, 1, 3 (the
    // deterministic rule the oracle replays); each frame its own gray
    val grays = Seq(8, 40, 72, 104, 200) // bins 0, 2, 4, 6, 12
    val rows = Seq(
      MediaRow(0L, "video", Multimodal.syntheticMjpegAvi(16, 12, 10, grays),
        None, None, None, None),
      // header-only AVI (no movi frames) → one decode_ok=false row
      MediaRow(1L, "video", Multimodal.syntheticAvi(320, 240, 30, 90),
        None, None, None, None),
      // MP4: real container, no JVM codec for its frames → false row
      MediaRow(2L, "video", Multimodal.syntheticMp4(640, 360, 1000, 5000L, 120L),
        None, None, None, None),
      MediaRow(3L, "video", null, None, None, None, None),
    ).toDS()
    val out = Multimodal.decodeVideoFrames(rows, maxFrames = 3).collect()
    val byId = out.groupBy(_.media_id)
    val sampled = byId(0L).sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq === Seq(0, 1, 3))
    assert(sampled.forall(_.decode_ok))
    // argmax bin per sampled frame matches that frame's planted gray
    // (sampled indices 0, 1, 3 → grays 8, 40, 104 → bins 0, 2, 6)
    assert(sampled.map(_.feature.indexWhere(_ == 1.0f)).toSeq === Seq(0, 2, 6))
    for (id <- 1L to 3L) {
      assert(byId(id).length === 1)
      assert(!byId(id).head.decode_ok && byId(id).head.frame_idx === -1)
    }
    // and the SAME bytes still parse as metadata (frame chunks do not
    // break the avih walk)
    val meta = Multimodal.decodeVideoMeta(rows.filter(_.media_id == 0L))
      .head()
    assert(meta.parse_ok && meta.n_frames === 5L && meta.width === 16)
  }

  test("MJPEG frame decode: corrupt frame chunk fails that frame only, not the task") {
    val good = Multimodal.syntheticMjpegAvi(16, 12, 10, Seq(8, 40))
    // zero out the SECOND frame's JPEG magic: locate its chunk and stomp it
    val chunks = Multimodal.mjpegFrameChunks(good)
    assert(chunks.size === 2)
    val bad = good.clone()
    val (off, _) = chunks(1)
    bad(off) = 0; bad(off + 1) = 0
    val out = Multimodal.decodeVideoFrames(
        Seq(MediaRow(0L, "video", bad, None, None, None, None)).toDS(), 8)
      .collect().sortBy(_.frame_idx)
    assert(out.length === 2)
    assert(out(0).decode_ok && out(0).feature(0) === 1.0f)
    assert(!out(1).decode_ok && out(1).frame_idx === 1)
  }

  test("MJPEG-in-MP4 frame decode: stsz/stco sample walk, one-hot histograms, corrupt frame isolated (qm06 parity)") {
    // round-16 MP4 parity: the same mid-bin-gray one-hot oracle trick,
    // located through the ISO stsz (per-sample sizes) + stco (1-sample
    // chunks) tables instead of RIFF 00dc chunks
    val grays = Seq(8, 40, 136, 248) // bins 0, 2, 8, 15
    val mp4 = Multimodal.syntheticMjpegMp4(16, 12, timescale = 600,
      duration = 600, grays)
    val chunks = Multimodal.mp4FrameChunks(mp4)
    assert(chunks.size === 4, s"expected 4 samples, got $chunks")
    val out = Multimodal.decodeVideoFrames(
        Seq(MediaRow(0L, "video", mp4, None, None, None, None)).toDS(), 8)
      .collect().sortBy(_.frame_idx)
    assert(out.length === 4 && out.forall(_.decode_ok))
    for ((g, f) <- grays.zip(out)) {
      assert(f.width === 16 && f.height === 12)
      val bin = f.feature.indexOf(f.feature.max)
      assert(bin === g / 16, s"gray $g decoded to bin $bin")
      assert(f.feature(bin) === 1.0f, "histogram must be one-hot")
    }
    // the same bytes still parse as metadata (stsz count = frames)
    val meta = Multimodal.decodeVideoMeta(
      Seq(MediaRow(0L, "video", mp4, None, None, None, None)).toDS()).head()
    assert(meta.parse_ok && meta.container === "mp4" && meta.n_frames === 4L)
    // corrupt ONE sample's JPEG magic: that frame fails, others decode
    val bad = mp4.clone()
    val (off, _) = chunks(2)
    bad(off) = 0; bad(off + 1) = 0
    val out2 = Multimodal.decodeVideoFrames(
        Seq(MediaRow(1L, "video", bad, None, None, None, None)).toDS(), 8)
      .collect().sortBy(_.frame_idx)
    assert(out2.count(_.decode_ok) === 3 && !out2(2).decode_ok)
  }

  test("mp4FrameChunks refuses INCONSISTENT sample-to-chunk tables, never guesses") {
    val mp4 = Multimodal.syntheticMjpegMp4(16, 12, 600, 600, Seq(8, 40))
    // patch samples_per_chunk 1 -> 2: the run table now declares 2
    // samples for EACH of the 2 stco chunks (4 total) against stsz's 2
    // — since round 18 the walker expands general stsc runs, so this is
    // detected as an overrun, not as "multi-sample unsupported"; the
    // answer is still empty (decode_ok=false), never guessed offsets
    def be(p: Int): Int = java.nio.ByteBuffer.wrap(mp4, p, 4).getInt
    val stscAt = (0 until mp4.length - 4)
      .find(i => new String(mp4, i, 4, "US-ASCII") == "stsc").get
    val patched = mp4.clone()
    // box: [size][stsc][v/flags][entry_count][first_chunk][samples_per_chunk]...
    val spcOff = stscAt + 4 + 8 + 4
    assert(be(spcOff) === 1)
    patched(spcOff + 3) = 2
    assert(Multimodal.mp4FrameChunks(patched).isEmpty)
    val out = Multimodal.decodeVideoFrames(
        Seq(MediaRow(0L, "video", patched, None, None, None, None)).toDS(), 8)
      .collect()
    assert(out.length === 1 && !out.head.decode_ok)
    // and a first_chunk run that does not start at chunk 1 also refuses
    val fcOff = stscAt + 4 + 8
    val patched2 = mp4.clone()
    patched2(fcOff + 3) = 2
    assert(Multimodal.mp4FrameChunks(patched2).isEmpty)
  }

  test("mp4FrameChunks walks real multi-sample stsc runs (round-18 general layout)") {
    // 5 frames at 2 samples/chunk → chunks of 2,2,1 and an stsc run
    // table [(1,2),(3,1)] — the layout real muxers emit. The general
    // walk must locate every sample (chunk offset + intra-chunk
    // cumulative sizes) and decode the same one-hot histograms as the
    // 1-sample-per-chunk layout of the same grays.
    val grays = Seq(8, 40, 136, 200, 248)
    val multi = Multimodal.syntheticMjpegMp4(16, 12, 600, 600, grays,
      samplesPerChunk = 2)
    val single = Multimodal.syntheticMjpegMp4(16, 12, 600, 600, grays)
    val cm = Multimodal.mp4FrameChunks(multi)
    val cs = Multimodal.mp4FrameChunks(single)
    assert(cm.size === 5 && cs.size === 5)
    // same SAMPLE bytes under both layouts
    def sliceAll(b: Array[Byte], cks: Seq[(Int, Int)]) =
      cks.map { case (o, s) => b.slice(o, o + s).toSeq }
    assert(sliceAll(multi, cm) === sliceAll(single, cs))
    val out = Multimodal.decodeVideoFrames(
        Seq(MediaRow(0L, "video", multi, None, None, None, None)).toDS(), 8)
      .collect().sortBy(_.frame_idx)
    assert(out.length === 5 && out.forall(_.decode_ok))
    for ((g, f) <- grays.zip(out)) {
      val bin = f.feature.indexOf(f.feature.max)
      assert(bin === g / 16 && f.feature(bin) === 1.0f)
    }
    // exact-division layout too (4 frames, spc=2 → one run entry)
    val even = Multimodal.syntheticMjpegMp4(16, 12, 600, 600,
      Seq(8, 40, 136, 248), samplesPerChunk = 2)
    assert(Multimodal.mp4FrameChunks(even).size === 4)
    // spc larger than the sample count → a single partial chunk
    val tiny = Multimodal.syntheticMjpegMp4(16, 12, 600, 600, Seq(8, 40),
      samplesPerChunk = 8)
    assert(Multimodal.mp4FrameChunks(tiny).size === 2)
  }

  test("stsc mutation fuzz: random byte edits in the stsc box never throw, never go out of bounds") {
    val base = Multimodal.syntheticMjpegMp4(16, 12, 600, 600,
      Seq(8, 40, 136, 200, 248), samplesPerChunk = 2)
    val stscAt = (0 until base.length - 4)
      .find(i => new String(base, i, 4, "US-ASCII") == "stsc").get
    // stsc box payload: 8 header + 2 runs × 12
    val rnd = new scala.util.Random(18)
    for (_ <- 0 until 300) {
      val b = base.clone()
      for (_ <- 0 to rnd.nextInt(4)) {
        val at = stscAt + 4 + rnd.nextInt(8 + 24)
        b(at) = rnd.nextInt(256).toByte
      }
      val chunks = Multimodal.mp4FrameChunks(b) // must not throw
      chunks.foreach { case (o, s) =>
        assert(o >= 0 && s > 0 && o.toLong + s <= b.length,
          s"out-of-bounds chunk ($o,$s)")
      }
    }
  }

  test("deeply nested LIST headers (crafted ~100KB AVI) walk without stack growth") {
    // ADVICE r15: the recursive chunk walk overflowed the JVM stack on a
    // crafted AVI of thousands of nested 12-byte LIST headers, and
    // StackOverflowError is an Error — it escaped the per-payload
    // Exception guard and failed the task, violating the untrusted-bytes
    // contract. The walk is iterative now; this fixture is the attack.
    val depth = 8000 // ~96 KB of headers, far past default JVM stack depth
    val tail = 12 // one 00dc-shaped chunk at the innermost level
    val total = 12 + depth * 12 + tail
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
      .put("AVI ".getBytes("US-ASCII"))
    for (i <- 0 until depth) {
      // each LIST declares the remaining bytes as its payload; the first
      // is `movi` so the innermost chunk is in-scope for frame capture
      val remaining = total - 12 - (i + 1) * 12 + 4
      b.put("LIST".getBytes("US-ASCII")).putInt(remaining)
        .put((if (i == 0) "movi" else "rec ").getBytes("US-ASCII"))
    }
    b.put("00dc".getBytes("US-ASCII")).putInt(4).putInt(0)
    val bytes = b.array()
    // both walkers complete promptly and correctly
    val chunks = Multimodal.mjpegFrameChunks(bytes)
    assert(chunks.size === 1 && chunks.head._2 === 4)
    assert(!Multimodal.parseVideoMeta(bytes).parse_ok) // no avih anywhere
    // and through the full decode leg: one decode_ok=false row (the
    // chunk bytes are not a JPEG), never a task failure
    val out = Multimodal.decodeVideoFrames(
        Seq(MediaRow(0L, "video", bytes, None, None, None, None)).toDS(), 8)
      .collect()
    assert(out.length === 1 && !out.head.decode_ok)
  }

  test("even-sampling index arithmetic survives huge chunk counts (k*n Int overflow)") {
    // ADVICE r15: idx = k*n/maxFrames in Int overflows negative for
    // ~22M chunks × k≥98 — exercise the exact expression shape via the
    // same Long math decodeVideoFrames now uses
    val n = 22000000
    val maxFrames = 100
    val idxs = (0 until maxFrames).map(k => (k.toLong * n / maxFrames).toInt)
    assert(idxs.forall(i => i >= 0 && i < n))
    assert(idxs === idxs.sorted && idxs.distinct.size === maxFrames)
  }
}
