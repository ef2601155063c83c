package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata, plus the decode /
  * feature-extract / resize / frame-sample plumbing.
  *
  * The image leg decodes REAL bytes via the JDK's `javax.imageio`
  * ([[decodeImages]]); the audio leg decodes REAL WAV/PCM bytes via the
  * JDK's `javax.sound.sampled` ([[decodeAudio]]); video container
  * metadata is REALLY parsed ([[decodeVideoMeta]]) and MJPEG-in-AVI
  * frame pixels are REALLY decoded ([[decodeVideoFrames]] — MJPEG
  * frames are plain JPEGs). Inter-frame video codecs (H.264 …) are NOT
  * in the JDK or this container, so that one decode kernel is STUBBED
  * with a deterministic fake (clearly marked below).
  * Everything Spark-side is real and tested: the schema, the partitioning
  * (media rows are large → size partitions by bytes, not rows), the
  * per-partition batch shape (`mapPartitions` over an iterator so one
  * decoder instance is reused per task, exactly how a JNI/FFI codec binding
  * would be held), and the column contracts downstream operators rely on.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. `kind` ∈
    * {image, audio, video}.
    */
  case class MediaRow(
      media_id: Long,
      kind: String,
      bytes: Array[Byte],
      width: Option[Int],
      height: Option[Int],
      sample_rate: Option[Int],
      n_frames: Option[Int])

  /** Extracted features: fixed-width vector + the metadata that survived
    * decode.
    */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      feature: Array[Float],
      decode_ok: Boolean)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
  ))

  val FeatureDim = 16

  /** ===================== STUB (non-MJPEG video frames only) ========
    * Deterministic fake decode: a real implementation binds a video codec
    * (e.g. via JNI/FFI) here and returns frame-derived features. Image
    * ([[decodeImages]]) and audio ([[decodeAudio]]) decode REAL bytes via
    * JDK codecs, video CONTAINER METADATA (width/height/fps/frames)
    * is REALLY parsed pure-JVM by [[decodeVideoMeta]], and MJPEG-in-AVI
    * frame pixels are REALLY decoded by [[decodeVideoFrames]] (MJPEG
    * frames are plain JPEGs — ImageIO handles them). Only inter-frame
    * codecs (H.264 etc.) have no JVM decoder, so this fake derives a
    * reproducible feature vector from a rolling hash of the payload so
    * tests can assert exact values end-to-end. Everything outside this
    * function is production-shaped.
    */
  private[multimodal] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null) return Array.fill(FeatureDim)(0f)
    var h = 1125899906842597L
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var j = 0
    while (j < FeatureDim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 40).toInt % 1000) / 1000.0f
      j += 1
    }
    out
  }

  /** Decode + feature-extract over partitions: one iterator pass per task,
    * the shape a real codec binding needs (init once per partition, stream
    * rows through). Null payloads surface `decode_ok = false`, not a crash.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val codec = Codec.open() — once per partition
      rows.map { r =>
        val ok = r.bytes != null && r.bytes.nonEmpty
        MediaFeatures(r.media_id, r.kind, decodeStub(r.bytes), ok)
      }
    }
  }

  /** Image decode result: real dimensions + pixel-derived features. */
  case class ImageDecoded(
      media_id: Long,
      decode_ok: Boolean,
      width: Int,
      height: Int,
      feature: Array[Float])

  /** REAL image decode — not a stub. `javax.imageio` is part of the JDK
    * (pure-JVM PNG/JPEG/BMP/GIF codecs), so the image leg of the
    * multimodal seam can decode actual bytes: dimensions come from the
    * decoded raster and the feature vector is a normalized 16-bin
    * luminance histogram of the pixels. Audio/video stay behind
    * [[decodeStub]] (no codecs for those in the JDK). Corrupt or
    * non-image payloads surface `decode_ok = false` with zeroed features
    * — never a task failure, which at 100 TB matters more than locally
    * (one bad blob must not kill a 10k-task stage).
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // ImageIO holds per-JVM codec registries; per-partition iterator
      // keeps the reader lookup out of the per-row path
      rows.map { r =>
        val failed = ImageDecoded(r.media_id, decode_ok = false, -1, -1,
          new Array[Float](FeatureDim))
        if (r.bytes == null || r.bytes.isEmpty) failed
        else
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
            if (img == null) failed
            else ImageDecoded(r.media_id, decode_ok = true,
              img.getWidth, img.getHeight, lumaHistogram(img))
          } catch { case _: Exception => failed }
      }
    }
  }

  /** Normalized 16-bin luminance histogram — deterministic for a given
    * pixel raster (PNG is lossless, so encode→decode round-trips exactly).
    */
  private[graft] def lumaHistogram(img: java.awt.image.BufferedImage): Array[Float] = {
    val bins = new Array[Int](FeatureDim)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        bins(luma * FeatureDim / 256) += 1
        x += 1
      }
      y += 1
    }
    val n = math.max(1, w * h)
    bins.map(_.toFloat / n)
  }

  /** Deterministic synthetic PNG (TYPE_INT_RGB, pixel = splitmix of
    * (id, x, y)) — real encoded image bytes for exercising the real
    * decode path where the fixtures carry only text payloads.
    */
  def syntheticPng(id: Long, width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var z = id * 1000003L + y.toLong * 8191L + x + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        img.setRGB(x, y, ((z ^ (z >>> 31)) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Audio decode result: real format metadata + waveform-derived
    * features.
    */
  case class AudioDecoded(
      media_id: Long,
      decode_ok: Boolean,
      sample_rate: Int,
      n_samples: Long,
      duration_sec: Double,
      rms: Double,
      zero_crossings: Long,
      peak: Int)

  /** REAL audio decode — not a stub. `javax.sound.sampled.AudioSystem`
    * is part of the JDK (pure-JVM WAV/AIFF/AU PCM codecs), the same move
    * that made the image leg real: sample rate and count come from the
    * decoded stream and the features (RMS, zero-crossing count, peak) are
    * computed from the actual 16-bit samples — all integer-derived double
    * math, so values are exactly reproducible. Scope is 16-bit mono PCM
    * (the training-corpus normal form); other formats and corrupt
    * payloads surface `decode_ok = false` with sentinel values (-1 for
    * sample_rate / n_samples / zero_crossings, 0 elsewhere) — never a
    * task failure (one bad blob must not kill a 10k-task stage). Gate
    * on `decode_ok` before aggregating features.
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // AudioSystem holds per-JVM provider registries; per-partition
      // iterator keeps the reader lookup out of the per-row path
      rows.map { r =>
        val failed = AudioDecoded(r.media_id, decode_ok = false, -1, -1L,
          0.0, 0.0, -1L, 0)
        if (r.bytes == null || r.bytes.isEmpty) failed
        else
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.bytes))
            try {
              val fmt = ais.getFormat
              val pcmSigned =
                fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
              if (!pcmSigned || fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1)
                failed
              else {
                val data = ais.readAllBytes()
                val bigEndian = fmt.isBigEndian
                val n = data.length / 2
                var sumSq = 0.0d
                var zc = 0L
                var peak = 0
                var prevSign = 0
                var i = 0
                while (i < n) {
                  val b0 = data(2 * i)
                  val b1 = data(2 * i + 1)
                  val s = if (bigEndian) (b0.toInt << 8) | (b1 & 0xff)
                    else (b1.toInt << 8) | (b0 & 0xff)
                  sumSq += s.toDouble * s.toDouble
                  val a = math.abs(s)
                  if (a > peak) peak = a
                  val sign = Integer.signum(s)
                  if (sign != 0) {
                    if (prevSign != 0 && sign != prevSign) zc += 1
                    prevSign = sign
                  }
                  i += 1
                }
                val rate = fmt.getSampleRate.toInt
                AudioDecoded(r.media_id, decode_ok = true, rate, n.toLong,
                  n.toDouble / rate, math.sqrt(sumSq / math.max(1, n)), zc, peak)
              }
            } finally ais.close()
          } catch { case _: Exception => failed }
      }
    }
  }

  /** The deterministic waveform behind [[syntheticWav]]: a square wave
    * whose half-period and amplitude derive from the id — hand-computable
    * features (RMS = amplitude exactly; zero crossings = block count − 1)
    * so tests assert exact decoded values.
    */
  private[graft] def syntheticSamples(id: Long, n: Int): Array[Short] = {
    val half = 4 + (id % 13).toInt
    val amp = (1000 + (id % 7) * 1000).toShort
    Array.tabulate(n)(i =>
      if ((i / half) % 2 == 0) amp else (-amp).toShort)
  }

  /** Deterministic synthetic WAV (16-bit mono signed PCM, little-endian)
    * — real encoded audio bytes via the JDK's own WAVE writer, for
    * exercising the real decode path where the fixtures carry only text
    * payloads (the audio analogue of [[syntheticPng]]).
    */
  def syntheticWav(id: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val samples = syntheticSamples(id, nSamples)
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Video container metadata, parsed from REAL header bytes (no codec
    * needed — see [[decodeVideoMeta]]).
    */
  case class VideoMeta(
      media_id: Long,
      parse_ok: Boolean,
      container: String,
      width: Int,
      height: Int,
      n_frames: Long,
      fps: Double,
      duration_sec: Double)

  private val videoMetaFailed =
    VideoMeta(-1L, parse_ok = false, "unknown", -1, -1, -1L, 0.0, 0.0)

  /** REAL video metadata decode — not a stub. No JVM video CODEC exists,
    * but the CONTAINERS are plain structured bytes: RIFF/AVI's `avih`
    * main header (width/height/µs-per-frame/total-frames —
    * MainAVIHeader, little-endian) and ISO BMFF/MP4's `mvhd`
    * (timescale/duration), `tkhd` (16.16 fixed-point track dims) and
    * `stsz` (sample count) boxes (big-endian), all parseable pure-JVM.
    * This de-stubs the metadata half of the video leg the way
    * imageio/javax.sound did for images/audio; only frame-pixel decode
    * remains behind [[decodeStub]]. Truncated or non-video payloads
    * surface `parse_ok = false` with sentinel values — never a task
    * failure (one bad blob must not kill a 10k-task stage).
    */
  def decodeVideoMeta(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.bytes == null || r.bytes.length < 12) videoMetaFailed.copy(media_id = r.media_id)
        else
          try parseVideoMeta(r.bytes).copy(media_id = r.media_id)
          catch { case _: Exception => videoMetaFailed.copy(media_id = r.media_id) }
      }
    }
  }

  /** Container sniff + parse: "RIFF…AVI " → [[parseAviMeta]]; a leading
    * ISO box whose type is `ftyp` → [[parseMp4Meta]]; else unknown.
    */
  private[graft] def parseVideoMeta(bytes: Array[Byte]): VideoMeta = {
    def fourcc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (bytes.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ")
      parseAviMeta(bytes)
    else if (bytes.length >= 12 && fourcc(4) == "ftyp")
      parseMp4Meta(bytes)
    else videoMetaFailed
  }

  private def u32le(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Walk RIFF chunks (fourcc + LE size + payload, even-padded),
    * descending into LIST chunks, until the `avih` MainAVIHeader:
    * dwMicroSecPerFrame @0, dwTotalFrames @16, dwWidth @32, dwHeight
    * @36 (offsets per the public AVI spec / Windows `AVIMAINHEADER`).
    */
  private[graft] def parseAviMeta(bytes: Array[Byte]): VideoMeta = {
    def fourcc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    // Explicit work stack, NOT recursion: a crafted AVI packing thousands
    // of nested 12-byte LIST headers into ~100 KB would otherwise grow the
    // JVM call stack without bound, and StackOverflowError is an Error —
    // it escapes per-payload Exception guards and fails the whole task.
    def walk(): Option[Int] = {
      val stack = scala.collection.mutable.Stack[(Int, Int)]((12, bytes.length))
      while (stack.nonEmpty) {
        var (off, end) = stack.pop()
        var walking = true
        while (walking && off + 8 <= end) {
          val cc = fourcc(off)
          // Long, not Int: a declared u32 size >= 2^31 must not wrap negative
          // (0xFFFFFFF8 as Int is -8, which would stop the offset advancing —
          // an infinite loop on one corrupt blob). Mirror parseMp4Meta's
          // malformed-size bail-out: stop the walk, keep nothing.
          val size = u32le(bytes, off + 4)
          val payload = off + 8L
          if (cc == "avih") return Some(payload.toInt)
          val next = payload + size + (size & 1L) // chunks are word-aligned
          if (cc == "LIST" && payload + 4 <= end) {
            // Siblings resume after the child subtree (depth-first order).
            if (next > off && next <= end) stack.push((next.toInt, end))
            off = (payload + 4).toInt
            end = math.min(end.toLong, payload + size).toInt
          } else if (next <= off || next > end) {
            walking = false // truncated/malformed: must strictly advance
          } else off = next.toInt
        }
      }
      None
    }
    walk() match {
      case Some(p) if p + 40 <= bytes.length =>
        val usPerFrame = u32le(bytes, p)
        val nFrames = u32le(bytes, p + 16)
        val w = u32le(bytes, p + 32).toInt
        val h = u32le(bytes, p + 36).toInt
        val fps = if (usPerFrame > 0) 1.0e6 / usPerFrame else 0.0
        VideoMeta(-1L, parse_ok = true, "avi", w, h, nFrames,
          math.rint(fps * 1e6) / 1e6,
          math.rint(nFrames * usPerFrame / 1e6 * 1e6) / 1e6)
      case _ => videoMetaFailed
    }
  }

  /** One decoded video frame: real pixel-derived features (same 16-bin
    * luminance histogram as the image leg), plus the frame's original
    * index in the stream. `frame_idx = -1` with `decode_ok = false`
    * marks a payload with no decodable frames (non-AVI container,
    * truncated RIFF, or a codec this engine has no decoder for).
    */
  case class VideoFrame(
      media_id: Long,
      frame_idx: Int,
      decode_ok: Boolean,
      width: Int,
      height: Int,
      feature: Array[Float])

  /** (offset, length) of each `00dc` (stream-0 compressed) frame chunk
    * inside the `movi` list — the same guarded RIFF walk as
    * [[parseAviMeta]] (u32 sizes kept Long, strict offset advance, so
    * one corrupt blob can never loop a task).
    */
  private[graft] def mjpegFrameChunks(bytes: Array[Byte]): Seq[(Int, Int)] = {
    def fourcc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    // Explicit work stack, NOT recursion — same rationale as
    // [[parseAviMeta]]: nested LIST headers are attacker-controlled depth,
    // and a StackOverflowError would escape the Exception guard upstream.
    // Chunk order is preserved (siblings resume after the child subtree).
    val stack = scala.collection.mutable.Stack[(Int, Int, Boolean)](
      (12, bytes.length, false))
    while (stack.nonEmpty) {
      var (off, end, inMovi) = stack.pop()
      var walking = true
      while (walking && off + 8 <= end) {
        val cc = fourcc(off)
        val size = u32le(bytes, off + 4)
        val payload = off + 8L
        val next = payload + size + (size & 1L)
        if (cc == "LIST" && payload + 4 <= end) {
          if (next > off && next <= end) stack.push((next.toInt, end, inMovi))
          val childInMovi = inMovi || fourcc(payload.toInt) == "movi"
          off = (payload + 4).toInt
          end = math.min(end.toLong, payload + size).toInt
          inMovi = childInMovi
        } else {
          if (inMovi && cc == "00dc" && payload + size <= end && size > 0)
            out += ((payload.toInt, size.toInt))
          if (next <= off || next > end) walking = false
          else off = next.toInt
        }
      }
    }
    out.toSeq
  }

  /** (offset, length) of each video SAMPLE in an MJPEG-in-MP4: walk the
    * ISO boxes to the first VIDEO trak (nonzero `tkhd` dims — the
    * [[parseMp4Meta]] audio-trak discipline), read its `stsz`
    * per-sample sizes, `stco` chunk offsets, and `stsc` sample-to-chunk
    * runs, then expand the run-length table the way the spec defines
    * it: entry (first_chunk, samples_per_chunk) applies to every chunk
    * until the next entry's first_chunk; samples are CONTIGUOUS within
    * a chunk, so sample i's offset is its chunk's `stco` offset plus
    * the sizes of the samples before it in that chunk. Round 18
    * (verdict #8) generalized this from the 1-sample-per-chunk
    * fast-path layout to arbitrary stsc tables — real muxers
    * interleave several samples per chunk. The expansion is strictly
    * validated (first entry at chunk 1, first_chunk strictly
    * increasing, spc ≥ 1, and the run table must consume EXACTLY the
    * stsz sample count over EXACTLY the stco chunk count) — anything
    * inconsistent, plus still-unsupported layouts (`co64` 64-bit
    * offsets, v1 boxes), returns empty → one `decode_ok=false` row,
    * never a guess. Iterative walk (explicit stack), offsets guarded
    * against the payload length: untrusted bytes can never loop,
    * overflow, or recurse a task to death.
    */
  private[graft] def mp4FrameChunks(bytes: Array[Byte]): Seq[(Int, Int)] = {
    def fourcc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (bytes.length < 12 || fourcc(4) != "ftyp") return Seq.empty
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    // per-trak state, reset at each `trak` header (trak boxes never nest)
    var tw = 0; var th = 0
    var sizes: Array[Int] = null
    var offs: Array[Int] = null
    var stsc: Array[(Int, Int)] = null // (first_chunk, samples_per_chunk)
    var stscBad = false // a malformed/oversized stsc box refuses the trak
    var found: Seq[(Int, Int)] = Seq.empty
    // expand (stsz, stco, stsc) to per-sample (offset, length); null on
    // any inconsistency — the caller treats that as "cannot locate"
    def expand(): Array[(Int, Int)] = {
      if (stsc == null || stsc.isEmpty) {
        // no (or empty) stsc: acceptable iff the layout is trivially
        // 1 sample per chunk (counts match) — the pre-round-18 rule
        if (sizes.length != offs.length) return null
        return offs.zip(sizes)
      }
      if (stsc.head._1 != 1) return null
      var e = 0
      while (e < stsc.length) {
        if (stsc(e)._2 < 1) return null
        if (e > 0 && stsc(e)._1 <= stsc(e - 1)._1) return null
        e += 1
      }
      val out = new Array[(Int, Int)](sizes.length)
      var si = 0
      var run = 0
      var ci = 0
      while (ci < offs.length) {
        while (run + 1 < stsc.length && stsc(run + 1)._1 <= ci + 1) run += 1
        val spc = stsc(run)._2
        if (si.toLong + spc > sizes.length) return null // run overruns stsz
        var off = offs(ci)
        var j = 0
        while (j < spc) {
          out(si) = (off, sizes(si))
          off += sizes(si)
          si += 1
          j += 1
        }
        ci += 1
      }
      if (si != sizes.length) return null // chunks ran out before samples
      out
    }
    def closeTrak(): Unit = {
      if (found.isEmpty && tw > 0 && th > 0 && sizes != null && offs != null &&
          !stscBad && sizes.nonEmpty) {
        val chunks = expand()
        if (chunks != null && chunks.forall { case (o, s) =>
            o >= 0 && s > 0 && o.toLong + s <= bytes.length })
          found = chunks.toSeq
      }
      tw = 0; th = 0; sizes = null; offs = null; stsc = null; stscBad = false
    }
    def u32at(p: Int): Long = u32be(bytes, p)
    def intList(p: Int, n: Long, end: Int): Array[Int] =
      if (n < 0 || n > (end - p) / 4) null
      else Array.tabulate(n.toInt)(i => u32at(p + 4 * i).toInt)
    val stack = scala.collection.mutable.Stack[(Int, Int)]((0, bytes.length))
    while (stack.nonEmpty) {
      var (off, end) = stack.pop()
      var walking = true
      while (walking && off + 8 <= end) {
        val size = u32at(off)
        if (size < 8) { walking = false }
        else {
          val cc = fourcc(off + 4)
          val p = off + 8
          val next = off + size // Long: cannot wrap
          if (cc == "trak") closeTrak() // a new trak begins
          if (containers(cc)) {
            if (next > off && next <= end) stack.push((next.toInt, end))
            end = math.min(end.toLong, off + size).toInt
            off = p
          } else {
            cc match {
              case "tkhd" if p + 4 <= end =>
                val v = bytes(p) & 0xff
                val dimOff = p + (if (v == 1) 88 else 76)
                if (dimOff + 8 <= end) {
                  tw = (u32at(dimOff) >> 16).toInt
                  th = (u32at(dimOff + 4) >> 16).toInt
                }
              case "stsz" if p + 12 <= end =>
                val fixed = u32at(p + 4)
                val n = u32at(p + 8)
                sizes =
                  if (fixed > 0 && fixed <= Int.MaxValue)
                    if (n >= 0 && n <= (1L << 22)) Array.fill(n.toInt)(fixed.toInt) else null
                  else intList(p + 12, n, math.min(end.toLong, off + size).toInt)
              case "stco" if p + 8 <= end =>
                offs = intList(p + 8, u32at(p + 4),
                  math.min(end.toLong, off + size).toInt)
              case "stsc" if p + 8 <= end =>
                val n = u32at(p + 4)
                val entryEnd = math.min(end.toLong, off + size).toInt
                if (n < 0 || n > (entryEnd - p - 8) / 12) { stsc = null; stscBad = true }
                else {
                  stscBad = false
                  stsc = Array.tabulate(n.toInt) { i =>
                    val fc = u32at(p + 8 + 12 * i)
                    val spc = u32at(p + 8 + 12 * i + 4)
                    // clamp into Int range; expand() re-validates — an
                    // absurd value just fails the consistency checks
                    (math.min(fc, Int.MaxValue).toInt,
                      math.min(spc, Int.MaxValue).toInt)
                  }
                }
              case _ => ()
            }
            if (next <= off || next > end) walking = false
            else off = next.toInt
          }
        }
      }
    }
    closeTrak()
    found
  }

  /** REAL video frame-pixel decode for MJPEG-in-AVI — the round-14
    * de-stub: MJPEG frames are plain JPEGs, so the JDK's ImageIO
    * decodes them without a video codec; the RIFF walk locates the
    * `00dc` chunks the same way [[parseAviMeta]] locates `avih`. Up to
    * `maxFrames` frames are sampled EVENLY across the stream
    * (`idx(k) = k·n/maxFrames` — deterministic, replayable
    * relationally), each decoded to the image leg's 16-bin luminance
    * histogram. Other containers/codecs still have no JVM decoder and
    * surface one `decode_ok = false` row per payload — never a task
    * failure, and never silently zero rows (an undecodable corpus must
    * stay visible in the output).
    */
  def decodeVideoFrames(media: Dataset[MediaRow],
      maxFrames: Int = 8): Dataset[VideoFrame] = {
    require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        def failed = VideoFrame(r.media_id, -1, decode_ok = false, -1, -1,
          new Array[Float](FeatureDim))
        // NonFatal OR StackOverflowError: the walk is iterative now, but
        // ImageIO below can still blow the stack on crafted inputs, and the
        // "never a task failure" contract must hold for untrusted bytes.
        // (Plain Throwable would also swallow task-kill interrupts.)
        def corruptGuard(t: Throwable): Boolean =
          scala.util.control.NonFatal(t) || t.isInstanceOf[StackOverflowError]
        // container sniff: RIFF/AVI → `00dc` chunk walk; ISO `ftyp` →
        // video-trak stsz/stco sample walk (round-16 MP4 parity) —
        // MJPEG samples are plain JPEGs in both containers
        val chunks =
          if (r.bytes == null) Seq.empty
          else try {
            if (r.bytes.length >= 12 &&
                new String(r.bytes, 4, 4, "US-ASCII") == "ftyp")
              mp4FrameChunks(r.bytes)
            else mjpegFrameChunks(r.bytes)
          } catch { case t if corruptGuard(t) => Seq.empty }
        if (chunks.isEmpty) Iterator.single(failed)
        else {
          val n = chunks.size
          val idxs =
            if (n <= maxFrames) 0 until n
            // Long multiply: k*n overflows Int when a ~200 MB blob carries
            // tens of millions of tiny chunks and maxFrames is large —
            // a negative index would throw outside the per-frame guard.
            else (0 until maxFrames).map(k => (k.toLong * n / maxFrames).toInt)
          idxs.iterator.map { i =>
            val (off, len) = chunks(i)
            try {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(r.bytes, off, len))
              if (img == null) failed.copy(frame_idx = i)
              else VideoFrame(r.media_id, i, decode_ok = true,
                img.getWidth, img.getHeight, lumaHistogram(img))
            } catch { case t if corruptGuard(t) => failed.copy(frame_idx = i) }
          }
        }
      }
    }
  }

  /** Recursive descent over ISO BMFF boxes (BE u32 size + type):
    * `mvhd` v0/v1 → (timescale, duration); per `trak`, the `tkhd`
    * 16.16 fixed-point dims and the `stsz` sample_count are collected
    * TOGETHER, and only a trak with nonzero dims (a video trak — audio
    * traks carry 0×0) contributes (width, height, n_frames). Real MP4s
    * almost always have an audio trak whose sample count exceeds the
    * video frame count (AAC ~47 packets/s vs 24–30 fps), so a global
    * max-stsz would report audio packets as frames.
    * fps = n_frames / (duration / timescale).
    */
  private[graft] def parseMp4Meta(bytes: Array[Byte]): VideoMeta = {
    val containers = Set("moov", "mdia", "minf", "stbl")
    // container-nesting cap: ISO files nest a handful deep; a crafted
    // blob of thousands of nested `moov` headers would otherwise grow
    // the call stack without bound (the mjpegFrameChunks hazard, MP4
    // form) — beyond the cap the walk abandons the subtree, keeping
    // whatever it has found (same degrade-to-failed posture as every
    // malformed-size bail-out here)
    val MaxDepth = 64
    var timescale = 0L; var duration = 0L
    var w = 0; var h = 0; var nFrames = 0L
    def fourcc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    // Walk one trak subtree, returning (width, height, stsz sample_count)
    // scoped to that trak alone.
    def walkTrak(start: Int, end: Int, depth: Int): (Int, Int, Long) = {
      var tw = 0; var th = 0; var samples = 0L
      def go(start: Int, end: Int, depth: Int): Unit = {
        if (depth > MaxDepth) return
        var off = start
        while (off + 8 <= end) {
          // Long, not Int: a declared u32 size in [2^31-off, 2^31) passes
          // the size->=-8 guard but wraps `off + size` negative as Int —
          // the next header read would throw instead of returning failed
          // (the AVI walker's strict-advance contract, PropertySpec)
          val size = u32be(bytes, off)
          if (size < 8) return
          val cc = fourcc(off + 4)
          val p = off + 8
          cc match {
            case c if containers(c) =>
              go(p, math.min(end.toLong, off + size).toInt, depth + 1)
            case "tkhd" if tw == 0 && p + 4 <= end => // guard the version read
              val v = bytes(p) & 0xff
              // v0: 4 ver/flags + 8 times + 4 id + 4 rsvd + 4 dur + 8 rsvd
              //     + 8 layer/alt/vol/rsvd + 36 matrix = 76; v1: times and
              //     duration are 64-bit → +12
              val dimOff = p + (if (v == 1) 88 else 76)
              if (dimOff + 8 <= end) {
                tw = (u32be(bytes, dimOff) >> 16).toInt
                th = (u32be(bytes, dimOff + 4) >> 16).toInt
              }
            case "stsz" if p + 12 <= end =>
              samples = math.max(samples, u32be(bytes, p + 8))
            case _ => ()
          }
          val next = off + size // Long: cannot wrap
          if (next <= off || next > end) return // malformed: must strictly advance
          off = next.toInt
        }
      }
      go(start, end, depth)
      (tw, th, samples)
    }
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > MaxDepth) return
      var off = start
      while (off + 8 <= end) {
        val size = u32be(bytes, off) // Long — see walkTrak's overflow note
        if (size < 8) return // malformed/64-bit sizes: stop, keep findings
        val cc = fourcc(off + 4)
        val p = off + 8
        cc match {
          case c if containers(c) =>
            walk(p, math.min(end.toLong, off + size).toInt, depth + 1)
          case "trak" =>
            val (tw, th, samples) =
              walkTrak(p, math.min(end.toLong, off + size).toInt, depth + 1)
            if (tw > 0 && th > 0 && w == 0) { // first video trak wins
              w = tw; h = th; nFrames = samples
            }
          case "mvhd" if p + 4 <= end =>
            val v = bytes(p) & 0xff
            if (v == 1 && p + 32 <= end) {
              timescale = u32be(bytes, p + 20)
              duration = (u32be(bytes, p + 24) << 32) | u32be(bytes, p + 28)
            } else if (p + 20 <= end) {
              timescale = u32be(bytes, p + 12)
              duration = u32be(bytes, p + 16)
            }
          case _ => ()
        }
        val next = off + size // Long: cannot wrap
        if (next <= off || next > end) return // malformed: must strictly advance
        off = next.toInt
      }
    }
    walk(0, bytes.length, 0)
    if (timescale <= 0 || w <= 0) videoMetaFailed
    else {
      val durSec = duration.toDouble / timescale
      val fps = if (durSec > 0) nFrames / durSec else 0.0
      VideoMeta(-1L, parse_ok = true, "mp4", w, h, nFrames,
        math.rint(fps * 1e6) / 1e6, math.rint(durSec * 1e6) / 1e6)
    }
  }

  /** Deterministic synthetic AVI: a real RIFF container with a real
    * `avih` MainAVIHeader (and an empty `movi` list — header-only, no
    * frames), the video analogue of [[syntheticPng]]/[[syntheticWav]]:
    * real encoded container bytes for exercising the real metadata
    * parse where fixtures carry only text.
    */
  def syntheticAvi(width: Int, height: Int, fps: Int, nFrames: Int): Array[Byte] = {
    require(fps > 0)
    val out = java.nio.ByteBuffer.allocate(12 + 8 + 4 + 8 + 56 + 8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(out.capacity - 8)
      .put("AVI ".getBytes("US-ASCII"))
    out.put("LIST".getBytes("US-ASCII")).putInt(4 + 8 + 56)
      .put("hdrl".getBytes("US-ASCII"))
    out.put("avih".getBytes("US-ASCII")).putInt(56)
    out.putInt(1000000 / fps) // dwMicroSecPerFrame
      .putInt(0).putInt(0).putInt(0x10) // maxBytesPerSec, padding, AVIF_HASINDEX
      .putInt(nFrames).putInt(0).putInt(1).putInt(0) // totalFrames, initial, streams, bufSize
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    out.put("LIST".getBytes("US-ASCII")).putInt(4).put("movi".getBytes("US-ASCII"))
    out.array()
  }

  /** JPEG-encode at an explicit quality (ImageIO's default writer
    * quality is low enough to visibly shift uniform tones; 0.95 keeps a
    * mid-bin uniform gray EXACT through encode→decode — verified for
    * all 16 luminance bins, see [[syntheticMjpegAvi]]).
    */
  private def jpegBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.95f)
    w.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bos))
    try w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    finally w.dispose()
    bos.toByteArray
  }

  /** One RIFF chunk: fourcc + LE u32 size + payload, even-padded (the
    * word alignment [[parseAviMeta]]'s walk expects).
    */
  private def riffChunk(cc: String, payload: Array[Byte]): Array[Byte] = {
    val pad = payload.length & 1
    val b = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(cc.getBytes("US-ASCII")).putInt(payload.length).put(payload)
    b.array()
  }

  /** Deterministic synthetic MJPEG-in-AVI: a real RIFF container whose
    * `movi` list carries one `00dc` chunk per frame, each a REAL JPEG
    * (encoded at quality 0.95) of a uniform gray raster. Uniform
    * MID-BIN grays (`g = 16·bin + 8`) are the trick that makes the
    * frame chain ORACLE-able despite JPEG being lossy: a uniform image
    * is DC-only per 8×8 block, and at 0.95 the quantize→dequantize
    * round trip returns the exact input level for every mid-bin value
    * (verified for all 16 bins on the JDK codec), so the decoded
    * 16-bin luminance histogram is exactly one-hot at `bin` — a value
    * a relational oracle can regenerate from the gray-level arithmetic
    * alone while the Spark side still exercises a real JPEG decode.
    */
  /** One quality-0.95 JPEG of a uniform gray raster — the shared frame
    * payload for both MJPEG fixture writers.
    */
  private def grayJpeg(width: Int, height: Int, g: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    jpegBytes(img)
  }

  def syntheticMjpegAvi(width: Int, height: Int, fps: Int,
      grays: Seq[Int]): Array[Byte] = {
    require(fps > 0 && grays.nonEmpty)
    val frames = grays.map(grayJpeg(width, height, _))
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0x10)
      .putInt(grays.size).putInt(0).putInt(1).putInt(0)
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    val hdrl = riffChunk("LIST",
      "hdrl".getBytes("US-ASCII") ++ riffChunk("avih", avih.array()))
    val movi = riffChunk("LIST",
      "movi".getBytes("US-ASCII") ++
        frames.flatMap(f => riffChunk("00dc", f)))
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(payload.length).put(payload)
    out.array()
  }

  /** Deterministic synthetic MP4: real ISO BMFF boxes — `ftyp`, `moov`
    * with v0 `mvhd` (timescale/duration), one `trak` with v0 `tkhd`
    * (16.16 dims) and a `stbl`/`stsz` carrying the sample count; empty
    * `mdat`. Header-only, no encoded frames.
    */
  def syntheticMp4(width: Int, height: Int, timescale: Int, duration: Long,
      nFrames: Long): Array[Byte] = {
    val trak = mp4Trak(width, height, trackId = 1, duration, nFrames)
    val moov = isoBox("moov",
      isoBox("mvhd", mvhdV0(timescale, duration, nextTrackId = 2)) ++ trak)
    isoBox("ftyp", "isomisom".getBytes("US-ASCII")) ++ moov ++
      isoBox("mdat", Array.emptyByteArray)
  }

  private def isoBox(cc: String, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length).put(cc.getBytes("US-ASCII")).put(payload)
    b.array()
  }

  /** v0 `mvhd` payload (100 bytes): the offset-sensitive layout lives in
    * exactly one place, shared by both synthetic writers.
    */
  private def mvhdV0(timescale: Int, duration: Long, nextTrackId: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(100)
    b.putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // creation, modification
      .putInt(timescale).putInt(duration.toInt)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, rsvd
      .putLong(0) // reserved
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(b.putInt)
    (1 to 6).foreach(_ => b.putInt(0)) // pre_defined
    b.putInt(nextTrackId)
    b.array()
  }

  /** One `trak` subtree: v0 `tkhd` with 16.16 dims (0×0 for non-video
    * traks, per spec) and a `stbl`/`stsz` carrying the sample count.
    */
  private[graft] def mp4Trak(width: Int, height: Int, trackId: Int,
      duration: Long, nSamples: Long,
      stblOverride: Option[Array[Byte]] = None): Array[Byte] = {
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(7) // version 0, flags = enabled|in_movie|in_preview
        .putInt(0).putInt(0).putInt(trackId).putInt(0) // creation, mod, track_ID, rsvd
        .putInt(duration.toInt).putLong(0)
        .putShort(0).putShort(0).putShort(0).putShort(0) // layer, alt, volume, rsvd
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(b.putInt)
      b.putInt(width << 16).putInt(height << 16)
      b.array()
    }
    val stsz = {
      val b = java.nio.ByteBuffer.allocate(12)
      b.putInt(0).putInt(0).putInt(nSamples.toInt) // v/flags, sample_size=0, count
      b.array()
    }
    val stbl = stblOverride.getOrElse(isoBox("stbl", isoBox("stsz", stsz)))
    isoBox("trak", isoBox("tkhd", tkhd) ++ isoBox("mdia", isoBox("minf", stbl)))
  }

  /** Deterministic synthetic MJPEG-in-MP4 — [[syntheticMjpegAvi]]'s
    * one-hot oracle trick in ISO BMFF: a real `ftyp`/`moov`/`mdat`
    * file whose video trak carries per-sample JPEG sizes in `stsz`,
    * a 1-sample-per-chunk `stsc`, and absolute `stco` offsets pointing
    * each sample at its JPEG inside `mdat` — exactly the layout
    * [[mp4FrameChunks]] accepts. Frames are quality-0.95 uniform
    * mid-bin grays, so decoded histograms stay exactly one-hot.
    */
  def syntheticMjpegMp4(width: Int, height: Int, timescale: Int,
      duration: Long, grays: Seq[Int], samplesPerChunk: Int = 1): Array[Byte] = {
    require(grays.nonEmpty)
    require(samplesPerChunk >= 1)
    val frames = grays.map(grayJpeg(width, height, _))
    val n = frames.size
    // chunk layout: full chunks of `samplesPerChunk`, plus (per the ISO
    // run-length semantics — a chunk holds EXACTLY its run's count) a
    // second stsc entry for the final partial chunk when n % spc != 0
    val nFull = n / samplesPerChunk
    val rem = n % samplesPerChunk
    val nChunks = nFull + (if (rem > 0) 1 else 0)
    val runs: Seq[(Int, Int)] =
      if (rem == 0) Seq((1, samplesPerChunk))
      else if (nFull == 0) Seq((1, rem))
      else Seq((1, samplesPerChunk), (nFull + 1, rem))
    def fileFor(chunkOffsets: Seq[Int]): Array[Byte] = {
      val stsz = {
        val b = java.nio.ByteBuffer.allocate(12 + 4 * n)
        b.putInt(0).putInt(0).putInt(n) // v/flags, sample_size=0 (per-sample), count
        frames.foreach(f => b.putInt(f.length))
        b.array()
      }
      val stsc = {
        val b = java.nio.ByteBuffer.allocate(8 + 12 * runs.size)
        b.putInt(0).putInt(runs.size) // v/flags, entry_count
        runs.foreach { case (fc, spc) => b.putInt(fc).putInt(spc).putInt(1) }
        b.array()
      }
      val stco = {
        val b = java.nio.ByteBuffer.allocate(8 + 4 * nChunks)
        b.putInt(0).putInt(nChunks)
        chunkOffsets.foreach(b.putInt)
        b.array()
      }
      val stbl = isoBox("stbl",
        isoBox("stsz", stsz) ++ isoBox("stsc", stsc) ++ isoBox("stco", stco))
      val trak = mp4Trak(width, height, trackId = 1, duration, n, Some(stbl))
      val moov = isoBox("moov",
        isoBox("mvhd", mvhdV0(timescale, duration, nextTrackId = 2)) ++ trak)
      isoBox("ftyp", "isomisom".getBytes("US-ASCII")) ++ moov ++
        isoBox("mdat", frames.toArray.flatten)
    }
    // two passes: stco is fixed-width, so the mdat payload position is
    // independent of the offset VALUES — measure with zeros, then fill
    val probe = fileFor(Seq.fill(nChunks)(0))
    val base = probe.length - frames.map(_.length).sum
    val sampleOffs = frames.scanLeft(base)((acc, f) => acc + f.length).init
    val chunkOffs = (0 until nChunks).map(c => sampleOffs(c * samplesPerChunk))
    fileFor(chunkOffs)
  }

  /** Synthetic MP4 with BOTH a video trak and an audio trak (0×0 tkhd
    * dims, its own — typically larger — stsz sample count), mirroring
    * real files where AAC packet counts exceed video frame counts. The
    * audio trak comes FIRST, the layout that breaks a naive global
    * max-stsz n_frames.
    */
  def syntheticMp4WithAudio(width: Int, height: Int, timescale: Int,
      duration: Long, nFrames: Long, nAudioSamples: Long): Array[Byte] = {
    val audio = mp4Trak(0, 0, trackId = 1, duration, nAudioSamples)
    val video = mp4Trak(width, height, trackId = 2, duration, nFrames)
    val moov = isoBox("moov",
      isoBox("mvhd", mvhdV0(timescale, duration, nextTrackId = 3)) ++ audio ++ video)
    isoBox("ftyp", "isomisom".getBytes("US-ASCII")) ++ moov ++
      isoBox("mdat", Array.emptyByteArray)
  }

  /** A resized image: re-encoded payload + the dims it actually has. */
  case class ResizedImage(
      media_id: Long,
      resize_ok: Boolean,
      width: Int,
      height: Int,
      bytes: Array[Byte])

  /** REAL image resize: decode (`javax.imageio`) → aspect-preserving
    * downscale to fit `maxSide` (never upscales — same rule as
    * [[withResizeTarget]]) → PNG re-encode. Bilinear interpolation via
    * `Graphics2D`, all JDK. Undecodable payloads pass through untouched
    * with `resize_ok = false`.
    */
  def resizeImages(media: Dataset[MediaRow], maxSide: Int): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = if (r.bytes == null || r.bytes.isEmpty) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
            catch { case _: Exception => null }
        if (img == null) ResizedImage(r.media_id, resize_ok = false, -1, -1, r.bytes)
        else {
          val scale = math.min(1.0,
            maxSide.toDouble / math.max(1, math.max(img.getWidth, img.getHeight)))
          val tw = math.max(1, math.ceil(img.getWidth * scale).toInt)
          val th = math.max(1, math.ceil(img.getHeight * scale).toInt)
          val out = new java.awt.image.BufferedImage(
            tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, tw, th, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          ResizedImage(r.media_id, resize_ok = true, tw, th, bos.toByteArray)
        }
      }
    }
  }

  /** Resize plumbing: metadata transform (target dims recorded, payload
    * passthrough — the pixel op lives in the stubbed kernel).
    */
  def withResizeTarget(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide) / greatest(col("width"), lit(1)),
      lit(maxSide) / greatest(col("height"), lit(1)),
      lit(1.0))
    df.withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling for video rows: every `stride`-th frame index, computed
    * as an array column (no row explosion until the consumer asks for it).
    */
  def withFrameSample(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("sampled_frames",
      when(col("kind") === "video" && col("n_frames").isNotNull,
        sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .otherwise(array().cast("array<int>")))

  /** Media tables must partition by payload size, not row count: target
    * `bytesPerPartition` so a 100 TB video table doesn't put 10k × 50 MB
    * rows in one task. Uses a cheap pre-agg of lengths (metadata-only scan).
    */
  def repartitionBySize(spark: SparkSession, df: DataFrame,
      bytesPerPartition: Long): DataFrame = {
    val totalBytes = df.agg(sum(coalesce(length(col("bytes")), lit(0))))
      .head().getLong(0)
    val parts = math.max(1, (totalBytes / bytesPerPartition).toInt)
    df.repartition(parts)
  }
}
