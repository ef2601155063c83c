package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata, plus the decode /
  * feature-extract / resize / frame-sample plumbing.
  *
  * The media codecs themselves are NOT in this container, so the decode
  * kernels are STUBBED with a deterministic fake (clearly marked below).
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

  /** ========================= STUB =========================
    * Deterministic fake decode: a real implementation binds an image/audio
    * codec (e.g. via JNI) here and returns pixel/waveform-derived features.
    * The fake derives a reproducible feature vector from a rolling hash of
    * the payload so tests can assert exact values end-to-end. Everything
    * outside this function is production-shaped.
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
      .head.getLong(0)
    val parts = math.max(1, (totalBytes / bytesPerPartition).toInt)
    df.repartition(parts)
  }
}
