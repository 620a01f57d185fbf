package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to a typed metadata struct, and per-batch "decode"
  * stages run as `mapPartitions` over a typed Dataset (the Scala analogue of
  * `mapInPandas` batch UDFs — one iterator per partition, amortized setup).
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries): [[FakeCodec]] is a clearly-marked deterministic stand-in that
  * preserves the real contract — bytes in, fixed-width feature vector +
  * dimensions out — so the Spark-side schema, partitioning, batch shape and
  * tests are real and swap-in ready for a JNI/JavaCV codec.
  *
  * Scale notes: payload bytes never pass through a shuffle here — all
  * stages are narrow maps; metadata-only queries prune the binary column at
  * the parquet scan (columnar pruning makes `select(meta.*)` free even when
  * rows carry megabyte blobs).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),   // opaque payload
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true))), nullable = true)))

  final case class MediaRow(
      media_id: Long, modality: String, content: Array[Byte],
      mime: Option[String], width: Option[Int], height: Option[Int],
      duration_ms: Option[Long], sample_rate: Option[Int])

  final case class MediaFeatures(
      media_id: Long, modality: String, n_bytes: Int,
      width: Int, height: Int, features: Array[Float])

  /** ??? real codec goes here ??? — deterministic fake: "decodes" a payload
    * into dimensions derived from its length and a 16-dim feature vector
    * from a rolling byte hash. Same signature a real decoder would have.
    */
  object FakeCodec {
    val featureDim = 16
    def decode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      val n = if (bytes == null) 0 else bytes.length
      val w = 16 + (n % 64) // fake "width"
      val h = 16 + ((n / 64) % 64) // fake "height"
      val feats = new Array[Float](featureDim)
      var acc = 1469598103934665603L
      var i = 0
      while (i < n) {
        acc = acc * 1099511628211L + (bytes(i) & 0xff)
        feats(i % featureDim) += ((acc >>> 40) & 0xff).toFloat / 255f
        i += 1
      }
      (w, h, feats)
    }
  }

  /** Synthesize a deterministic media table from the `documents` fixture
    * (text bytes as the fake payload) — exercises the exact schema and
    * column shapes a real ingest would produce.
    */
  def synthesizeFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        (length(col("text")) * 10L).as("duration_ms"),
        lit(16000).as("sample_rate")).as("meta"))

  /** Batch feature extraction: one decoder instantiation per partition,
    * iterator-to-iterator (never materializes a partition) — the
    * `mapInPandas` shape, minus pandas.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(
        col("media_id"), col("modality"), col("content"),
        col("meta.mime"), col("meta.width"), col("meta.height"),
        col("meta.duration_ms"), col("meta.sample_rate"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition codec setup would happen here
        rows.map { r =>
          val (w, h, f) = FakeCodec.decode(r.content)
          MediaFeatures(r.media_id, r.modality, Option(r.content).map(_.length).getOrElse(0), w, h, f)
        }
      }
  }

  final case class ResizedMedia(
      media_id: Long, modality: String, content: Array[Byte],
      width: Int, height: Int)

  /** Batch resize for image rows: same iterator-per-partition shape as
    * [[extractFeatures]]. The pixel work is the stubbed codec (??? real
    * resampler goes here ???) — deterministic: payload truncated/padded to
    * w·h bytes — but the contract is real: binary in, binary out, new
    * dimensions in the metadata, nothing shuffled.
    */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.filter(col("modality") === "image")
      .select(col("media_id"), col("modality"), col("content"),
        col("meta.mime"), col("meta.width"), col("meta.height"),
        col("meta.duration_ms"), col("meta.sample_rate"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val src = Option(r.content).getOrElse(Array.emptyByteArray)
          val out = java.util.Arrays.copyOf(src, w * h)
          ResizedMedia(r.media_id, r.modality, out, w, h)
        }
      }
  }

  /** Frame-sample timestamps for video rows from metadata only — pure
    * column math, binary column untouched (and pruned at scan).
    */
  def frameSampleTimestamps(media: DataFrame, fps: Double = 1.0): DataFrame =
    media.filter(col("modality") === "video")
      .select(
        col("media_id"),
        col("meta.duration_ms").as("duration_ms"),
        sequence(lit(0L), col("meta.duration_ms"),
          lit(math.max(1L, (1000 / fps).toLong))).as("frame_ts_ms"))

  /** Metadata-only projection — demonstrates binary-column pruning. */
  def metadataOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("modality"),
      col("meta.duration_ms").as("duration_ms"), col("meta.sample_rate").as("sample_rate"))
}
