package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Multimodal columns: image/audio/video payloads ride through the
  * pipeline as opaque BINARY columns plus a typed metadata struct — the
  * layout that scales, because Spark never interprets the bytes until an
  * explicit decode stage, and columnar parquet keeps the metadata
  * scannable without touching the blobs.
  *
  * Codec-touching steps (decode/resize/frame-sample) run per-partition in
  * `mapPartitions` so a real implementation can amortize codec/model
  * initialization per partition (the Scala analogue of a batched Pandas
  * UDF). The image/audio libraries are not available in this offline
  * container, so `fakeDecode` below is a clearly-marked DETERMINISTIC
  * STUB — the Spark-side plumbing (schema, batch shape, partitioning,
  * output contract) is real and tested; swap `fakeDecode` for a codec
  * call to productionize.
  */
object Multimodal {

  /** media(id, kind, meta{width,height,duration_ms,format}, payload). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", IntegerType),
      StructField("format", StringType)))),
    StructField("payload", BinaryType)))

  final case class MediaFeature(
      media_id: Long, kind: String, n_bytes: Long, features: Array[Float])

  /** STUB decode: deterministic features derived from the payload bytes.
    * Stands in for image-decode → embed; same signature and cost shape
    * (reads every byte once), so the pipeline around it is honest. */
  private[multimodal] def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h ^= payload(i); h *= 0x100000001b3L
      out(math.abs((h % dim).toInt)) += 1.0f
      i += 1
    }
    val n = math.max(1, payload.length)
    var j = 0
    while (j < dim) { out(j) /= n; j += 1 }
    out
  }

  /** Feature extraction over the binary column: per-partition batches so
    * codec/model init would amortize. Returns a typed Dataset. */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: initialize the decoder/model ONCE here
        rows.map { case (id, kind, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          MediaFeature(id, kind, bytes.length.toLong, fakeDecode(bytes, dim))
        }
      }
  }

  /** Metadata-only pruning: filters/projections on `meta` never touch the
    * blobs (columnar parquet reads just the meta pages). */
  def filterByMeta(media: DataFrame, minWidth: Int): DataFrame =
    media.filter(col("kind") === "image" && col("meta.width") >= minWidth)
      .select("media_id", "meta")

  /** Frame sampling STUB for video rows: emits every k-th "frame index"
    * up to a cap, as (media_id, frame_idx, frame_feature). The real
    * decoder would seek; the plumbing (explode-shaped fan-out bounded by
    * a cap, never unbounded) is the part that matters at scale. */
  def sampleFrames(media: DataFrame, everyK: Int, cap: Int, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select("media_id", "meta.duration_ms", "payload")
      .as[(Long, Option[Int], Array[Byte])]
      .flatMap { case (id, durMs, payload) =>
        val nFrames = math.min(cap, durMs.getOrElse(0) / 1000 / everyK)
        (0 until nFrames).map { f =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          (id, f, fakeDecode(bytes ++ Array(f.toByte), dim))
        }
      }
      .toDF("media_id", "frame_idx", "frame_feature")
  }

  /** Synthetic media fixture (deterministic) for tests/demos. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val payload = Array.tabulate[Byte](64 + i % 64)(b => ((b * (i + 7)) % 127).toByte)
      Row(i.toLong, kind,
        Row(640 + i % 7 * 160, 480 + i % 5 * 120, 1000 * (30 + i % 90), "synthetic"),
        payload)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), mediaSchema)
  }
}
