package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads as opaque `binary` columns + typed metadata, processed
  * in batched per-partition passes.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * container): `fakeDecodeImage` is a deterministic stand-in that derives
  * "pixel" features from the bytes. Everything AROUND the decode — schema,
  * batch shape, per-partition iteration (the Scala analog of a Pandas-UDF
  * `mapInPandas` batch loop), partition sizing, and the feature schema —
  * is real and tested; swapping in a real codec is a one-function change.
  */
object Multimodal {

  /** media record schema: opaque payload + typed metadata */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true)))

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      payload_md5: String,
      mean_byte: Double,
      frames_sampled: Int)

  /** STUB decode: deterministic features from the raw bytes. A real
    * implementation would decode pixels/samples here; the Spark-side
    * contract (one batched pass per partition, bounded memory, typed
    * output) is identical. */
  def fakeDecodeImage(payload: Array[Byte], frameStride: Int): (Double, Int) = {
    var sum = 0L
    var i = 0
    var frames = 0
    while (i < payload.length) {
      sum += (payload(i) & 0xff)
      if (i % math.max(frameStride, 1) == 0) frames += 1
      i += 1
    }
    val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    (mean, frames)
  }

  /** Batched feature extraction: mapPartitions so per-row setup cost (a
    * real codec's context) is paid once per partition, mirroring
    * `mapInPandas` batch semantics. */
  def extractFeatures(media: DataFrame, frameStride: Int = 1024): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init (codec context would go here, once)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, kind, payload) =>
          md.reset()
          val hash = md.digest(payload).map("%02x".format(_)).mkString
          val (mean, frames) = fakeDecodeImage(payload, frameStride)
          MediaFeatures(id, kind, payload.length, hash, mean, frames)
        }
      }
  }

  /** synthesize a media table from any text column (payload = UTF-8
    * bytes) — deterministic test/bench input. */
  def synthesizeFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit(64).as("width"), lit(64).as("height"),
      lit(16000).as("sample_rate"))
}
