package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/
  * audio/video payloads ride as opaque `binary` columns with typed
  * metadata; decode / feature-extraction / frame-sampling run as
  * partition-local batch transforms.
  *
  * The Spark-side plumbing here (schema, partitioning, batched
  * `mapPartitions` signature, row explosion for frames) is real and
  * tested. The actual byte decoding is a clearly-marked STUB
  * (`fakeDecode`): this container ships no image/audio codecs, so the
  * stub derives a deterministic feature vector from the bytes —
  * swap `fakeDecode` for a JNI/javacv decoder without touching any
  * dataflow. (Python twin would be `mapInPandas`; in Scala the
  * idiomatic equivalent is typed `mapPartitions`, which batches per
  * partition and keeps the decoder's state/model loaded per-partition,
  * not per-row.)
  */
object Multimodal {

  case class MediaFeature(media_id: Long, dim: Int, feature: Array[Float])
  case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** Wrap a text corpus as a media table (payload = utf-8 bytes) —
    * the stand-in source for binary columns in this container. */
  def packMedia(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      lit("application/octet-stream").as("mime"),
      length(col(textCol)).cast("long").as("n_bytes"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decoder: a real implementation would decode the image/audio
    * payload and run a feature extractor. Deterministic fake: rolling
    * 64-bit hash of the bytes expanded into `dim` floats in [-1, 1).
    * Keeps the contract (bytes => fixed-dim float vector) honest. */
  private[ops] def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L // prime seed
    payload.foreach { b => h = h * 31 + (b & 0xFF) }
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L // LCG step
      out(i) = ((h >>> 24) & 0xFFFFFF).toFloat / (1 << 24).toFloat * 2f - 1f
      i += 1
    }
    out
  }

  /** Feature extraction: one decoder instance per partition (the
    * expensive model-load happens in the mapPartitions closure once,
    * not per row), batch shape = the partition iterator. */
  def extractFeatures(media: DataFrame, dim: Int): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // <- real decoder/model initialization would go here, once
        it.map { case (id, bytes) => MediaFeature(id, dim, fakeDecode(bytes, dim)) }
      }
  }

  /** Frame sampling: split the payload into `n` evenly-spaced byte
    * windows ("frames"); a real video path would seek keyframes. One
    * input row → n output rows (explode on the executor, no driver). */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int = 16): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes.isEmpty) Iterator.empty
        else (0 until n).iterator.map { f =>
          val start = math.min((bytes.length.toLong * f / n).toInt, math.max(0, bytes.length - 1))
          Frame(id, f, bytes.slice(start, math.min(start + frameBytes, bytes.length)))
        }
      }
  }

  /** Metadata + per-frame stats table: media_id, frame_no, n_bytes,
    * checksum — the relational face of the binary pipeline. */
  def frameStats(frames: Dataset[Frame]): DataFrame =
    frames.toDF()
      .select(col("media_id"), col("frame_no"),
        length(col("frame_bytes")).as("n_bytes"),
        crc32(col("frame_bytes")).as("checksum"))
}
