package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video ride along as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run as partition-local batch transforms.
  *
  * The media codec libraries are NOT present in this container, so the
  * decode kernel is a clearly-marked STUB (deterministic fake derived
  * from the bytes). Everything around it — schema, batching, partition
  * sizing, null passthrough — is real and tested; swapping in a real
  * codec is a one-function change.
  *
  * Scale design: `mapPartitions` keeps the decode batched per partition
  * (one codec init per partition, not per row); media tables should be
  * written with small `maxPartitionBytes` because rows are megabytes —
  * the planner knob, not the operator, controls memory.
  */
object Multimodal {

  /** Typed metadata carried beside every media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // jpeg | png | wav | mp4 ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", mediaMetaSchema)))

  /** Decoded-feature row produced by the extract kernel. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("feature", ArrayType(FloatType)),
    StructField("decode_ok", BooleanType)))

  /** Pluggable decode kernel: bytes → fixed-width feature vector.
    * Production binds a real codec here. */
  trait DecodeKernel extends Serializable {
    def decode(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB decode — deterministic fake: folds the bytes into `dim`
    * buckets and normalizes. Stands in for image decode/resize or audio
    * frame extraction; keeps the full pipeline runnable and testable
    * without codec libraries. */
  object StubKernel extends DecodeKernel {
    def decode(bytes: Array[Byte], dim: Int): Array[Float] = {
      val acc = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        acc(i % dim) += (bytes(i) & 0xFF) / 255.0f
        i += 1
      }
      acc
    }
  }

  /** Batched feature extraction over media rows. Partition-local: the
    * kernel is instantiated once per partition; rows with null content
    * produce `decode_ok = false` instead of failing the task. */
  def extractFeatures(media: DataFrame, dim: Int = 64,
                      kernel: DecodeKernel = StubKernel): DataFrame = {
    val spark = media.sparkSession
    val enc = Encoders.row(featureSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          if (bytes == null) Row(id, null, false)
          else Row(id, kernel.decode(bytes, dim).toSeq, true)
        }
      }(enc)
  }

  /** Frame-sampling plumbing for video: emit every `stride`-th frame
    * index up to `maxFrames` with a per-frame pseudo-feature. The frame
    * DECODE is the stub; the explode shape (one row per sampled frame,
    * co-partitioned by media_id) is the real contract. */
  def sampleFrames(media: DataFrame, stride: Int = 10, maxFrames: Int = 8): DataFrame =
    media
      .withColumn("n_frames",
        greatest(least((col("meta.duration_ms") / lit(1000L * stride)).cast("int"),
          lit(maxFrames)), lit(0)))
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames"))).as("frame_idx"))
      .withColumn("frame_key", concat(col("media_id"), lit("#"), col("frame_idx")))
}
