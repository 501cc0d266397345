package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs.
  *
  * The decode step is a clearly-marked STUB (`decodeImageMetaStub`): this
  * container carries no image/audio codecs, so the stub derives
  * deterministic fake metadata from the byte stream (length + leading
  * bytes). Everything around it — schema, batch shape, partition-parallel
  * application, metadata pruning — is real: swap `decodeImageMetaStub` for a
  * codec-backed `mapPartitions` (one codec instance per partition, batched
  * I/O) in production without touching callers.
  */
object Multimodal {

  val imageMetaType: StructType = StructType(Seq(
    StructField("byte_size", LongType),
    StructField("magic", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)
  ))

  /** STUB decoder: deterministic metadata from byte length and the first
    * byte. A real implementation decodes headers (PNG/JPEG/WAV…) inside
    * `mapPartitions` with a per-partition codec. */
  def decodeImageMetaStub(bin: Column): Column = {
    val size = length(bin).cast("long")
    val firstByteHex = upper(hex(substring(bin, 1, 1)))
    struct(
      size.as("byte_size"),
      firstByteHex.as("magic"),
      (pmod(size, lit(640)) + 1).cast("int").as("width"),
      (pmod(size, lit(480)) + 1).cast("int").as("height"),
      (pmod(size, lit(24)) + 1).cast("int").as("n_frames")
    )
  }

  /** Attach decoded metadata to a binary payload column. */
  def withImageMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("image_meta", decodeImageMetaStub(col(binCol)))

  /** Frame-sampling plan for video-ish payloads: one row per sampled frame
    * index (every `stride`-th frame). The explode is the real distributed
    * shape; the per-frame decode is the same stub boundary. */
  def sampleFrames(df: DataFrame, binCol: String, stride: Int): DataFrame =
    withImageMeta(df, binCol)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("image_meta.n_frames") - 1, lit(stride))))
}
