package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side schema, partitioning, and batch shape
  * are real; the actual codec step is STUBBED (this container ships no
  * image/audio libraries) with a deterministic fake so pipelines are testable
  * end-to-end.
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Cheap scan-time metadata over the opaque payload — real operations
    * (byte length, checksum, content hash), no decode needed. */
  def describe(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("n_bytes", length(col(payloadCol)))
      .withColumn("crc", crc32(col(payloadCol)))
      .withColumn("content_hash", sha1(col(payloadCol)))

  /** STUB decoder: derives deterministic fake features from the payload bytes
    * — feature i = (md5 hex digits [3i, 3i+3) of the payload, as an int,
    * mod 1000) / 1000, so the fake is reproducible by any engine with md5
    * (dim ≤ 10 fits the 32 hex digits). In production this body is replaced
    * by an actual codec call inside the same mapPartitions shape (one
    * connection/codec per partition, batched rows) — the distribution
    * contract is what matters here. */
  def decodeFeatures(spark: SparkSession, df: DataFrame, dim: Int = 8): DataFrame = {
    require(dim <= 10, s"stub decoder derives dim<=10 features from md5, got $dim")
    val outSchema = df.schema
      .add("features", ArrayType(FloatType))
      .add("decode_ok", BooleanType)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition "codec" init happens here (stubbed): one digest instance
      // per partition, reused across the batch — the real-codec lifecycle
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val feats: Array[Float] =
          if (payload == null) Array.fill(dim)(0f)
          else {
            digest.reset()
            val hex = digest.digest(payload).map("%02x".format(_)).mkString
            Array.tabulate(dim)(i =>
              (Integer.parseInt(hex.substring(i * 3, i * 3 + 3), 16) % 1000) / 1000f)
          }
        Row.fromSeq(r.toSeq :+ feats.toSeq :+ (payload != null))
      }
    }(encoder)
  }

  /** Frame sampling for video-ish payloads: slice the byte stream at fixed
    * strides (real `substring`-on-binary operations; stand-in for keyframe
    * extraction). */
  def sampleFrames(df: DataFrame, payloadCol: String = "payload",
                   frameBytes: Int = 64, maxFrames: Int = 4): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0), least(
          (length(col(payloadCol)) / frameBytes).cast("int"), lit(maxFrames - 1)))))
      .withColumn("frame",
        expr(s"substring($payloadCol, frame_idx * $frameBytes + 1, $frameBytes)"))
      .where(length(col("frame")) > 0)
}
