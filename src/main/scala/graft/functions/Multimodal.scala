package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in batch per partition.
  *
  * The decode kernel itself is STUBBED (no image/audio codecs in this
  * environment — see `decodeStub`): it produces a deterministic fake
  * feature vector from the bytes. Everything around it — schema, batch
  * shape, partition-wise execution, frame sampling — is the real
  * 100 TB-scale plumbing: payloads never leave executors, decoding is
  * one pass per partition, and metadata lives in a typed struct column
  * so planners can prune it independently of the payload.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("data", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Build a media table from any (id, text) source: payload = UTF-8
    * bytes, metadata derived deterministically. Stands in for real
    * image/audio ingestion; the column shapes are the contract. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(payloadCol), "UTF-8").as("data"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")),
          (pmod(col(idCol), lit(4)) + 1).cast("int")).as("format"),
        (pmod(col(idCol), lit(64)) + 16).cast("int").as("width"),
        (pmod(col(idCol), lit(48)) + 16).cast("int").as("height"),
        (pmod(col(idCol), lit(30)) + 1).cast("int").as("n_frames")).as("meta"))

  /** STUB decode kernel — deterministic fake "pixel decode": a 16-bin
    * byte histogram normalized to [0,1]. A real deployment swaps exactly
    * this function for a codec call; the mapPartitions batch shape, row
    * encoder, and output schema stay identical. */
  private[graft] def decodeBytesStub(data: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < data.length) { bins((data(i) & 0xff) >> 4) += 1f; i += 1 }
    val n = math.max(data.length, 1).toFloat
    var j = 0
    while (j < 16) { bins(j) /= n; j += 1 }
    bins
  }

  /** Partition-wise decode + feature extraction: one iterator pass per
    * partition (the Scala twin of a pandas-batched UDF) producing
    * (media_id, format, features). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("data"), col("meta.format").as("fmt"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getAs[Long]("media_id"), r.getAs[String]("fmt"),
            decodeBytesStub(r.getAs[Array[Byte]]("data")))
        }
      }(enc)
  }

  /** Frame sampling for "video" payloads: every `stride`-th frame index
    * from the metadata — pure column math, no payload touch (planner can
    * satisfy it from the meta struct alone). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"), col("meta.n_frames").as("n_frames"),
      sequence(lit(0), col("meta.n_frames") - 1, lit(stride)).as("frame_ids"))
}
