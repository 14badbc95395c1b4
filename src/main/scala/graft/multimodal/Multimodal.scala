package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline: image/audio/
  * video payloads ride as opaque `binary` columns beside typed metadata;
  * decode / feature-extract run as partition-batched transforms
  * (`mapPartitions` — the Scala analog of `mapInPandas` batching).
  *
  * The actual codec step is STUBBED with a deterministic fake (this
  * container ships no image/audio libraries — see the build brief): the
  * "decoder" derives width/height/channels/luma from the payload bytes via
  * FNV-1a, so the Spark-side plumbing — schema, batch shape, partitioning,
  * null handling — is real and tested while the codec is swappable.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image|audio|video
    StructField("payload", BinaryType, nullable = true), // opaque encoded bytes
    StructField("meta_source", StringType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** FNV-1a 64-bit over payload bytes — the deterministic stand-in for a
    * real decode. A production build replaces [[decodeOne]]'s body with the
    * actual codec call; everything around it stays. */
  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  private def decodeOne(mediaId: Long, kind: String, payload: Array[Byte]): Row = {
    val h = fnv1a(payload)
    def field(shift: Int, mod: Int, off: Int) =
      (((h >>> shift) & 0xffffL) % mod).toInt + off
    val width = field(0, 1920, 16)
    val height = field(16, 1080, 16)
    val channels = if (kind == "audio") 1 else 3
    val luma = ((h >>> 32) & 0xffffffL).toDouble / 0xffffffL.toDouble * 255.0
    val features = Array.tabulate(8)(i =>
      (((h >>> (i * 7)) & 0x3ffL).toDouble / 1024.0) * 2.0 - 1.0)
    Row(mediaId, kind, payload.length, width, height, channels, luma,
      features.toSeq)
  }

  /** Batched decode/feature-extract. Rows with null payloads are dropped
    * (mirroring nodata-pixel normalization). Runs once per partition —
    * codec initialization cost is amortized per-batch, the reason this is
    * mapPartitions and not a per-row UDF. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.select("media_id", "kind", "payload").mapPartitions { it =>
      // per-partition codec setup would go here
      it.flatMap { r =>
        Option(r.getAs[Array[Byte]]("payload")).map(p =>
          decodeOne(r.getAs[Long]("media_id"), r.getAs[String]("kind"), p))
      }
    }(enc)
  }

  /** Synthetic media table derived from `documents` (text bytes as the
    * opaque payload) — exercises the pipeline without real codecs. */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source").as("meta_source"))

  /** Frame-sample: pick every `stride`-th feature vector per media group —
    * the video-frame subsampling shape, pure relational. */
  def frameSample(features: DataFrame, stride: Int): DataFrame =
    features.filter(col("media_id") % stride === 0)
}
