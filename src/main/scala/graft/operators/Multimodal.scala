package graft.operators

import graft.QuerySpec
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.11): image/audio/video
  * payloads travel as opaque `binary` columns + a typed metadata struct;
  * Parquet stores both natively, so partitioning/pruning work unchanged.
  *
  * The actual media decode is STUBBED (no codec libs in this
  * environment): [[decodeStub]] emits deterministic fake features with
  * the real distributed shape — per-partition batched processing via
  * `mapPartitions`, the Scala analogue of `mapInPandas` batch UDFs. The
  * Spark-side contract (schema, batching, partition parallelism) is real
  * and tested in MultimodalSpec.
  */
object Multimodal {

  /** Canonical multimodal record schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("meta", MapType(StringType, StringType))))

  /** Build a media table from documents (text bytes standing in for an
    * opaque payload — same plumbing as image/audio bytes).
    */
  def fromDocuments(docs: DataFrame): DataFrame = docs.select(
    col("doc_id").as("media_id"),
    col("text").cast("binary").as("payload"),
    concat(lit("text/plain;lang="), col("lang")).as("mime"),
    map(lit("source"), col("source"), lit("n_chars"), col("n_chars").cast("string")).as("meta"))

  /** Feature-extraction output schema (what a real image/audio decoder
    * would emit: fixed-size feature vector + dimensions).
    */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decoder: deterministic fake features (byte histogram over 8
    * buckets, L1-normalized). A real deployment swaps the body for the
    * codec call; the `mapPartitions` batching shape — one decoder init
    * per partition, streamed rows — is the part that matters at scale.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      // [decoder init would happen here, once per partition]
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Float](8)
        bytes.foreach(b => hist((b & 0xff) / 32) += 1f)
        val n = bytes.length.max(1)
        Row(id, bytes.length, hist.map(_ / n).toSeq)
      }
    }(enc)
  }

  /** Frame-sampling output schema (what a video frame-sampler emits). */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType)))

  /** STUB frame sampler: treats the payload as fixed-size frames and
    * emits every `stride`-th one — the video-pipeline shape (decode →
    * frame-sample) with a byte-chunking stand-in for the codec. One row
    * in, many rows out, per-partition streaming: the same
    * `mapPartitions` batching as [[decodeStub]], but a flatMap.
    */
  def sampleFramesStub(media: DataFrame, frameBytes: Int = 64,
                       stride: Int = 4): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val nFrames = math.max(1, bytes.length / frameBytes)
        (0 until nFrames by stride).iterator.map { i =>
          val from = i * frameBytes
          val until = math.min(bytes.length, from + frameBytes)
          Row(id, i, java.util.Arrays.copyOfRange(bytes, from, until))
        }
      }
    }(enc)
  }

  /** SQL-checkable metadata surface over the binary payloads. */
  val qMultimodalMeta: QuerySpec = QuerySpec(
    "q_multimodal_meta",
    Some("""SELECT doc_id AS media_id,
      octet_length(encode(text)) AS n_bytes,
      md5(text) AS payload_md5,
      'text/plain;lang=' || lang AS mime
      FROM documents ORDER BY media_id"""),
    (spark, dir) => {
      fromDocuments(Tables.load(spark, dir, "documents"))
        .select(col("media_id"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          col("mime"))
        .orderBy("media_id")
    })

  def specs: Seq[QuerySpec] = Seq(qMultimodalMeta)
}
