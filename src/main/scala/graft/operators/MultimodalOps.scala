package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus a partition-batched decode/feature-extract operator.
  *
  * The Spark-side plumbing (schema, batching, partitioning, output shape) is
  * real and tested; the codec itself is pluggable. This container has no
  * image/audio libraries, so [[FakeDecoder]] is a clearly-marked
  * deterministic stand-in — swap in a real JNI/library decoder (or a Python
  * `mapInPandas` stage on a PySpark cluster) without touching the pipeline.
  *
  * Scale notes: decode runs per-partition with one decoder instance per task
  * (`mapPartitions`, not a per-row UDF) — amortizes codec init, keeps memory
  * bounded to a partition's batch, parallelism = input splits. Payloads never
  * shuffle: feature extraction happens before any wide operator, and only
  * the (small) feature struct flows downstream.
  */
object MultimodalOps {

  /** Feature record produced by a media decoder. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int,
      channels: Int)

  /** A media decoder: bytes -> features. Implementations must be
    * serializable (constructed once per task).
    */
  trait Decoder extends Serializable {
    def decode(docId: Long, payload: Array[Byte]): MediaFeatures
  }

  /** STUB — deterministic fake decoder (no media libs in this environment).
    * A real implementation would parse the container format here; the fake
    * derives stable pseudo-dimensions from the payload bytes so tests and
    * oracles are reproducible.
    */
  object FakeDecoder extends Decoder {
    def decode(docId: Long, payload: Array[Byte]): MediaFeatures = {
      val n = payload.length
      val b0 = if (n > 0) payload(0) & 0xff else 0
      val b1 = if (n > 1) payload(1) & 0xff else 0
      MediaFeatures(docId, n,
        format = if (n % 2 == 0) "img/fake-a" else "img/fake-b",
        width = 16 + (b0 % 64) * 16,
        height = 16 + (b1 % 64) * 16,
        channels = 1 + (n % 3))
    }
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("media_type", StringType)))

  /** Wrap a text table as a binary media table (the ingestion shape a real
    * multimodal dataset arrives in: id + opaque payload + declared type).
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("media"),
      lit("application/octet-stream").as("media_type"))

  /** Partition-batched decode: one [[Decoder]] per task, iterator-to-iterator
    * (no per-partition materialization), returns the typed feature frame.
    */
  def decodeFeatures(media: DataFrame, decoder: Decoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // decoder init happens here, once per task, in a real codec
        rows.map { case (id, payload) => decoder.decode(id, payload) }
      }
  }

  /** m2 gate query: the whole multimodal path — documents wrapped as binary
    * media, decoded per-partition via [[FakeDecoder]] (real `mapPartitions`
    * plumbing, stubbed codec), features out. The oracle reproduces the
    * fake's byte arithmetic in SQL, proving payload bytes survive the
    * binary column + typed-Dataset round trip exactly.
    */
  def m2MediaDecode(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeatures(
      asMediaTable(RelationalQueries.table(spark, sfDir, "documents"),
        "doc_id", "text"),
      FakeDecoder).toDF()
}
