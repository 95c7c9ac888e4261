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
    * plumbing, stubbed codec), features out, plus the resize planning step
    * (fit into a 256px box, integer math — the metadata half of a resize;
    * the pixel transform itself belongs to the stubbed codec). The oracle
    * reproduces the byte arithmetic in SQL, proving payload bytes survive
    * the binary column + typed-Dataset round trip exactly.
    */
  def m2MediaDecode(spark: SparkSession, sfDir: String): DataFrame =
    resizePlan(decodeFeatures(
      asMediaTable(RelationalQueries.table(spark, sfDir, "documents"),
        "doc_id", "text"),
      FakeDecoder).toDF(), maxDim = 256)

  /** Resize planning: scale (width, height) to fit `maxDim` preserving
    * aspect ratio, integer arithmetic only (floor, min 1px). Pure column
    * math — at scale this decides per asset whether the (expensive) decode
    * stage needs to produce a downscaled surface at all.
    */
  def resizePlan(features: DataFrame, maxDim: Int): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val needs = longest > maxDim
    // floor of a double quotient of small ints is exact in both engines
    // (the quotient is never within an ulp of a non-attained integer)
    def scaled(c: org.apache.spark.sql.Column) =
      when(needs, greatest(lit(1), floor(c * maxDim / longest)))
        .otherwise(c).cast("int")
    features
      .withColumn("resize_w", scaled(col("width")))
      .withColumn("resize_h", scaled(col("height")))
  }

  /** One sampled frame: an 8-byte window of the payload at a stride-derived
    * offset, with its hex image and a positional checksum.
    */
  final case class Frame(
      doc_id: Long,
      frame_idx: Int,
      frame_off: Int,
      frame_hex: String,
      checksum: Long)

  /** m3 gate query: frame sampling — the video-pipeline shape of the
    * multimodal path. Up to 4 evenly-strided 8-byte "frames" per payload
    * are cut per-partition (`mapPartitions`, the same slot a real
    * keyframe extractor occupies); the oracle re-derives every byte from
    * the hex of the payload, so offsets, windowing, and byte identity are
    * all proven. The checksum weights each byte by its 1-based position —
    * plain integer math both engines share.
    */
  def m3FrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    val media = asMediaTable(
      RelationalQueries.table(spark, sfDir, "documents"), "doc_id", "text")
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val n = payload.length
          val stride = math.max(n / 4, 1)
          (0 until 4).iterator
            .map(i => (i, i * stride))
            .takeWhile { case (_, off) => off < n }
            .map { case (i, off) =>
              val frame = payload.slice(off, math.min(off + 8, n))
              val hex = frame.map(b => f"${b & 0xff}%02X").mkString
              val checksum = frame.zipWithIndex
                .map { case (b, j) => (b & 0xff).toLong * (j + 1) }.sum
              Frame(id, i, off, hex, checksum)
            }
        }
      }.toDF()
  }
}
