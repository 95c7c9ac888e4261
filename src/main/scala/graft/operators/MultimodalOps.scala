package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus a partition-batched decode/feature-extract operator.
  *
  * The Spark-side plumbing (schema, batching, partitioning, output shape) is
  * real and tested; the codec is pluggable. Three tiers exist: [[FakeDecoder]]
  * (clearly-marked deterministic stand-in, kept for the m2 contract),
  * [[HeaderDecoder]] (real pure-JVM BMP/RIFF container parsing), and the m6/m7
  * pixel paths — m6 decodes BMP pixel arrays by hand, m7 round-trips genuine
  * zlib-compressed PNGs through `javax.imageio` (ships with the JDK; no
  * external library). A JNI/library codec for formats the JDK lacks (JPEG
  * works the same way; video needs ffmpeg) slots in without touching the
  * pipeline.
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

  /** REAL pure-JVM container decoder for two public formats whose headers
    * are deterministic integer math — no native libs needed:
    *
    *  - BMP (`BM` magic + BITMAPINFOHEADER): width/height are signed int32
    *    little-endian at offsets 18/22 (negative height = top-down row
    *    order, reported as magnitude), bits-per-pixel uint16 at 28 →
    *    channels = bits/8.
    *  - WAV (RIFF container, `WAVE` form): chunks are scanned from offset
    *    12 — id (4 ASCII bytes) + uint32-LE size, word-aligned — until the
    *    `fmt ` chunk, whose uint16 channel count, uint32 sample rate and
    *    uint16 bits-per-sample are read. A leading JUNK/LIST chunk is
    *    skipped like any real RIFF reader must.
    *
    * [[MediaFeatures]] is fixed-shape across modalities, so for audio the
    * width/height slots carry sample_rate/bits_per_sample (documented
    * contract, same shape the m1/m2 consumers already handle).
    *
    * Unrecognized payloads throw `IllegalArgumentException` — a corrupt
    * asset must fail the task loudly, not flow downstream as zeros.
    */
  object HeaderDecoder extends Decoder {
    private def u16le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def i32le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    def decode(docId: Long, payload: Array[Byte]): MediaFeatures = {
      if (payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M') {
        val width = i32le(payload, 18)
        val height = i32le(payload, 22)
        val bits = u16le(payload, 28)
        MediaFeatures(docId, payload.length, "image/bmp",
          width, math.abs(height), bits / 8)
      } else if (payload.length >= 12 && tag(payload, 0) == "RIFF" &&
          tag(payload, 8) == "WAVE") {
        var off = 12
        while (off + 8 <= payload.length) {
          val id = tag(payload, off)
          val size = i32le(payload, off + 4)
          // Validate EVERY chunk's claimed size before trusting it: a
          // negative or oversized size would step the walk backwards (an
          // infinite loop) or silently skip later chunks instead of
          // failing cleanly on the malformed byte.
          require(size >= 0 && off + 8 + size <= payload.length,
            s"doc $docId: RIFF chunk '$id' claims $size bytes past payload end")
          if (id == "fmt " && off + 8 + 16 <= payload.length) {
            val channels = u16le(payload, off + 10)
            val rate = i32le(payload, off + 12)
            val bits = u16le(payload, off + 22)
            return MediaFeatures(docId, payload.length, "audio/wav",
              rate, bits, channels)
          }
          off += 8 + size + (size & 1) // RIFF chunks are word-aligned
        }
        throw new IllegalArgumentException(
          s"doc $docId: RIFF/WAVE payload has no fmt chunk")
      } else throw new IllegalArgumentException(
        s"doc $docId: unrecognized container (${payload.length} bytes)")
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

  /** Assemble a minimal-but-valid BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER (24bpp, uncompressed) + 4 dummy pixel bytes. Every
    * multi-byte field is genuinely little-endian — [[HeaderDecoder]] reads
    * these bytes the way it would read a camera's output, not a lookup.
    */
  private[operators] def syntheticBmp(width: Int, height: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(58)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(58).putShort(0).putShort(0).putInt(54) // size, reserved, data offset
    buf.putInt(40).putInt(width).putInt(height)       // DIB size, dims
    buf.putShort(1).putShort(24)                      // planes, bits/pixel
    buf.putInt(0).putInt(4)                           // compression, image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0) // ppm, palette
    buf.putInt(0x00ffffff)                            // 4 dummy pixel bytes
    buf.array()
  }

  /** Assemble a valid RIFF/WAVE: optional leading word-aligned JUNK chunk
    * (real WAV files carry those; the decoder must scan past), canonical
    * 16-byte `fmt ` chunk, `data` chunk with `extra` payload bytes.
    */
  private[operators] def syntheticWav(channels: Int, sampleRate: Int,
      bitsPerSample: Int, extra: Int, junk: Boolean): Array[Byte] = {
    val junkLen = if (junk) 14 else 0 // "JUNK" + size + 6 bytes, word-aligned
    val total = 44 + junkLen + extra
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
    buf.put("WAVE".getBytes("US-ASCII"))
    if (junk) {
      buf.put("JUNK".getBytes("US-ASCII")).putInt(6)
      buf.put(Array.fill[Byte](6)(0x6a))
    }
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1)                                   // PCM
    buf.putShort(channels.toShort).putInt(sampleRate)
    buf.putInt(sampleRate * channels * bitsPerSample / 8) // byte rate
    buf.putShort((channels * bitsPerSample / 8).toShort)  // block align
    buf.putShort(bitsPerSample.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(extra)
    (0 until extra).foreach(i => buf.put((i * 37).toByte))
    buf.array()
  }

  /** A 16-bit mono PCM WAV whose samples are the deterministic int16
    * sequence s(id,i) = ((id·31 + i·7919) mod 65536) − 32768, n = 16 +
    * id mod 17 samples, odd ids carrying a JUNK chunk before `fmt `.
    * The generative formula is what the m5 oracle restates — nothing else
    * connects fixture parameters to decoded samples, so hash equality
    * proves the byte-level decode (chunk walk, offset, endianness,
    * signedness).
    */
  private[operators] def syntheticPcmWav(id: Long): Array[Byte] = {
    val n = (16 + id % 17).toInt
    val junk = id % 2 == 1
    val junkLen = if (junk) 14 else 0
    val total = 44 + junkLen + 2 * n
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
    buf.put("WAVE".getBytes("US-ASCII"))
    if (junk) {
      buf.put("JUNK".getBytes("US-ASCII")).putInt(6)
      buf.put(Array.fill[Byte](6)(0x6a))
    }
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(1).putInt(8000)  // PCM, mono, 8 kHz
    buf.putInt(8000 * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(2 * n)
    (0 until n).foreach { i =>
      buf.putShort((((id * 31 + i.toLong * 7919) % 65536) - 32768).toShort)
    }
    buf.array()
  }

  /** Decode the PCM int16 samples of a RIFF/WAVE payload: chunk walk from
    * offset 12 (JUNK and any other non-`data` chunks skipped, word-aligned
    * like every real RIFF reader), then little-endian SIGNED 16-bit reads
    * over the `data` chunk. The byte-to-sample half of the audio path —
    * [[HeaderDecoder]] stops at the format header; this reads the signal.
    */
  private[operators] def pcmSamples(docId: Long, payload: Array[Byte]): Array[Int] = {
    require(payload.length >= 12 && tagOf(payload, 0) == "RIFF" &&
      tagOf(payload, 8) == "WAVE", s"doc $docId: not a RIFF/WAVE payload")
    var off = 12
    while (off + 8 <= payload.length) {
      val size = i32leOf(payload, off + 4)
      // Every chunk's size is validated before the walk advances on it — a
      // malformed preceding chunk must fail cleanly, not loop the walk or
      // skip the data chunk (same rule as HeaderDecoder's walk).
      require(size >= 0 && off + 8 + size <= payload.length,
        s"doc $docId: chunk '${tagOf(payload, off)}' claims $size bytes past payload end")
      if (tagOf(payload, off) == "data") {
        val n = size / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val lo = payload(off + 8 + 2 * i) & 0xff
          val hi = payload(off + 8 + 2 * i + 1)
          out(i) = (hi << 8) | lo // hi kept signed: LE int16
          i += 1
        }
        return out
      }
      off += 8 + size + (size & 1)
    }
    throw new IllegalArgumentException(s"doc $docId: no data chunk")
  }

  private def tagOf(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")
  private def i32leOf(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def u16leOf(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** A 24-bit uncompressed BMP with a REAL pixel array: w = 2 + id%6,
    * h = 1 + id%4, pixel (x, y) in IMAGE coordinates (y = 0 is the top
    * row) carries BGR channels
    *   B = (id + 3x + 7y) mod 256
    *   G = (2id + 5x + 11y) mod 256
    *   R = (3id + 13x + 17y) mod 256.
    * Every BMP storage quirk the decoder must survive is exercised by id
    * arithmetic: ids % 3 == 0 store TOP-DOWN (negative height), the rest
    * bottom-up; rows pad to 4-byte boundaries (w ∈ 2..7 hits every
    * padding); the pixel array starts at 54 + 4·(id%5), so a decoder
    * ignoring the data-offset field reads garbage for 4 of 5 ids.
    */
  private[operators] def syntheticPixelBmp(id: Long): Array[Byte] = {
    val w = (2 + id % 6).toInt
    val h = (1 + id % 4).toInt
    val topDown = id % 3 == 0
    val gap = (4 * (id % 5)).toInt
    val stride = (3 * w + 3) & ~3
    val dataOffset = 54 + gap
    val buf = java.nio.ByteBuffer.allocate(dataOffset + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(dataOffset + stride * h).putShort(0).putShort(0).putInt(dataOffset)
    buf.putInt(40).putInt(w).putInt(if (topDown) -h else h)
    buf.putShort(1).putShort(24)
    buf.putInt(0).putInt(stride * h)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until gap).foreach(_ => buf.put(0x55.toByte))
    val storedRows = if (topDown) 0 until h else (h - 1) to 0 by -1
    for (y <- storedRows) {
      for (x <- 0 until w) {
        buf.put(((id + 3 * x + 7 * y) % 256).toByte)
        buf.put(((2 * id + 5 * x + 11 * y) % 256).toByte)
        buf.put(((3 * id + 13 * x + 17 * y) % 256).toByte)
      }
      (3 * w until stride).foreach(_ => buf.put(0.toByte))
    }
    buf.array()
  }

  /** Decode a 24bpp uncompressed BMP's PIXEL ARRAY to per-pixel luminance
    * in image order (top row first) — the de-stubbed pixel-level image op:
    * honors the header's data offset, signed height (negative = top-down
    * storage), and 4-byte row padding. Luminance is the all-integer
    * channel-asymmetric B + 2G + 4R, so a decoder that swaps BGR/RGB or
    * walks rows in the wrong order produces a different sum — the m6
    * oracle restates the generative formula in image coordinates and
    * nothing else ties fixture to output. Returns (width, height, lum).
    */
  private[operators] def bmpLuminance(docId: Long,
      payload: Array[Byte]): (Int, Int, Array[Int]) = {
    require(payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M',
      s"doc $docId: not a BMP payload")
    val dataOffset = i32leOf(payload, 10)
    val w = i32leOf(payload, 18)
    val hRaw = i32leOf(payload, 22)
    val bpp = u16leOf(payload, 28)
    val compression = i32leOf(payload, 30)
    require(bpp == 24 && compression == 0,
      s"doc $docId: unsupported BMP ($bpp bpp, compression $compression)")
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val stride = (3 * w + 3) & ~3
    require(w > 0 && h > 0 && dataOffset >= 54 &&
      dataOffset.toLong + stride.toLong * h <= payload.length,
      s"doc $docId: pixel array out of bounds (w=$w h=$h off=$dataOffset)")
    val lum = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val base = dataOffset + (if (topDown) y else h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val b = payload(base + 3 * x) & 0xff
        val g = payload(base + 3 * x + 1) & 0xff
        val r = payload(base + 3 * x + 2) & 0xff
        lum(y * w + x) = b + 2 * g + 4 * r
        x += 1
      }
      y += 1
    }
    (w, h, lum)
  }

  /** Deterministic REAL PNG fixture: the generative pixel field rendered
    * into a `BufferedImage` and encoded by `javax.imageio`'s pure-Java PNG
    * writer — a genuine zlib-compressed, chunked PNG container, not header
    * arithmetic. Coefficients differ from the BMP fixture's so m6/m7
    * results cannot be confused.
    */
  private[operators] def syntheticPng(id: Long): Array[Byte] = {
    val w = (3 + id % 5).toInt
    val h = (2 + id % 3).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = ((id + 5 * x + 3 * y) % 256).toInt
      val g = ((2 * id + 7 * x + 5 * y) % 256).toInt
      val b = ((3 * id + 11 * x + 13 * y) % 256).toInt
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", bos),
      s"doc $id: no PNG writer available")
    bos.toByteArray
  }

  /** Decode a PNG payload's pixels to per-pixel luminance in image order —
    * the real-codec counterpart of [[bmpLuminance]]: `javax.imageio`
    * inflates the IDAT stream, un-filters scanlines, and hands back the
    * raster; the channel-asymmetric B + 2G + 4R luminance then catches any
    * channel-order or row-order mistake against the oracle's generative
    * restatement. Magic-checked and null-checked so a corrupt payload
    * fails the task loudly.
    */
  private[operators] def pngLuminance(docId: Long,
      payload: Array[Byte]): (Int, Int, Array[Int]) = {
    require(payload.length >= 8 && (payload(0) & 0xff) == 0x89 &&
      payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G',
      s"doc $docId: not a PNG payload")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, s"doc $docId: PNG decode failed")
    val w = img.getWidth
    val h = img.getHeight
    val lum = new Array[Int](w * h)
    var i = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val r = (rgb >> 16) & 0xff
      val g = (rgb >> 8) & 0xff
      val b = rgb & 0xff
      lum(i) = b + 2 * g + 4 * r
      i += 1
    }
    (w, h, lum)
  }

  /** m7 gate query: REAL PNG DECODE — the m-family's last seam closed with
    * a real library codec: each document id renders to a genuine PNG
    * (zlib/IDAT, not header math), `javax.imageio` decodes it back, and
    * the same relational pixel-stats shape as m6 follows. Hash equality
    * with the oracle's generative restatement proves the ENCODE→DECODE
    * round trip reproduced every pixel — the codec is the only link
    * between fixture parameters and output.
    *
    * Scale shape: identical to m6 — fixture build + decode are one
    * partition-local `mapPartitions` pass (codec state per task, payloads
    * never shuffle), stats are partial-agg'd on the high-cardinality
    * doc_id key.
    */
  def m7PngStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    RelationalQueries.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, lum) = pngLuminance(id, syntheticPng(id))
        (id, w, h, lum)
      })
      .toDF("doc_id", "width", "height", "lum")
      .select(col("doc_id"), col("width"), col("height"),
        posexplode(col("lum")).as(Seq("i", "l")))
      .groupBy("doc_id", "width", "height")
      .agg(count(lit(1)).as("n_pixels"),
        sum(col("l").cast("long")).as("sum_lum"),
        max(col("l")).cast("long").as("max_lum"),
        sum(((floor(col("i") / col("width")) + 1) * col("l")).cast("long"))
          .as("ysum"))
  }

  /** Nearest-neighbor downsample of a decoded raster by an integer factor:
    * out(u, v) = in(factor·u, factor·v), out dims = ceil(dims / factor).
    * Operates on the per-pixel luminance plane — luminance is pointwise,
    * so resize∘luminance ≡ luminance∘resize and the oracle can restate
    * the result directly in source coordinates.
    */
  private[operators] def nnResize(lum: Array[Int], w: Int, h: Int,
      factor: Int): (Int, Int, Array[Int]) = {
    val ow = (w + factor - 1) / factor
    val oh = (h + factor - 1) / factor
    val out = new Array[Int](ow * oh)
    var i = 0
    for (v <- 0 until oh; u <- 0 until ow) {
      out(i) = lum((v * factor) * w + (u * factor))
      i += 1
    }
    (ow, oh, out)
  }

  /** m8 gate query: IMAGE RESIZE — the feature-extraction step every
    * multimodal training pipeline runs between decode and featurize
    * (thumbnail/patch normalization): each document's BMP payload decodes
    * to its pixel raster (m6's real decoder — data offset, signed height,
    * stride padding all honored) and is nearest-neighbor downsampled 2×
    * INSIDE the decode task, so only the resized plane is ever exploded —
    * at scale the relational layer sees ceil(w/2)·ceil(h/2) rows per
    * image, never the source pixels. The same relational stat shape as m6
    * then pins every resized pixel (count, sum, max, row-weighted sum in
    * RESIZED coordinates) plus both geometries; the oracle restates the
    * generative formula at the SAMPLED source coordinates (x=2u, y=2v) —
    * an off-by-one in the sampling grid, a row-order mistake, or ceil/
    * floor confusion in the output dims each flip the hash.
    *
    * Scale shape: decode + resize are one partition-local mapPartitions
    * pass (m2's contract — payloads never shuffle); the aggregate is
    * partial before its shuffle on the high-cardinality doc_id key, and
    * resize-first cuts the exploded row volume by the square of the
    * factor before anything pays per-pixel cost downstream.
    */
  def m8ResizeStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    RelationalQueries.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, lum) = bmpLuminance(id, syntheticPixelBmp(id))
        val (ow, oh, out) = nnResize(lum, w, h, 2)
        (id, w, h, ow, oh, out)
      })
      .toDF("doc_id", "width", "height", "out_w", "out_h", "lum")
      .select(col("doc_id"), col("width"), col("height"),
        col("out_w"), col("out_h"), posexplode(col("lum")).as(Seq("i", "l")))
      .groupBy("doc_id", "width", "height", "out_w", "out_h")
      .agg(count(lit(1)).as("n_pixels"),
        sum(col("l").cast("long")).as("sum_lum"),
        max(col("l")).cast("long").as("max_lum"),
        sum(((floor(col("i") / col("out_w")) + 1) * col("l")).cast("long"))
          .as("ysum"))
  }

  /** The m9 generative block value: gray level of 8×8 block (bx, by) of
    * document `id`'s JPEG fixture. Coefficients differ from the BMP/PNG
    * fixtures' so m6/m7/m9 results cannot be confused.
    */
  private[operators] def jpegBlockValue(id: Long, bx: Int, by: Int): Int =
    ((id * 37 + bx * 59 + by * 83) % 256).toInt

  /** Deterministic REAL JPEG fixture: an 8×8-BLOCK-CONSTANT GRAYSCALE
    * image encoded by `javax.imageio`'s JPEG writer at quality 1.0 — a
    * genuine DCT/Huffman JPEG container (SOI/DQT/SOS markers, entropy-
    * coded MCUs), engineered into the one corner of JPEG that round-trips
    * BIT-EXACTLY: every MCU is constant, so all 63 AC coefficients are
    * exactly zero and the DC coefficient is an exact integer quantized at
    * step 1 (quality 1.0's luma table), and grayscale removes chroma
    * subsampling from the equation entirely (the m-family's
    * "subsampling-aware" requirement — a chroma plane at 4:2:0 could
    * never hash-pin). Lossy-codec caveat made explicit: exactness is a
    * property of THIS fixture class, asserted per-document in the m9 spec
    * so a JRE codec change fails loudly rather than silently shifting
    * hashes.
    */
  private[operators] def syntheticJpeg(id: Long): Array[Byte] = {
    val bw = (1 + id % 3).toInt
    val bh = (1 + id % 2).toInt
    encodeGrayJpeg(8 * bw, 8 * bh, (x, y) => jpegBlockValue(id, x / 8, y / 8))
  }

  /** Encode one grayscale image through `javax.imageio`'s JPEG writer at
    * quality 1.0 — the shared encoder behind [[syntheticJpeg]] and the m10
    * MJPEG frames (same bit-exact round-trip argument: block-constant
    * grayscale input, all AC coefficients exactly zero).
    */
  private def encodeGrayJpeg(w: Int, h: Int,
      value: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, value(x, y))
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wr.dispose()
    ios.close()
    bos.toByteArray
  }

  /** Decode a JPEG payload's gray plane in image order — `javax.imageio`
    * Huffman-decodes the entropy stream, dequantizes, and runs the IDCT;
    * SOI-magic-checked and null-checked so a corrupt payload fails the
    * task loudly (the pngLuminance discipline).
    */
  private[operators] def jpegGray(docId: Long,
      payload: Array[Byte]): (Int, Int, Array[Int]) = {
    require(payload.length >= 2 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0xd8,
      s"doc $docId: not a JPEG payload (SOI missing)")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, s"doc $docId: JPEG decode failed")
    val w = img.getWidth
    val h = img.getHeight
    val g = new Array[Int](w * h)
    var i = 0
    for (y <- 0 until h; x <- 0 until w) {
      g(i) = img.getRaster.getSample(x, y, 0)
      i += 1
    }
    (w, h, g)
  }

  /** m9 gate query: REAL JPEG DECODE — the last common image container a
    * multimodal pipeline meets, closed with the m7 discipline: each
    * document id renders to a genuine JPEG (DCT + Huffman, not header
    * math), `javax.imageio` decodes it back, and the m6/m7 relational
    * stat shape follows (pixel census, gray sum/max, row-weighted sum
    * pinning row order). Hash equality with the oracle's generative block
    * formula proves the encode→decode round trip reproduced every pixel —
    * see [[syntheticJpeg]] for why this fixture class is exact under a
    * lossy codec.
    *
    * Scale shape: identical to m6/m7 — fixture build + decode are one
    * partition-local `mapPartitions` pass (codec state per task, payloads
    * never shuffle), stats partial-agg'd on the high-cardinality doc_id
    * key; what shuffles is 4 longs per image, never pixels.
    */
  def m9JpegBlockStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    RelationalQueries.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, g) = jpegGray(id, syntheticJpeg(id))
        (id, w, h, g)
      })
      .toDF("doc_id", "width", "height", "lum")
      .select(col("doc_id"), col("width"), col("height"),
        posexplode(col("lum")).as(Seq("i", "l")))
      .groupBy("doc_id", "width", "height")
      .agg(count(lit(1)).as("n_pixels"),
        sum(col("l").cast("long")).as("sum_lum"),
        max(col("l")).cast("long").as("max_lum"),
        sum(((floor(col("i") / col("width")) + 1) * col("l")).cast("long"))
          .as("ysum"))
  }

  /** Deterministic block value of frame `f` of document `id`'s MJPEG/AVI
    * fixture — m9's rule extended with a per-frame term so no two frames
    * can be confused. The term is (f + 1) * 101, NOT f * 101: with a zero
    * frame term, frame 0 would be byte-identical to the m9 image (same
    * formula, same id-derived dims) and a walker bug serving the m9
    * fixture for frame 0 would hash-match undetected.
    */
  private[operators] def mjpegBlockValue(id: Long, f: Int, bx: Int,
      by: Int): Int =
    ((id * 37 + (f + 1) * 101 + bx * 59 + by * 83) % 256).toInt

  /** Deterministic REAL MJPEG/AVI fixture: a genuine RIFF/AVI container —
    * `LIST hdrl` holding a 56-byte `avih` main header and a `LIST strl`
    * with a `vids/MJPG` 56-byte `strh` + 40-byte BITMAPINFOHEADER `strf`,
    * then (odd ids) a word-aligned `JUNK` chunk a real reader must skip,
    * then `LIST movi` carrying `1 + id mod 3` entropy-coded `00dc` MJPEG
    * frames (each an [[encodeGrayJpeg]] block-constant JPEG — the m9
    * bit-exact corner, per frame). Assembled byte-for-byte little-endian;
    * frame period `usPerFrame = (33 + id mod 5) ms` lands in `avih` so the
    * walker's header parse is pinned through `frame_t_ms`.
    */
  private[operators] def syntheticMjpegAvi(id: Long): Array[Byte] = {
    val w = 8 * (1 + id % 3).toInt
    val h = 8 * (1 + id % 2).toInt
    val nFrames = (1 + id % 3).toInt
    val usPerFrame = (33 + id % 5).toInt * 1000
    val frames = (0 until nFrames).map(f =>
      encodeGrayJpeg(w, h, (x, y) => mjpegBlockValue(id, f, x / 8, y / 8)))
    val avihSize = 56; val strhSize = 56; val strfSize = 40
    val strlSize = 4 + 8 + strhSize + 8 + strfSize
    val hdrlSize = 4 + 8 + avihSize + 8 + strlSize
    val junk = id % 2 == 1
    val junkLen = if (junk) 14 else 0
    val moviSize = 4 + frames.map(fb => 8 + fb.length + (fb.length & 1)).sum
    val total = 12 + 8 + hdrlSize + junkLen + 8 + moviSize
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String): Unit = { buf.put(s.getBytes("US-ASCII")); () }
    fcc("RIFF"); buf.putInt(total - 8); fcc("AVI ")
    fcc("LIST"); buf.putInt(hdrlSize); fcc("hdrl")
    fcc("avih"); buf.putInt(avihSize)
    buf.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
    buf.putInt(nFrames).putInt(0).putInt(1).putInt(0)
    buf.putInt(w).putInt(h)
    buf.putInt(0).putInt(0).putInt(0).putInt(0)
    fcc("LIST"); buf.putInt(strlSize); fcc("strl")
    fcc("strh"); buf.putInt(strhSize)
    fcc("vids"); fcc("MJPG"); buf.putInt(0)
    buf.putShort(0).putShort(0).putInt(0)
    buf.putInt(usPerFrame).putInt(1000000)      // scale/rate: fps = rate/scale
    buf.putInt(0).putInt(nFrames)
    buf.putInt(frames.map(_.length).max).putInt(10000).putInt(0)
    buf.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    fcc("strf"); buf.putInt(strfSize)
    buf.putInt(40).putInt(w).putInt(h)
    buf.putShort(1).putShort(24)
    fcc("MJPG"); buf.putInt(w * h * 3)
    buf.putInt(0).putInt(0).putInt(0).putInt(0)
    if (junk) { fcc("JUNK"); buf.putInt(6); buf.put(Array.fill[Byte](6)(0x6a)) }
    fcc("LIST"); buf.putInt(moviSize); fcc("movi")
    frames.foreach { fb =>
      fcc("00dc"); buf.putInt(fb.length); buf.put(fb)
      if ((fb.length & 1) == 1) buf.put(0.toByte)
    }
    buf.array()
  }

  /** Walk a RIFF/AVI container: recurse into `hdrl`/`strl`/`movi` LISTs,
    * read the `avih` main header (frame period, declared frame count,
    * dims), collect every video-data (`..dc`) chunk's payload, skip JUNK
    * and unknown chunks word-aligned — the m4 RIFF discipline, one
    * container generation up. Every chunk size is bounds-checked before
    * use, and the declared frame count must equal the frames actually
    * present in `movi` (a truncated container fails loudly, never
    * silently serves fewer frames). Returns (width, height, usPerFrame,
    * frame payloads).
    */
  private[operators] def aviMjpegFrames(docId: Long,
      payload: Array[Byte]): (Int, Int, Int, Seq[Array[Byte]]) = {
    def i32le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tagOf(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")
    require(payload.length >= 12 && tagOf(payload, 0) == "RIFF" &&
      tagOf(payload, 8) == "AVI ",
      s"doc $docId: not a RIFF/AVI payload")
    var width = -1; var height = -1; var usPerFrame = -1; var declared = -1
    val frames = Seq.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = tagOf(payload, off)
        val size = i32le(payload, off + 4)
        // Long arithmetic: a corrupt size near Int.MaxValue would wrap
        // `off + 8 + size` negative and slip past an Int comparison
        require(size >= 0 && off.toLong + 8L + size.toLong <= end.toLong,
          s"doc $docId: AVI chunk '$id' claims $size bytes past its list end")
        if (id == "LIST") {
          val form = tagOf(payload, off + 8)
          if (form == "hdrl" || form == "strl" || form == "movi")
            walk(off + 12, off + 8 + size)
          // unknown LIST forms are skipped whole, like any unknown chunk
        } else if (id == "avih") {
          require(size >= 40, s"doc $docId: avih chunk too small ($size)")
          usPerFrame = i32le(payload, off + 8)
          declared = i32le(payload, off + 8 + 16)
          width = i32le(payload, off + 8 + 32)
          height = i32le(payload, off + 8 + 36)
        } else if (id.length == 4 && id.endsWith("dc")) {
          frames += payload.slice(off + 8, off + 8 + size)
        } // strh/strf/JUNK/idx1/...: skipped word-aligned
        off += 8 + size + (size & 1)
      }
    }
    walk(12, payload.length)
    require(width > 0 && height > 0 && usPerFrame > 0,
      s"doc $docId: AVI has no avih main header")
    val got = frames.result()
    require(got.size == declared,
      s"doc $docId: avih declares $declared frames, movi carries ${got.size}")
    (width, height, usPerFrame, got)
  }

  /** m10 gate query: MJPEG/AVI FRAME EXTRACT — the video-container class
    * composed from the pieces already proven: the m4 RIFF chunk walk
    * (recursing AVI's LIST structure, skipping JUNK) finds the `00dc`
    * video chunks, the m9 JPEG decoder (real DCT + Huffman via
    * `javax.imageio`) renders each frame, and the m6/m9 relational stat
    * shape follows PER FRAME, with `frame_t_ms` derived from the `avih`
    * frame period so the header parse is hash-pinned too. The oracle
    * restates the generative per-frame block formula — hash equality
    * proves container walk + per-frame entropy decode reproduced every
    * pixel of every frame.
    *
    * Scale shape: identical to m9 — fixture build + container walk +
    * per-frame decode are one partition-local `mapPartitions` pass (frame
    * payloads never shuffle), stats partial-agg'd on the high-cardinality
    * (doc, frame) key; what shuffles is 4 longs per frame, never pixels.
    */
  def m10AviFrameStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    RelationalQueries.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val (w, h, usPf, frames) = aviMjpegFrames(id, syntheticMjpegAvi(id))
        frames.zipWithIndex.map { case (fb, f) =>
          val (dw, dh, g) = jpegGray(id, fb)
          require(dw == w && dh == h,
            s"doc $id frame $f: decoded ${dw}x$dh != avih ${w}x$h")
          (id, f, f.toLong * (usPf / 1000), dw, dh, g)
        }
      })
      .toDF("doc_id", "frame_idx", "frame_t_ms", "width", "height", "lum")
      .select(col("doc_id"), col("frame_idx"), col("frame_t_ms"),
        col("width"), col("height"), posexplode(col("lum")).as(Seq("i", "l")))
      .groupBy("doc_id", "frame_idx", "frame_t_ms", "width", "height")
      .agg(count(lit(1)).as("n_pixels"),
        sum(col("l").cast("long")).as("sum_lum"),
        max(col("l")).cast("long").as("max_lum"),
        sum(((floor(col("i") / col("width")) + 1) * col("l")).cast("long"))
          .as("ysum"))
  }

  /** m6 gate query: PIXEL-LEVEL IMAGE STATS — the image-side twin of m5
    * (container + signal + PIXEL now all real on the image path): every
    * document's BMP payload is decoded to per-pixel luminance in a
    * partition-local pass (payload bytes never shuffle — only the int
    * luminance arrays flow), then aggregated RELATIONALLY per image:
    * pixel census, luminance sum/max, and a row-weighted sum that pins
    * the decoder's row ORDER (bottom-up vs top-down) — not just its
    * values. All-integer arithmetic; the oracle restates the generative
    * formula over the same (x, y) grid.
    *
    * Scale shape: decode is mapPartitions (m2's contract); the aggregate
    * is partial before its shuffle and keyed on doc_id — high cardinality,
    * no skew; what shuffles is 4 longs per image, never pixels.
    */
  def m6PixelStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    RelationalQueries.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, lum) = bmpLuminance(id, syntheticPixelBmp(id))
        (id, w, h, lum)
      })
      .toDF("doc_id", "width", "height", "lum")
      .select(col("doc_id"), col("width"), col("height"),
        posexplode(col("lum")).as(Seq("i", "l")))
      .groupBy("doc_id", "width", "height")
      .agg(count(lit(1)).as("n_pixels"),
        sum(col("l").cast("long")).as("sum_lum"),
        max(col("l")).cast("long").as("max_lum"),
        sum(((floor(col("i") / col("width")) + 1) * col("l")).cast("long"))
          .as("ysum"))
  }

  /** m5 gate query: PCM WINDOW ENERGY — the first signal-level (not just
    * container-level) audio operator: every document's 16-bit WAV payload
    * is decoded to samples in a partition-local pass (payload bytes never
    * shuffle — only the int sample arrays flow), then windowed RELATIONALLY:
    * posexplode → group by (doc, i div 8) → exact integer sum-of-squares
    * and peak per 8-sample window. All-integer arithmetic makes the oracle
    * (the generative formula restated over the same windows) bit-exact with
    * no decimal routing needed.
    *
    * Scale shape: decode is mapPartitions (m2's contract); the windowed
    * aggregate is partial before its shuffle and keyed on (doc_id, window)
    * — high cardinality, no skew; window stats are 3 longs per window,
    * never samples.
    */
  def m5PcmWindowEnergy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    RelationalQueries.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id => (id, pcmSamples(id, syntheticPcmWav(id))) })
      .toDF("doc_id", "samples")
      .select(col("doc_id"), posexplode(col("samples")).as(Seq("i", "s")))
      .groupBy(col("doc_id"),
        floor(col("i") / 8).cast("int").as("window_idx"))
      .agg(count(lit(1)).as("n_in_window"),
        sum(col("s").cast("long") * col("s")).as("sum_sq"),
        max(abs(col("s"))).cast("long").as("peak"))
  }

  /** m11 gate query: SPECTRAL FEATURES — the frequency-domain step of the
    * audio path (m4 walks the container, m5 measures time-domain energy;
    * this measures WHERE the energy sits). Per 8-sample window of every
    * document's decoded PCM signal, an 8-point DFT evaluated at the even
    * bins k ∈ {0, 2, 4} — DC, quarter-band, and Nyquist — whose twiddle
    * factors are EXACTLY {-1, 0, 1}, so the magnitudes-squared
    * (re² + im²) are pure int64 arithmetic and the oracle (the generative
    * sample formula pushed through the same coefficient pattern) is
    * bit-exact with no float routing. A production pipeline swaps a
    * radix-2 FFT into the same relational slot (the conditional-sum
    * aggregate becomes a mapPartitions over sample arrays); the window →
    * group-by → integer-sum shape, which is what scales, is identical.
    *
    * Scale shape: decode is mapPartitions (m2's contract, payloads never
    * shuffle); the conditional sums are partial before their shuffle and
    * keyed on (doc_id, window) — high cardinality, no skew; 4 longs per
    * window flow, never samples.
    */
  def m11WavSpectra(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sL = col("s").cast("long")
    RelationalQueries.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id => (id, pcmSamples(id, syntheticPcmWav(id))) })
      .toDF("doc_id", "samples")
      .select(col("doc_id"), posexplode(col("samples")).as(Seq("i", "s")))
      .groupBy(col("doc_id"),
        floor(col("i") / 8).cast("int").as("window_idx"))
      .agg(count(lit(1)).as("n_in_window"),
        sum(sL).as("re0"),
        // k=2: cos(πn/2) cycles 1,0,-1,0; sin(πn/2) cycles 0,1,0,-1
        sum(when(col("i") % 4 === 0, sL)
          .when(col("i") % 4 === 2, -sL).otherwise(lit(0L))).as("re2"),
        sum(when(col("i") % 4 === 1, sL)
          .when(col("i") % 4 === 3, -sL).otherwise(lit(0L))).as("im2"),
        // k=4 (Nyquist): cos(πn) = (-1)^n, sin(πn) = 0
        sum(when(col("i") % 2 === 0, sL).otherwise(-sL)).as("re4"))
      .select(col("doc_id"), col("window_idx"), col("n_in_window"),
        (col("re0") * col("re0")).as("mag2_dc"),
        (col("re2") * col("re2") + col("im2") * col("im2")).as("mag2_k2"),
        (col("re4") * col("re4")).as("mag2_k4"))
  }

  /** The NTT field for [[m12RadixTransform]]: Z_65537 (the Fermat prime
    * F4) with ω = 3^1024 mod p — 3 is a primitive root of 65537, so ω has
    * order exactly 64 (ω^32 = −1, verified in the spec). 16-bit PCM maps
    * injectively into the field, and every butterfly product stays under
    * 65536² < 2^63, so the whole transform is exact long arithmetic.
    */
  private[operators] val NttP = 65537L
  private[operators] val NttW = 8224L

  private def modpow(b: Long, e: Long, p: Long): Long = {
    var r = 1L; var bb = b % p; var ee = e
    while (ee > 0) {
      if ((ee & 1L) == 1L) r = r * bb % p
      bb = bb * bb % p; ee >>= 1
    }
    r
  }

  /** 64-point radix-2 decimation-in-time Cooley–Tukey transform over
    * Z_65537: bit-reversal permutation, then log2(64) = 6 butterfly
    * stages, each stage's twiddle the (n/len)-th power of ω — the textbook
    * iterative FFT, with the complex field swapped for the NTT field so
    * every value is integer-exact (which is what lets the DuckDB oracle
    * hash-match it against the direct O(n²) DFT).
    */
  private[operators] def ntt64(a: Array[Long]): Array[Long] = {
    val n = 64
    val x = new Array[Long](n)
    var i = 0
    while (i < n) {
      var r = 0; var b = i; var j = 0
      while (j < 6) { r = (r << 1) | (b & 1); b >>= 1; j += 1 }
      x(r) = a(i); i += 1
    }
    var len = 2
    while (len <= n) {
      val wl = modpow(NttW, (n / len).toLong, NttP)
      var base = 0
      while (base < n) {
        var wj = 1L
        var j = 0
        while (j < len / 2) {
          val u = x(base + j)
          val v = x(base + j + len / 2) * wj % NttP
          x(base + j) = (u + v) % NttP
          x(base + j + len / 2) = (u - v + NttP) % NttP
          wj = wj * wl % NttP
          j += 1
        }
        base += len
      }
      len <<= 1
    }
    x
  }

  /** m12 gate query: RADIX-2 FFT — the transform m11's doc promised for
    * its mapPartitions slot, realized as an ACTUAL 64-point radix-2
    * Cooley–Tukey FFT ([[ntt64]]) rather than per-bin conditional sums:
    * each document's decoded PCM signal, zero-padded to 64, is transformed
    * in one partition-local pass and all 64 spectral bins flow out (m11
    * could only reach the 3 bins whose twiddles are {−1,0,1}; the FFT
    * reaches every bin). Exactness comes from running the identical
    * butterfly/bit-reversal structure over the NTT field Z_65537 instead
    * of ℂ — the standard exact-arithmetic instantiation of the FFT — so
    * the oracle (the direct O(n²) DFT, X_k = Σ s_n·ω^{nk} mod p, restated
    * generatively with a recursive twiddle-power CTE) is bit-exact:
    * hash equality IS the FFT≡DFT theorem checked on real decoded data,
    * which a float fixture could only approximate.
    *
    * Scale shape: decode + transform are one mapPartitions pass (payload
    * bytes and sample arrays never shuffle — only the 64 (doc, bin, coeff)
    * longs flow); O(n log n) per window replaces m11's per-bin passes,
    * which is the whole point of the FFT at production window sizes.
    */
  def m12RadixTransform(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    RelationalQueries.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val s = pcmSamples(id, syntheticPcmWav(id))
        val a = new Array[Long](64)
        var i = 0
        while (i < s.length && i < 64) {
          a(i) = Math.floorMod(s(i).toLong, NttP); i += 1
        }
        val x = ntt64(a)
        (0 until 64).iterator.map(k => (id, k, x(k)))
      })
      .toDF("doc_id", "k", "x")
  }

  /** m4 gate query: REAL container decode — the de-stubbed half of the
    * multimodal story. Each document id deterministically becomes a valid
    * BMP (even ids) or RIFF/WAV (odd ids; every other one carrying a JUNK
    * chunk the scanner must skip), assembled byte-for-byte little-endian in
    * the fixture; [[HeaderDecoder]] then parses the container headers like
    * any real reader. The oracle restates the expected features from the
    * same id arithmetic — hash equality proves the decoder recovered every
    * field from the BYTES (offsets, endianness, chunk walk), since nothing
    * else connects fixture parameters to decoder output.
    *
    * Scale shape: identical to m2 — fixture build and decode are both
    * partition-local `mapPartitions` passes, payloads never shuffle, only
    * the fixed-width feature struct flows downstream.
    */
  def m4ContainerDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = RelationalQueries.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        if (id % 2 == 0)
          (id, syntheticBmp(width = (1 + id % 97).toInt,
            height = (1 + (id * 7) % 61).toInt), "image/bmp")
        else
          (id, syntheticWav(
            channels = (1 + (id / 2) % 2).toInt,
            sampleRate = (8000 + (id % 8) * 1000).toInt,
            bitsPerSample = (8 * (1 + (id / 3) % 3)).toInt,
            extra = (id % 4).toInt,
            junk = (id / 4) % 2 == 1), "audio/wav")
      }).toDF("doc_id", "media", "media_type")
    decodeFeatures(media, HeaderDecoder).toDF()
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
