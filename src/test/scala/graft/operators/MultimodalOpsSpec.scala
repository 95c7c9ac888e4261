package graft.operators

import graft.SparkSpec
import graft.operators.MultimodalOps._

/** Binary media column plumbing: schema, per-partition batch decode, feature
  * frame output.
  */
class MultimodalOpsSpec extends SparkSpec {

  test("asMediaTable + decodeFeatures: per-partition decode yields typed features") {
    val docs = RelationalQueries.table(spark, sfDir, "documents")
    val media = asMediaTable(docs, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq == Seq("doc_id", "media", "media_type"))
    assert(media.schema("media").dataType.typeName == "binary")

    val feats = decodeFeatures(media.repartition(4), FakeDecoder)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    // deterministic fake: n_bytes equals payload length; dims in declared range
    val byId = rows.map(f => f.doc_id -> f).toMap
    val sample = docs.select("doc_id", "text").collect().take(20)
    sample.foreach { r =>
      val f = byId(r.getLong(0))
      assert(f.n_bytes == r.getString(1).getBytes("UTF-8").length)
      assert(f.width >= 16 && f.width <= 16 + 63 * 16)
      assert(f.channels >= 1 && f.channels <= 3)
    }
    // decode twice => identical features (pure, deterministic)
    val again = decodeFeatures(media.repartition(2), FakeDecoder).collect()
      .map(f => f.doc_id -> f).toMap
    assert(byId == again)
  }

  test("HeaderDecoder parses hand-laid BMP and WAV bytes (not fixture echo)") {
    // BMP: 14-byte file header, BITMAPINFOHEADER with width=640 (0x280),
    // height=-480 (top-down; int32 LE f.. ), 32bpp — every byte written by
    // hand here, independent of the syntheticBmp builder
    val bmp = Array[Int](
      'B', 'M', 0, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
      40, 0, 0, 0,                                   // DIB header size
      0x80, 0x02, 0, 0,                              // width 640
      0x20, 0xfe, 0xff, 0xff,                        // height -480 (top-down)
      1, 0, 32, 0,                                   // planes, 32 bpp
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0).map(_.toByte)
    val fb = HeaderDecoder.decode(7L, bmp)
    assert(fb == MediaFeatures(7L, bmp.length, "image/bmp", 640, 480, 4))

    // WAV: RIFF/WAVE with a LIST chunk (odd size => padded) BEFORE fmt —
    // 44100 Hz (0xAC44), stereo, 16-bit
    val wav = (Array[Int]('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E',
      'L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0, // 3-byte chunk + pad byte
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0,                                        // PCM
      2, 0,                                        // stereo
      0x44, 0xAC, 0, 0,                            // 44100
      0x10, 0xB1, 2, 0,                            // byte rate 176400
      4, 0,                                        // block align
      16, 0,                                       // bits
      'd', 'a', 't', 'a', 0, 0, 0, 0)).map(_.toByte)
    val fw = HeaderDecoder.decode(8L, wav)
    assert(fw == MediaFeatures(8L, wav.length, "audio/wav", 44100, 16, 2))

    // corrupt payloads fail loudly, never flow downstream as zeros
    intercept[IllegalArgumentException] {
      HeaderDecoder.decode(9L, Array.fill[Byte](60)(0x41))
    }
    intercept[IllegalArgumentException] { // RIFF but no fmt chunk
      HeaderDecoder.decode(10L, "RIFFxxxxWAVE".getBytes("US-ASCII"))
    }
  }

  test("m4: synthetic containers decode to their construction parameters") {
    val feats = m4ContainerDecode(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats.nonEmpty)
    feats.foreach { case (id, r) =>
      if (id % 2 == 0) {
        assert(r.getString(2) == "image/bmp")
        assert(r.getInt(3) == (1 + id % 97).toInt, s"doc $id width")
        assert(r.getInt(4) == (1 + (id * 7) % 61).toInt, s"doc $id height")
        assert(r.getInt(5) == 3)
      } else {
        assert(r.getString(2) == "audio/wav")
        assert(r.getInt(3) == (8000 + (id % 8) * 1000).toInt, s"doc $id rate")
        assert(r.getInt(4) == (8 * (1 + (id / 3) % 3)).toInt, s"doc $id bits")
        assert(r.getInt(5) == (1 + (id / 2) % 2).toInt, s"doc $id channels")
      }
    }
  }

  test("pcmSamples reads LE signed int16 from hand-laid bytes, skipping JUNK") {
    // hand-assembled, not via syntheticPcmWav: RIFF/WAVE, a JUNK chunk the
    // walk must skip, fmt, then data = [1, -1, -32768, 32767] little-endian
    val data = Array[Byte](0x01, 0x00, 0xff.toByte, 0xff.toByte,
      0x00, 0x80.toByte, 0xff.toByte, 0x7f)
    val buf = java.nio.ByteBuffer.allocate(44 + 14 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + 14 + data.length)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("JUNK".getBytes("US-ASCII")).putInt(6)
    buf.put(Array.fill[Byte](6)(0))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(data.length)
    buf.put(data)
    assert(MultimodalOps.pcmSamples(1L, buf.array()).toSeq ==
      Seq(1, -1, -32768, 32767))
    // a payload without a data chunk fails loudly
    intercept[IllegalArgumentException] {
      MultimodalOps.pcmSamples(2L, buf.array().take(44 + 14))
    }
  }

  test("a malformed PRECEDING chunk size fails cleanly, never loops the walk") {
    // JUNK chunk claiming a negative size: an unvalidated walk would step
    // off backwards (infinite loop); both walks must reject the chunk itself
    def riffWithJunkSize(size: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(12 + 8 + 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(20)
      buf.put("WAVE".getBytes("US-ASCII"))
      buf.put("JUNK".getBytes("US-ASCII")).putInt(size)
      buf.put(Array.fill[Byte](8)(0))
      buf.array()
    }
    for (bad <- Seq(-12, Int.MinValue, 1 << 20)) {
      val ex = intercept[IllegalArgumentException] {
        MultimodalOps.pcmSamples(3L, riffWithJunkSize(bad))
      }
      assert(ex.getMessage.contains("JUNK"), s"size=$bad: ${ex.getMessage}")
      // HeaderDecoder's walk enforces the same rule
      intercept[IllegalArgumentException] {
        MultimodalOps.HeaderDecoder.decode(3L, riffWithJunkSize(bad))
      }
    }
  }

  test("m5: window stats match the generative formula, windows cover all samples") {
    val rows = m5PcmWindowEnergy(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (id, ws) =>
      val n = (16 + id % 17).toInt
      assert(ws.map(_.getLong(2)).sum == n, s"doc $id sample coverage")
      assert(ws.map(_.getInt(1)).sorted.toSeq == (0 until (n + 7) / 8).toSeq)
      // spot-check window 0 against the formula
      val w0 = ws.find(_.getInt(1) == 0).get
      val s = (0 until 8).map(i => ((id * 31 + i.toLong * 7919) % 65536) - 32768)
      assert(w0.getLong(3) == s.map(x => x * x).sum, s"doc $id sum_sq")
      assert(w0.getLong(4) == s.map(math.abs).max, s"doc $id peak")
    }
  }

  test("m7: the PNG encode→decode round trip reproduces every pixel") {
    // payload really is a PNG container (magic + IHDR), and the decoded
    // luminance stats match the generative formula in image row order
    val png = MultimodalOps.syntheticPng(5L)
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' &&
      png(3) == 'G')
    assert(new String(png.slice(12, 16), "US-ASCII") == "IHDR")
    val rows = MultimodalOps.m7PngStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = (3 + id % 5).toInt
      val h = (2 + id % 3).toInt
      def lum(x: Int, y: Int): Long =
        ((3 * id + 11 * x + 13 * y) % 256) +
          2 * ((2 * id + 7 * x + 5 * y) % 256) +
          4 * ((id + 5 * x + 3 * y) % 256)
      val all = for (y <- 0 until h; x <- 0 until w) yield (y, lum(x, y))
      assert(r.getInt(1) == w && r.getInt(2) == h, s"doc $id dims")
      assert(r.getLong(3) == w.toLong * h, s"doc $id n_pixels")
      assert(r.getLong(4) == all.map(_._2).sum, s"doc $id sum_lum")
      assert(r.getLong(5) == all.map(_._2).max, s"doc $id max_lum")
      assert(r.getLong(6) == all.map { case (y, l) => (y + 1) * l }.sum,
        s"doc $id ysum (row order)")
    }
  }

  test("m9: the block-constant JPEG round trip is BIT-EXACT despite the lossy codec") {
    // the fixture engineering claim, asserted pixel-by-pixel: constant
    // 8×8 MCUs → zero AC + step-1 DC quantization at quality 1.0 +
    // grayscale (no chroma subsampling) → exact decode. A JRE codec
    // change that breaks any of this fails HERE, not as a bare gate-hash
    // mismatch.
    for (id <- 0L until 40L) {
      val payload = MultimodalOps.syntheticJpeg(id)
      // a real JPEG container: SOI marker + a quantization table marker
      assert((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8,
        s"doc $id: no SOI")
      assert(payload.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xdb),
        s"doc $id: no DQT marker — not an encoded JPEG")
      val (w, h, g) = MultimodalOps.jpegGray(id, payload)
      assert(w == 8 * (1 + id % 3).toInt && h == 8 * (1 + id % 2).toInt,
        s"doc $id dims")
      for (y <- 0 until h; x <- 0 until w)
        assert(g(y * w + x) ==
          MultimodalOps.jpegBlockValue(id, x / 8, y / 8),
          s"doc $id pixel ($x,$y) drifted — the exact-round-trip premise broke")
    }
  }

  test("m9 decoder rejects non-JPEG payloads loudly") {
    intercept[IllegalArgumentException] {
      MultimodalOps.jpegGray(0L, Array[Byte](1, 2, 3, 4))
    }
  }

  test("m10: the AVI walk recovers every MJPEG frame bit-exactly, JUNK skipped") {
    for (id <- 0L until 40L) {
      val payload = MultimodalOps.syntheticMjpegAvi(id)
      // a real RIFF/AVI container with an hdrl LIST before the movi data
      assert(new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
        new String(payload, 8, 4, "US-ASCII") == "AVI ", s"doc $id: not AVI")
      val (w, h, usPf, frames) =
        MultimodalOps.aviMjpegFrames(id, payload)
      assert(w == 8 * (1 + id % 3).toInt && h == 8 * (1 + id % 2).toInt,
        s"doc $id: avih dims")
      assert(usPf == (33 + id % 5).toInt * 1000, s"doc $id: avih frame period")
      assert(frames.size == (1 + id % 3).toInt, s"doc $id: frame count")
      frames.zipWithIndex.foreach { case (fb, f) =>
        val (dw, dh, g) = MultimodalOps.jpegGray(id, fb)
        assert(dw == w && dh == h, s"doc $id frame $f dims")
        for (y <- 0 until h; x <- 0 until w)
          assert(g(y * w + x) ==
            MultimodalOps.mjpegBlockValue(id, f, x / 8, y / 8),
            s"doc $id frame $f pixel ($x,$y) drifted")
      }
    }
  }

  test("m10 walker fails loudly when avih's frame count disagrees with movi") {
    val payload = MultimodalOps.syntheticMjpegAvi(5L) // 3 frames declared
    // truncate the container just after the second frame's chunk: find the
    // third '00dc' tag and cut there, then fix up the RIFF/movi sizes by
    // walking — simplest loud-failure probe: chop the last 00dc chunk out
    def find(tag: String, from: Int): Int = {
      var i = from
      while (i + 4 <= payload.length &&
        new String(payload, i, 4, "US-ASCII") != tag) i += 1
      i
    }
    val third = {
      var p = find("00dc", 12)
      p = find("00dc", p + 4)
      find("00dc", p + 4)
    }
    assert(third + 4 <= payload.length, "fixture should carry 3 frames")
    val truncated = payload.take(third)
    intercept[IllegalArgumentException] {
      MultimodalOps.aviMjpegFrames(5L, truncated)
    }
  }

  test("m7 decoder rejects non-PNG payloads loudly") {
    val bad = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    intercept[IllegalArgumentException] {
      MultimodalOps.pngLuminance(0L, bad)
    }
  }

  test("m8: nearest-neighbor resize samples the exact source grid") {
    // hand-laid 5x3 raster with value 10*y + x: every output pixel must be
    // the source pixel at (2u, 2v), dims ceil by 2, row order preserved
    val w = 5; val h = 3
    val lum = (for (y <- 0 until h; x <- 0 until w) yield 10 * y + x).toArray
    val (ow, oh, out) = MultimodalOps.nnResize(lum, w, h, 2)
    assert(ow == 3 && oh == 2, s"dims $ow x $oh")
    assert(out.toSeq == Seq(0, 2, 4, 20, 22, 24), out.toSeq)
    // degenerate 1-pixel image survives
    val (ow1, oh1, out1) = MultimodalOps.nnResize(Array(7), 1, 1, 2)
    assert(ow1 == 1 && oh1 == 1 && out1.toSeq == Seq(7))
  }
}
