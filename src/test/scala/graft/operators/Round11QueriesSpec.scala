package graft.operators

import graft.SparkSpec

/** Round-11 operators: trained-nprobe recall curve (e29) and pixel-level
  * image stats (m6).
  */
class Round11QueriesSpec extends SparkSpec {

  test("e29: recall is monotone in nprobe and anchors at 1.0 when every bin is probed") {
    val rows = VectorQueries.e29TrainedNprobeRecall(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4))
    // candidate count (the cost axis) strictly grows with nprobe
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 < b._2 },
      s"candidates not increasing: $rows")
    // exact scoring ⇒ hits = |brute ∩ candidates| ⇒ recall monotone
    assert(rows.sliding(2).forall { case Array(a, b) => a._4 <= b._4 },
      s"recall not monotone: $rows")
    // nprobe = #bins (4 trained centroids at gate k) probes everything:
    // the candidate set is the whole corpus, so recall must be exactly 1
    assert(rows.last._4 == 1.0, s"full probe should recall 1.0: $rows")
    assert(rows.head._4 > 0.0, s"own-bin probe should find something: $rows")
  }

  test("e30: exact re-ranking the ADC shortlist never loses recall") {
    val rows = VectorQueries.e30TrainedRefine(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val (adcHits, adcRec) = rows("adc")
    val (refHits, refRec) = rows("refined")
    // refined hits = |brute ∩ shortlist| ⊇ |brute ∩ adc-top-k|: any
    // exact-scored vector outranking a brute-top-k member is itself
    // brute-top-k, so re-ranking can only surface true neighbors the ADC
    // ordering buried — never bury found ones
    assert(refHits >= adcHits, s"refine lost recall: $rows")
    assert(adcRec >= 0.0 && refRec <= 1.0)
  }

  test("m6: luminance stats match the generative formula, including row order") {
    val rows = MultimodalOps.m6PixelStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = (2 + id % 6).toInt
      val h = (1 + id % 4).toInt
      def lum(x: Int, y: Int): Long =
        ((id + 3 * x + 7 * y) % 256) + 2 * ((2 * id + 5 * x + 11 * y) % 256) +
          4 * ((3 * id + 13 * x + 17 * y) % 256)
      val all = for (y <- 0 until h; x <- 0 until w) yield (y, lum(x, y))
      assert(r.getInt(1) == w && r.getInt(2) == h, s"doc $id dims")
      assert(r.getLong(3) == w.toLong * h, s"doc $id n_pixels")
      assert(r.getLong(4) == all.map(_._2).sum, s"doc $id sum_lum")
      assert(r.getLong(5) == all.map(_._2).max, s"doc $id max_lum")
      // the row-order pin: ysum weights by the IMAGE row index, so a
      // decoder that ignores bottom-up storage (or the top-down flag on
      // id % 3 == 0 fixtures) fails here even with identical pixel sets
      assert(r.getLong(6) == all.map { case (y, l) => (y + 1) * l }.sum,
        s"doc $id ysum (row order)")
    }
  }

  test("d39: tokenization conserves characters and merges shrink the piece stream") {
    import org.apache.spark.sql.functions._
    val rows = TextQueries.d39BpeTokenize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // character conservation: BPE re-segments, never rewrites — summed
    // piece chars per source must equal the corpus' own non-space chars
    val expect = RelationalQueries.table(spark, sfDir, "documents")
      .select(col("source"),
        length(regexp_replace(col("text"), "\\s+", "")).as("n"))
      .groupBy("source").agg(sum(col("n")).as("chars"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(3) == expect(r.getString(0)),
        s"${r.getString(0)}: pieces dropped or duplicated characters")
      // merges happened: strictly fewer pieces than characters
      assert(r.getLong(1) < expect(r.getString(0)))
    }
  }

  test("m6 decoder survives a hand-laid bottom-up BMP with padding and data-offset gap") {
    // 2x2, 24bpp, stride 8 (2 pad bytes), data offset 58 (4-byte gap),
    // POSITIVE height = bottom-up: stored row 0 is IMAGE row 1
    val buf = java.nio.ByteBuffer.allocate(58 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(58 + 16).putShort(0).putShort(0).putInt(58)
    buf.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
    buf.putInt(0).putInt(16).putInt(2835).putInt(2835).putInt(0).putInt(0)
    buf.putInt(-1) // gap the decoder must skip via the data-offset field
    // stored row 0 (image row 1): pixels (B,G,R) = (1,0,0), (2,0,0) + pad
    buf.put(Array[Byte](1, 0, 0, 2, 0, 0, 99, 99))
    // stored row 1 (image row 0): pixels (0,1,0), (0,0,1) + pad
    buf.put(Array[Byte](0, 1, 0, 0, 0, 1, 99, 99))
    val (w, h, lum) = MultimodalOps.bmpLuminance(7L, buf.array())
    assert(w == 2 && h == 2)
    // image order: row 0 = (0,1,0)->2, (0,0,1)->4; row 1 = (1,0,0)->1, (2,0,0)->2
    assert(lum.toSeq == Seq(2, 4, 1, 2), lum.toSeq)
    // truncated pixel array fails loudly
    intercept[IllegalArgumentException] {
      MultimodalOps.bmpLuminance(7L, buf.array().take(58 + 10))
    }
  }
}
