package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** x1 end-to-end corpus pipeline: shared-stage plan pins + composition
  * invariants the DuckDB oracle can't express (plan shape, snapshot
  * round-trip determinism).
  */
class X1PipelineSpec extends SparkSpec {

  private lazy val census = CorpusPipeline.x1Census(spark, sfDir)
  private lazy val plan = census.queryExecution.executedPlan.toString

  test("x1: the landed corpus is scanned once — every stage reads the cut") {
    // The survivor frame (with its token array) is localCheckpoint-
    // materialized; LSH, semantic restriction, decontamination, split and
    // packing all consume the checkpointed leaf. The census plan must
    // contain ZERO direct file scans of the landed corpus — the one real
    // scan lives inside the checkpoint build — and several leaf consumers.
    // If tokenize/shingle stopped being shared, a direct landing FileScan
    // would reappear here. (The lineage CUT itself is also load-bearing:
    // with persist the analyzed tree doubles per cascade stage and AQE's
    // per-stage plan stringification goes quadratic — the r14 finding —
    // so the absence of InMemoryRelation under an ExistingRDD-leafed plan
    // is the pinned shape, not an accident.)
    val landingScans = census.queryExecution.executedPlan.collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("x1-landing")) => f
    }.size
    assert(landingScans == 0,
      s"expected every census stage to read the materialized survivor frame, " +
        s"but found $landingScans direct landing-file scan(s)")
    val leafScans = "Scan ExistingRDD".r.findAllIn(plan).size
    assert(leafScans >= 3,
      s"expected the checkpointed survivor/shingle frames to feed >=3 consumers, got $leafScans")
  }

  test("x1: census agrees with an independently composed restatement") {
    val rows = census.collect()
    assert(rows.length >= 1 && rows.length <= 3)
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "valid", "test")))
    // no eval-reserved doc (0 mod 40) may survive into any split
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs > 0)
    // train dominates under the 80/10/10 content-hash split on any corpus
    // large enough to populate all three splits
    if (rows.length == 3) {
      val byS = rows.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
      assert(byS("train") > byS("valid") && byS("train") > byS("test"))
    }
  }

  test("x1: committed snapshot round-trips the census and is version 1") {
    val out = CorpusPipeline.x1CorpusPipeline(spark, sfDir)
    val rows = out.collect()
    assert(rows.forall(_.getAs[Int]("snapshot_version") == 1),
      "fresh per-run state dir must always commit version 1")
    // the committed parquet equals the pre-commit census frame
    val pre = census.collect().map(r =>
      (r.getAs[String]("split"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_ids"), r.getAs[Long]("tot_tokens"),
        r.getAs[Long]("n_bins"), r.getAs[Long]("census_hash"))).sortBy(_._1)
    val post = rows.map(r =>
      (r.getAs[String]("split"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_ids"), r.getAs[Long]("tot_tokens"),
        r.getAs[Long]("n_bins"), r.getAs[Long]("census_hash"))).sortBy(_._1)
    assert(pre.sameElements(post))
  }

  test("x1: every dedup stage only ever removes documents") {
    // monotone shrinkage: redaction never drops, then quality ⊇ fluency ⊇
    // exact ⊇ LSH ⊇ semantic ⊇ decon — restated through the census total
    // vs the source corpus count
    val docs = RelationalQueries.table(spark, sfDir, "documents")
    val total = census.agg(sum(col("n_docs"))).collect()(0).getLong(0)
    assert(total <= docs.count())
  }

  test("x1: no window in the plan ever holds a corpus-scale partition") {
    // the packing prefix-sum must be the two-pass distributed form
    // (packCensus): the corpus-frame window partitions by (split, source,
    // shard) — shard = doc_id div PackShardW, so no partition exceeds
    // PackShardW rows BY CONSTRUCTION (unique doc_ids) — and the only
    // window with fewer keys is the per-shard OFFSET window, whose input
    // is the one-row-per-(stratum, shard) aggregate (~corpus/PackShardW
    // rows total). The r13 split-only key serialized ~80% of the corpus
    // through one task; the r14 (split, source) key still bounded
    // parallelism by #sources = O(10) (the r14 "What's wrong #2").
    // (string-form pin: the AQE root hides WindowExec from collect; the
    // plan string prints every `Window [exprs], [partitionSpec], [order]`)
    val specs = """Window \[([^\]]*)\], \[([^\]]*)\], \[""".r
      .findAllMatchIn(plan).map(m => (m.group(1), m.group(2))).toSeq
    assert(specs.nonEmpty, s"expected the packing windows in the census plan:\n$plan")
    assert(specs.exists(_._2.contains("shard")),
      s"no shard-chunked window — the corpus prefix-sum lost its " +
        s"distributed form: ${specs.map(_._2)}")
    specs.foreach { case (exprs, part) =>
      if (!part.contains("shard"))
        assert(exprs.contains("stot"),
          s"window over [$part] without a shard key computes [$exprs] — " +
            "only the per-shard-total offset window may partition " +
            "coarser than shards")
    }
  }

  test("x1: PII redaction lands before every content fingerprint") {
    // the scrub feeds downstream hashing: every surviving document's text
    // must carry the typed placeholders (the content-salted PII is gone),
    // and the census hash is therefore a hash of REDACTED text. Restate a
    // tiny probe: no surviving doc in the committed snapshot may match the
    // raw PII patterns, and every one carries all three placeholders.
    val sfTag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val landing = new java.io.File(
      s"target/parity/x1-landing-$sfTag").getAbsoluteFile
    // force the pipeline (and its landing write) if not already run
    census.collect()
    val landed = spark.read.parquet(s"file:$landing")
    // recompute stage R exactly as the pipeline does and probe its output
    val redacted = CorpusPipeline.redactProbe(landed)
    val bad = redacted.filter(
      col("text").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
      col("text").rlike("\\+1-555-[0-9]{4}") ||
      col("text").rlike("10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}")).count()
    assert(bad == 0, s"$bad documents still carry unredacted PII patterns")
    val missing = redacted.filter(!col("text").contains("<EMAIL>") ||
      !col("text").contains("<PHONE>") || !col("text").contains("<IP>")).count()
    assert(missing == 0,
      s"$missing documents lost their typed placeholders — the salt or " +
        "redaction stage is broken")
  }

  test("x2: the trained segmentation PARTITIONS every survivor word, " +
      "and the tokenizer trains on the cleaned corpus") {
    // BPE merges only ever concatenate adjacent pieces of the same word,
    // so the piece chars of a word must sum to the word's chars — per
    // split, sum_piece_chars must equal the total chars of that split's
    // word occurrences. A dropped or doubled piece breaks the equality.
    val out = CorpusPipeline.x2BpeTokenizedCorpus(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.nonEmpty)
    val surv = CorpusPipeline.x1Survivors(spark, sfDir)
    val b = pmod(graft.functions.GraftFunctions.h60(col("text")), lit(100L))
    val expChars = surv.select(
        when(b < 80, "train").when(b < 90, "valid").otherwise("test")
          .as("split"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("split")
      .agg(sum(length(col("w")).cast("long")).as("chars"),
        count(lit(1)).as("n_words"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == expChars.keySet)
    out.foreach { case (split, (nPieces, _, sumChars)) =>
      val (chars, nWords) = expChars(split)
      assert(sumChars == chars,
        s"$split: piece chars $sumChars != word chars $chars — " +
          "segmentation does not partition the words")
      assert(nPieces >= nWords,
        s"$split: fewer pieces than words — some word lost its pieces")
    }
  }

  test("x3: the distributed pack census equals the one-window restatement " +
      "and is consistent with x2's piece totals") {
    val L = CorpusPipeline.X3SeqLen
    val rows = CorpusPipeline.x3PackedSequences(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("train", "valid", "test"))

    // cross-query invariant: x3 packs exactly the pieces x2 censused —
    // the packing stage loses or invents nothing
    val x2 = CorpusPipeline.x2BpeTokenizedCorpus(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (split, r) =>
      assert(r.getAs[Long]("tot_pieces") == x2(split),
        s"$split: packed ${r.getAs[Long]("tot_pieces")} pieces, " +
          s"x2 censused ${x2(split)}")
    }

    // per-sequence bookkeeping arithmetic: every non-tail sequence holds
    // exactly L pieces; boundary sums are internally consistent
    rows.foreach { case (split, r) =>
      val tot = r.getAs[Long]("tot_pieces")
      val nSeqs = r.getAs[Long]("n_seqs")
      val tail = r.getAs[Long]("last_seq_len")
      assert(nSeqs == (tot + L - 1) / L, s"$split: n_seqs")
      assert(tail >= 1 && tail <= L, s"$split: tail $tail outside (0,$L]")
      assert((nSeqs - 1) * L + tail == tot, s"$split: piece accounting")
      val ss = r.getAs[Long]("sum_start_seq")
      val se = r.getAs[Long]("sum_end_seq")
      val straddlers = r.getAs[Long]("n_straddlers")
      assert(se - ss >= straddlers,
        s"$split: end-start sequence mass below straddler count")
      assert(straddlers <= r.getAs[Long]("n_docs"))
    }

    // the two-pass prefix sum computes the SAME census as the plain
    // one-window form (the packCensus equivalence, restated for x3's
    // per-split strata): recompute placement with a single window
    val surv = CorpusPipeline.x1Survivors(spark, sfDir)
    val (_, seg, _) =
      TextQueries.bpeTrainClassicFrom(surv.select(col("text")), 10)
    val b = pmod(graft.functions.GraftFunctions.h60(col("text")), lit(100L))
    val dtoks = surv.select(col("doc_id"),
      when(b < 80, "train").when(b < 90, "valid").otherwise("test")
        .as("split"),
      explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val dp = dtoks.join(seg, dtoks("w") === seg("w_id"))
      .groupBy("doc_id", "split").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("split").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val oneWindow = dp.withColumn("cum", sum(col("n")).over(w))
      .withColumn("start_seq", expr(s"(cum - n) div $L"))
      .withColumn("end_seq", expr(s"(cum - 1) div $L"))
      .groupBy("split")
      .agg(sum(col("start_seq")).as("ss"), sum(col("end_seq")).as("se"),
        count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.foreach { case (split, r) =>
      val (ss, se, nd) = oneWindow(split)
      assert(r.getAs[Long]("sum_start_seq") == ss &&
        r.getAs[Long]("sum_end_seq") == se &&
        r.getAs[Long]("n_docs") == nd,
        s"$split: two-pass prefix sum diverged from the one-window form")
    }
  }
}
