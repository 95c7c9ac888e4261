package graft.operators

import graft.SparkSpec
import graft.sources.SnapshotLog

/** st19 streaming corpus build: invariants the shared x1 oracle can't
  * express — streaming-equals-batch row equality, one state commit per
  * micro-batch, and the append-only pair-log discipline.
  */
class St19StreamingCorpusSpec extends SparkSpec {

  private def key(r: org.apache.spark.sql.Row) =
    (r.getAs[String]("split"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("sum_ids"), r.getAs[Long]("tot_tokens"),
      r.getAs[Long]("n_bins"), r.getAs[Long]("census_hash"))

  private lazy val streamed =
    CorpusPipeline.st19StreamingCorpusBuild(spark, sfDir).collect()

  test("st19: streaming census equals the batch x1 census, row for row") {
    // The strongest composition pin available: the micro-batched build —
    // frozen models, incremental pair discovery, freeze-time composition —
    // must reproduce the batch pipeline's per-split census EXACTLY. Any
    // batch-boundary leak (a pair missed across batches, a stage flag
    // composed against the wrong survivor set, a replayed/torn commit)
    // lands in some census column.
    val batch = CorpusPipeline.x1Census(spark, sfDir).collect()
      .map(key).sortBy(_._1)
    assert(streamed.map(key).sortBy(_._1).sameElements(batch))
  }

  test("st19: exactly one state commit per micro-batch") {
    // 4 arrival files => 4 micro-batches => final version 4 on every state
    // table (a replayed batch would either no-op — still 4 — or, if the
    // batchId keying broke, land a 5th version and fail here)
    assert(streamed.forall(_.getAs[Int]("n_commits") == 4))
    val sfTag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val root = new java.io.File(s"target/parity/x1s-state-$sfTag")
      .getAbsoluteFile.toString
    for (t <- Seq("docs", "lsh", "sem", "grams", "pairs"))
      assert(SnapshotLog.latestVersion(spark, s"file:$root/$t").contains(4),
        s"state table $t should sit at version 4")
  }

  test("st19: state tables are append-only — every version carries its parent") {
    streamed // force the run
    val sfTag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val root = new java.io.File(s"target/parity/x1s-state-$sfTag")
      .getAbsoluteFile.toString
    for (t <- Seq("docs", "lsh", "sem", "grams", "pairs"); v <- 2 to 4) {
      val prev = SnapshotLog.manifest(spark, s"file:$root/$t", v - 1).toSet
      val cur = SnapshotLog.manifest(spark, s"file:$root/$t", v).toSet
      assert(prev.subsetOf(cur),
        s"$t v$v dropped files from v${v - 1} — state must only append")
    }
  }

  test("st19: the flatness harness measures one sample per arrival batch") {
    // mechanism pin for ScaleSlope's x10 flatness instrument: an 8-way
    // split runs 8 micro-batches and yields 8 positive per-batch samples
    // (the timing assertion itself lives in target/scaleslope.json where
    // the canary can contextualize it — sf0.001 wall times are noise)
    val (batches, freezeSec) = CorpusPipeline.st19BatchFlatness(spark, sfDir, 8)
    assert(batches.size == 8, s"expected 8 per-batch samples, got $batches")
    assert(batches.forall(_ > 0), s"non-positive batch seconds: $batches")
    assert(freezeSec > 0, s"non-positive freeze seconds: $freezeSec")
  }
}
