package graft.streaming

import graft.SparkSpec
import graft.sources.SnapshotLog
import graft.operators.DedupQueries
import org.apache.spark.sql.functions._

/** st18's exactly-once state contract: every micro-batch lands as ONE
  * batchId-keyed SnapshotLog commit, so an at-least-once replay cannot
  * double-apply and no reader ever sees a half-rewritten state.
  */
class St18ReplaySpec extends SparkSpec {

  test("state versions form one commit per batch; replaying a batch key is a no-op; partial-batch state never exists") {
    import spark.implicits._
    val result = DedupQueries.st18StreamingSemanticDedup(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)

    val sfTag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val statePath = "file:" + new java.io.File(
      s"target/parity/semdedup-state-$sfTag").getAbsolutePath
    val head = SnapshotLog.latestVersion(spark, statePath).get
    // the 4-file range-split fixture streams one file per trigger
    assert(head == 4, s"expected one commit per micro-batch, got $head")

    // Prefix property at the VECTOR level: version v holds exactly the
    // vectors of batches 1..v — a crash between any two commits leaves the
    // previous version fully consistent (never a partial batch).
    val countsByVersion = (1 to head).map { v =>
      SnapshotLog.read(spark, statePath, v).count()
    }
    assert(countsByVersion.zip(countsByVersion.tail).forall { case (a, b) => a < b })
    val total = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(countsByVersion.last == total,
      s"head state must hold the whole corpus: ${countsByVersion.last} vs $total")

    // At-least-once REPLAY: re-committing an already-live batch key (the
    // post-crash foreachBatch re-delivery) must be a no-op — same head,
    // no new version, state untouched — even with garbage data attached.
    val headStats = result.toSeq
    val replayed = SnapshotLog.commit(spark, statePath,
      Seq((-1L, Array(0f), 0.0, true, 0))
        .toDF("vec_id", "embedding", "nrm", "kept", "bin"),
      carried = Nil, commitKey = Some(s"batch-${head - 1}"),
      partitionBy = Some("bin"))
    assert(replayed <= head, "replay must resolve to the existing version")
    assert(SnapshotLog.latestVersion(spark, statePath).contains(head))
    val after = SnapshotLog.read(spark, statePath, head)
      .groupBy(col("bin").cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("rm"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(after.toSeq == headStats.map(t => (t._1, t._2, t._3)),
      "replay disturbed the committed state")

    // and the incremental head still equals the batch answer (d36) — the
    // oracle's equivalence, restated in-JVM
    val d36 = DedupQueries.d36SemanticDedup(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(result.toSeq == d36.toSeq, "incremental ≠ batch after replay")
  }
}
