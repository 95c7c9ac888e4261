package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** st21 streaming PQ-encode ingest: the stream-built compressed index must
  * serve exactly e26's fully-trained IVF-PQ answer (batch-built ∪
  * batch-built ≡ one-shot build under frozen codebooks).
  */
class St21StreamingPqSpec extends SparkSpec {

  test("st21: stream-built compressed index serves e26's answer exactly") {
    val got = VectorQueries.st21StreamingPqIngest(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val oneShot = VectorQueries.e26TrainedIvfPqFull(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.length == oneShot.length && got.length > 0,
      s"row count ${got.length} vs one-shot ${oneShot.length}")
    assert(got.sameElements(oneShot))
  }

  test("st21: the stream-built index holds one code row per (vector, subspace)") {
    val sfTag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val idxPath = s"file:${new java.io.File(
      s"target/parity/st21-index-$sfTag").getAbsolutePath}"
    // the index is a SnapshotLog table (batchId-keyed commits) with
    // IN-LOOP MAINTENANCE: one KEYED commit per micro-batch is pinned via
    // the replay keys — maintenance compactions advance the version
    // counter and retention drops superseded manifests, so the version
    // number is deliberately NOT the batch count
    val v = graft.sources.SnapshotLog.latestVersion(spark, idxPath)
      .getOrElse(fail("st21 index has no commits"))
    val keys = graft.sources.SnapshotLog.commitKeys(spark, idxPath)
    assert(keys.count(_.startsWith("batch-")) == 4,
      s"4 arrival files => 4 batch replay keys, got $keys")
    val idx = graft.sources.SnapshotLog.read(spark, idxPath, v)
    val n = RelationalQueries.table(spark, sfDir, "embeddings").count()
    // one code row per (vector, subspace) — the subspace count comes from
    // the engine's PqM, not a hardcoded constant that could silently pin a
    // stale value if the codebook geometry ever changes
    assert(idx.count() == n * VectorQueries.PqM,
      s"expected ${n * VectorQueries.PqM} code rows, got ${idx.count()}")
    val dup = idx.groupBy("vec_id", "m").count().filter(col("count") > 1).count()
    assert(dup == 0, s"$dup duplicated (vec_id, m) code rows — a replayed batch leaked")
  }

  test("st21: in-loop maintenance bounds the index log and keeps the bin layout") {
    // reads the index the first test's run left behind (suite-ordered)
    val sfTag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val idxPath = s"file:${new java.io.File(
      s"target/parity/st21-index-$sfTag").getAbsolutePath}"
    val v = graft.sources.SnapshotLog.latestVersion(spark, idxPath).get
    // retention after each compaction keeps the live manifest count small
    // regardless of arrival count (4 batches here; a year of hourly
    // arrivals would otherwise accrete thousands): at most the compacted
    // head plus the batches landed since the last compaction
    val liveVersions = (1 to v).filter { i =>
      try { graft.sources.SnapshotLog.manifest(spark, idxPath, i); true }
      catch { case _: Throwable => false }
    }
    assert(liveVersions.size <= 3,
      s"expected a bounded manifest set, got ${liveVersions.size} live versions")
    // every live file still sits under a `_bin=` path level — serving's
    // probed-bin manifest prune survives compaction rewrites
    val mf = graft.sources.SnapshotLog.manifest(spark, idxPath, v)
    assert(mf.nonEmpty && mf.forall(_.contains("/_bin=")),
      s"compaction broke the bin-keyed manifest layout: ${mf.take(3)}")
    // per-bin file count is bounded by the compaction threshold (2) plus
    // deltas landed since the last compaction pass
    val perBin = mf.groupBy(f =>
      "/_bin=([^/]+)/".r.findFirstMatchIn(f).map(_.group(1)).getOrElse(""))
    perBin.foreach { case (b, fs) =>
      assert(fs.size <= 3, s"bin $b holds ${fs.size} files — compaction never ran")
    }
  }
}
