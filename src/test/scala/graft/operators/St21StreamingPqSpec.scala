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
    // the index is a SnapshotLog table now (batchId-keyed commits): read
    // the latest manifest, and pin one commit per micro-batch
    val v = graft.sources.SnapshotLog.latestVersion(spark, idxPath)
      .getOrElse(fail("st21 index has no commits"))
    assert(v == 4, s"4 arrival files => 4 keyed commits, got version $v")
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
}
