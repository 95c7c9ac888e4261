package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** st23 streaming filtered compressed-index serving: streamed ≡ e33's
  * one-shot answer (the shared filteredPqServeBatch plan), exactly-once
  * commits by replay key, and the bounded result log under in-loop
  * maintenance.
  */
class St23StreamingFilteredServeSpec extends SparkSpec {

  private lazy val streamed =
    VectorQueries.st23StreamingFilteredServe(spark, sfDir).collect()

  private def key(r: org.apache.spark.sql.Row) =
    (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
      r.getAs[Long]("neighbor_id"), r.getAs[Double]("refined_sim"))

  test("st23: streamed filtered serving equals e33's one-shot answer") {
    // per-query results depend only on (embedding, frozen index, frozen
    // predicate), so the batchId-keyed log's union over arrival batches
    // must equal one e33 pass over the whole query set
    val got = streamed.map(key).sortBy(t => (t._1, t._2))
    val exp = VectorQueries.e33FilteredPqServe(spark, sfDir)
      .collect().map(key).sortBy(t => (t._1, t._2))
    assert(got.length == exp.length && got.nonEmpty)
    assert(got.sameElements(exp))
  }

  test("st23: every served neighbor satisfies the predicate") {
    // the filter is PRE-applied at the code scan; no out-of-predicate
    // candidate may survive to the refined top-k
    val allowed = RelationalQueries.table(spark, sfDir, "embeddings")
      .filter(col("label").isin(1, 3, 5))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(streamed.nonEmpty)
    streamed.foreach { r =>
      assert(allowed(r.getAs[Long]("neighbor_id")),
        s"neighbor outside the predicate served: $r")
    }
  }

  test("st23: a non-default predicate through the loop equals e34's one-shot") {
    // the loop's predicate axis is generic, not baked to the gate fixture:
    // e34's range predicate threaded through the SAME streaming loop
    // (namespaced state) must reproduce e34's one-shot answer exactly
    val got = VectorQueries.st23StreamingFilteredServe(spark, sfDir,
        pred = col("label") >= 6, stateTag = "-e34pred")
      .collect().map(key).sortBy(t => (t._1, t._2))
    val exp = VectorQueries.e34FilteredServeRange(spark, sfDir)
      .collect().map(key).sortBy(t => (t._1, t._2))
    assert(got.length == exp.length && got.nonEmpty)
    assert(got.sameElements(exp))
  }

  test("st23: one batchId-keyed commit per arrival file; log stays bounded") {
    assert(streamed.forall(_.getAs[Int]("n_commits") == 4))
    val sfTag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val path = s"file:${new java.io.File(
      s"target/parity/st23-results-$sfTag").getAbsolutePath}"
    val v = graft.sources.SnapshotLog.latestVersion(spark, path).get
    assert(graft.sources.SnapshotLog.commitKeys(spark, path)
      .count(_.startsWith("batch-")) == 4)
    val liveVersions = (1 to v).filter { i =>
      try { graft.sources.SnapshotLog.manifest(spark, path, i); true }
      catch { case _: Throwable => false }
    }
    assert(liveVersions.size <= 3,
      s"unbounded result-log history: ${liveVersions.size} live versions")
  }
}
