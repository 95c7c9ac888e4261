package graft.operators

import graft.SparkSpec
import graft.sources.HashCensus
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** The d37 incremental-dedup read-side contract: the batch probe touches
  * ONLY the hash census, never the prior cut's data files — the fix for
  * "cost ∝ corpus per batch" on the read side.
  */
class D37CensusSpec extends SparkSpec {

  // AQE-safe plan flattening: descend through the adaptive wrapper and
  // materialized query stages, which TreeNode.collect does not cross
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
    case q: QueryStageExec => nodes(q.plan)
    case other => other.children.flatMap(nodes)
  })

  test("d37 probe reads only census files, not v1 data; census stays the exact v2 hash set") {
    val out = TextQueries.d37IncrementalDedup(spark, sfDir).collect()
    assert(out.nonEmpty)

    // Rebuild the exact probe plan d37 ran: batch anti-joined against the
    // census. Every file it scans must be the census table or the batch's
    // source documents — never the snapshot's data/ tree.
    val census = TextQueries.d37CensusName(sfDir)
    val batch = TextQueries.d37CanonDocs(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(5)) === 0)
    val probe = batch.join(HashCensus.probe(spark, census), Seq("h"), "left_anti")
    probe.collect()
    val files = nodes(probe.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s.relation.location.inputFiles.toSeq }
      .flatten
    assert(files.nonEmpty)
    val offenders = files.filterNot(f =>
      f.contains(s"/${census.toLowerCase}") || f.contains("documents.parquet"))
    assert(offenders.isEmpty,
      s"probe scanned beyond census + batch source: ${offenders.take(3)}")
    assert(!files.exists(_.contains("incdedup-")),
      "probe must not rescan the prior snapshot cut")

    // The census equals the v2 cut's distinct hash set (bootstrap ∪ kept
    // appends, disjoint by construction) — probe-by-census ≡ probe-by-cut.
    val sfTag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val snapDir = new java.io.File(s"target/parity/incdedup-$sfTag").getAbsolutePath
    val v2 = graft.sources.SnapshotLog.latestVersion(spark, s"file:$snapDir").get
    val cutHashes = graft.sources.SnapshotLog
      .read(spark, s"file:$snapDir", v2)
      .select("h").distinct().collect().map(_.getString(0)).toSet
    val censusHashes = HashCensus.probe(spark, census)
      .collect().map(_.getString(0)).toSet
    assert(censusHashes == cutHashes,
      s"census drifted from cut: ${censusHashes.size} vs ${cutHashes.size}")

    // Bucketed probe: with broadcast off, the anti-join plans EXACTLY ONE
    // shuffle — the batch side repartitioning to the census bucket count.
    // The census side flows from its bucketed scan straight into the join;
    // a second exchange would mean the census re-shuffles per batch, the
    // thing the bucketed layout exists to prevent at 10^10 hashes.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p2 = batch.join(HashCensus.probe(spark, census), Seq("h"), "left_anti")
      p2.collect()
      val all = nodes(p2.queryExecution.executedPlan)
      val shuffles = all.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size == 1,
        s"expected 1 exchange (batch side only), got ${shuffles.size}:\n$shuffles")
      val bucketedScans = all.collect {
        case s: FileSourceScanExec if s.bucketedScan => s
      }
      assert(bucketedScans.nonEmpty, "census must be read as a bucketed scan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
