package graft.operators

import org.apache.spark.sql.SparkSession

/** Session construction for micro-batch streaming bodies (st17–st28, st19).
  *
  * Every streaming query here runs its per-batch work on a CHILD session
  * (`newSession()` — own conf, shared SparkContext), so per-stream settings
  * can never leak into, or race with, concurrent work on the parent (the
  * u8 lesson, applied to conf scope). Two settings are applied:
  *
  *  - `spark.sql.shuffle.partitions = shufflePartitions`: per-batch shuffle
  *    width sized explicitly to the batch volume by each caller (gate-scale
  *    micro-batches are a few hundred rows; st19 scales it from its frozen
  *    per-batch stats). Scale-adaptive sizing here is the CALLER's job
  *    because AQE is off (below).
  *  - `spark.sql.adaptive.enabled = false`: AQE's value is runtime
  *    re-planning of LARGE shuffles (coalescing hundreds of empty
  *    partitions, splitting skewed ones). A micro-batch serve/ingest body
  *    shuffles batch-sized frames across an explicitly-sized small
  *    partition count, where AQE can improve nothing — but it still costs
  *    one extra driver re-optimization round + job per query stage, per
  *    action, per batch (measured on st22: 91 → 67 Spark jobs per run from
  *    this setting alone). This is a per-batch-volume decision, not a
  *    local-mode tune: a serving batch is small on any cluster; the BATCH
  *    jobs that scan the full corpus (index builds, the one-shot e-family
  *    queries) run on the parent session and keep AQE on.
  */
object StreamSessions {

  private[operators] def microBatch(spark: SparkSession,
      shufflePartitions: Int): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    ss.conf.set("spark.sql.adaptive.enabled", "false")
    ss
  }
}
