package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE is the engine's third skew answer next to deterministic salting
  * (q28/q31): the session enables `adaptive.skewJoin`, and this spec proves
  * the runtime re-plan actually ENGAGES — a sort-merge join with one hot key
  * gets its oversized partition split at execution time (`isSkew=true` in
  * the final adaptive plan), with results identical to the static plan. The
  * thresholds are lowered only because local fixtures are small; at real
  * scale the defaults (256 MB) trigger the same path.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the hot-key partition of a skewed sort-merge join") {
    import spark.implicits._
    val tweaks = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val saved = tweaks.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      tweaks.foreach { case (k, v) => spark.conf.set(k, v) }
      // left: 50k rows of one hot key + uniform tail on disjoint keys;
      // right: small dim covering all keys
      val left = spark.range(60000L)
        .select(when($"id" < 50000L, lit(7L))
          .otherwise(($"id" % 96L) + 100L).as("k"),
          $"id".as("payload"))
      val right = (Seq(7L) ++ (100L until 196L)).toDF("k")
        .withColumn("w", $"k" * 10L)
      // assert on the bare join: a parent that REQUIRES hash distribution
      // (e.g. a groupBy on the join key) legitimately suppresses the split
      // — AQE won't trade the skew for an extra shuffle
      val joined = left.join(right, "k").select("k", "payload")

      val rows = joined.collect()
      assert(rows.length == 60000, rows.length)
      assert(rows.count(_.getLong(0) == 7L) == 50000,
        "hot key must join once per left row")

      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("isSkew=true") || finalPlan.contains("skew=true"),
        s"expected a skew-split join partition in the final adaptive plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
