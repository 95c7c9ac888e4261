package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salting must be a pure physical rewrite: results identical to the
  * unsalted operator, hot keys spread deterministically.
  */
class SkewUtilsSpec extends SparkSpec {

  lazy val events = RelationalQueries.table(spark, sfDir, "events")

  test("saltedSumCount equals plain groupBy sum/count") {
    val plain = events.groupBy("event_type")
      .agg(sum(col("user_id")).as("sum_user_id"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SkewUtils.saltedSumCount(events, Seq("event_type"),
      "user_id", saltSource = "event_id", buckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val dim = spark.createDataFrame(Seq(
      ("click", 1), ("view", 2), ("purchase", 3), ("signup", 4), ("error", 5)
    )).toDF("event_type", "type_code")
    val plain = events.join(dim, "event_type")
      .select("event_id", "type_code")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val salted = SkewUtils.saltedJoin(events, dim, "event_type",
      saltSource = "event_id", buckets = 8)
      .select("event_id", "type_code")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(salted == plain)
    // determinism: same salt assignment on re-run
    val c1 = SkewUtils.saltedJoin(events, dim, "event_type", "event_id", 8).count()
    val c2 = SkewUtils.saltedJoin(events, dim, "event_type", "event_id", 8).count()
    assert(c1 == c2 && c1 == plain.size)
  }
}
