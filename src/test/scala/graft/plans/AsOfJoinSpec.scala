package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native as-of join: exec semantics vs a window-composition reference,
  * plan shape, and edge cases (no match, exact-tie time, key boundaries).
  */
class AsOfJoinSpec extends SparkSpec {

  test("matches the union+window composition on the events table") {
    import spark.implicits._
    val events = graft.operators.RelationalQueries.eventsTable(spark, sfDir)
    val left = events.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("tsl"))
    val right = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), unix_micros(col("ts")).as("p_tsl"))
      .agg(max(col("value")).as("p_val"))

    val native = AsOfJoin.asof(left, right, "user_id", "p_user", "tsl", "p_tsl")
      .select("event_id", "p_tsl", "p_val")

    // reference: union left(probe) + right(state), last_value of state cols
    // over (key, time) ordering with probes after states on ties
    val probes = left.select(col("user_id").as("k"), col("tsl").as("t"),
      lit(1).as("is_probe"), col("event_id"),
      lit(null).cast("long").as("s_tsl"), lit(null).cast("double").as("s_val"))
    val states = right.select(col("p_user").as("k"), col("p_tsl").as("t"),
      lit(0).as("is_probe"), lit(null).cast("long").as("event_id"),
      col("p_tsl").as("s_tsl"), col("p_val").as("s_val"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("t"), col("is_probe"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ref = probes.unionAll(states)
      .withColumn("r_tsl", last(col("s_tsl"), ignoreNulls = true).over(w))
      .withColumn("r_val", last(col("s_val"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col("event_id"), col("r_tsl").as("p_tsl"), col("r_val").as("p_val"))

    assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty)
    assert(native.count() == left.count())
  }

  test("edge cases: exact tie joins, no-match yields nulls, keys isolated") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L), (3L, 7L, 103L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (2L, 6L, 3.0), (9L, 1L, 9.9))
      .toDF("rk", "rt", "v")
    val out = AsOfJoin.asof(left, right, "k", "rk", "t", "rt")
      .select("lid", "rt", "v").collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    assert(out == Set(
      (100L, 10L, 1.0),   // exact tie rt == t joins
      (101L, 15L, 2.0),   // latest of two candidates
      (102L, -1L, -1.0),  // right exists for key but only later -> null
      (103L, -1L, -1.0))) // no right rows for key -> null
  }

  test("contract enforced: non-Long columns fail fast, nulls never match") {
    import spark.implicits._
    // INT key: must fail fast with a clear message, not merge garbage
    val intKey = Seq((1, 10L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(intKey, right, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("LongType"), e.getMessage)

    // null left key/time -> null right side; null right rows never match
    val left = Seq((Some(1L), Some(10L), 100L), (None, Some(10L), 101L),
      (Some(1L), None, 102L)).toDF("k", "t", "lid")
    val rightN = Seq((Some(1L), Some(5L), 1.0), (Some(1L), None, 7.7),
      (None, Some(1L), 8.8)).toDF("rk", "rt", "v")
    val out = AsOfJoin.asof(left, rightN, "k", "rk", "t", "rt")
      .select("lid", "v").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toSet
    assert(out == Set((100L, 1.0), (101L, -1.0), (102L, -1.0)), out)
  }

  test("self-join without re-aliasing gets fresh right-side exprIds") {
    import spark.implicits._
    val df = Seq((1L, 10L, 5.0), (1L, 20L, 6.0)).toDF("k", "t", "v")
    // same analyzed attributes on both sides — asof() must re-alias
    val out = AsOfJoin.asof(df, df, "k", "k", "t", "t")
    assert(out.columns.toSeq == Seq("k", "t", "v", "k", "t", "v"))
    // output attrs must be distinct expr ids (no ambiguous duplicates)
    val ids = out.queryExecution.analyzed.output.map(_.exprId).distinct
    assert(ids.length == 6, ids)
    // every left row self-matches at its own time (exact tie)
    val vals = out.collect().map(r => (r.getLong(1), r.getDouble(5))).toSet
    assert(vals == Set((10L, 5.0), (20L, 6.0)), vals)
  }

  test("plan contains the custom exec and exactly two exchanges") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "v")
    val df = AsOfJoin.asof(left, right, "k", "rk", "t", "rt")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"))
  }
}
