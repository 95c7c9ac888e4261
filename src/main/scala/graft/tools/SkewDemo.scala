package graft.tools

import graft.operators.{RelationalQueries, SkewUtils}
import org.apache.spark.sql.functions._

/** Runnable example of the skew-mitigation utilities: salted aggregation and
  * salted join vs their plain equivalents on the events table.
  *
  *   sbt "runMain graft.tools.SkewDemo [sfDir]"
  */
object SkewDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.builder("local[4]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val events = RelationalQueries.table(spark, sfDir, "events")
    println("== plain groupBy:")
    events.groupBy("event_type")
      .agg(sum("user_id").as("sum_user_id"), count(lit(1)).as("cnt"))
      .orderBy("event_type").show()
    println("== salted (8 buckets), must be identical:")
    SkewUtils.saltedSumCount(events, Seq("event_type"), "user_id", "event_id", 8)
      .orderBy("event_type").show()

    val dim = spark.createDataFrame(Seq(
      ("click", 1), ("view", 2), ("purchase", 3), ("signup", 4), ("error", 5)
    )).toDF("event_type", "type_code")
    val plain = events.join(dim, "event_type").count()
    val salted = SkewUtils.saltedJoin(events, dim, "event_type", "event_id", 8).count()
    println(s"== join rows: plain=$plain salted=$salted identical=${plain == salted}")
    spark.stop()
  }
}
