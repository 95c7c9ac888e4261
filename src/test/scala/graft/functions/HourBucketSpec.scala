package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_hour_bucket: integer-math hour-partition id vs the date_format
  * reference implementation, plus SQL registration and codegen.
  */
class HourBucketSpec extends SparkSpec {

  test("compute matches date_format over random timestamps incl. edges") {
    import spark.implicits._
    val df = spark.range(0, 2000)
      // spread over ±50 years incl. pre-1970 (negative micros)
      .select((col("id") * 8123456789L - 1577880000000000L).as("us"))
      .select(timestamp_micros(col("us")).as("ts"))
    val checked = df.select(
      GraftFunctions.hourBucket(col("ts")).as("fast"),
      date_format(col("ts"), "yyyyMMddHH").cast("long").as("ref"))
    assert(checked.filter(col("fast") =!= col("ref")).isEmpty)
  }

  test("registered in SQL and codegen-compatible") {
    import spark.implicits._
    Seq("2023-06-27 12:14:03").toDF("s")
      .createOrReplaceTempView("hb_t")
    val r = spark.sql(
      "SELECT graft_hour_bucket(CAST(s AS TIMESTAMP)) AS b FROM hb_t").collect()
    assert(r(0).getLong(0) == 2023062712L)
    // type error surfaces at analysis
    intercept[Exception](
      spark.sql("SELECT graft_hour_bucket(1)").collect())
  }

  test("null propagates") {
    import spark.implicits._
    val r = Seq((1, None: Option[java.sql.Timestamp])).toDF("i", "ts")
      .select(GraftFunctions.hourBucket(col("ts"))).collect()
    assert(r(0).isNullAt(0))
  }
}
