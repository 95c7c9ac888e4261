package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** graft_h60: digest-byte fast path vs the composed
  * conv(substr(md5(x),1,15),16,10) reference form, SQL registration,
  * null/unicode/empty edges.
  */
class Md5Prefix60Spec extends SparkSpec {

  test("matches conv(substr(md5)) over varied strings") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text").as("s"))
      .unionAll(Seq("", "a", "é世界", "tab\tsep", " lead trail ")
        .toDF("s"))
    val checked = docs.select(
      GraftFunctions.h60(col("s")).as("fast"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("ref"))
    assert(checked.filter(col("fast") =!= col("ref")).isEmpty)
  }

  test("registered in SQL; direct eval agrees with codegen path") {
    val r = spark.sql("SELECT graft_h60('spark') AS h").collect()(0).getLong(0)
    assert(r == Md5Prefix60.compute(UTF8String.fromString("spark")))
    intercept[Exception](spark.sql("SELECT graft_h60(1)").collect())
  }

  test("null propagates") {
    import spark.implicits._
    val r = Seq((1, None: Option[String])).toDF("i", "s")
      .select(GraftFunctions.h60(col("s"))).collect()
    assert(r(0).isNullAt(0))
  }
}
