package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_cclass: bitmap single-pass counts vs the regex reference forms,
  * over the corpus plus adversarial edge strings.
  */
class CharClassCountSpec extends SparkSpec {

  private def corpusPlusEdges = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text").as("s"))
      .unionAll(Seq(
        "", "   ", "a", "1a2b3c", "¡é世界! a1 ±", "tab\there\nlinevt\f\r",
        "ALL CAPS 42!!", "..a..b..", "ünïcödé wörds"
      ).toDF("s"))
  }

  test("runs == size(regexp_extract_all('[set]+'))") {
    val checked = corpusPlusEdges.select(
      GraftFunctions.cclass(lower(col("s")), "runs", "abcdefghijklmnopqrstuvwxyz").as("fast"),
      size(regexp_extract_all(lower(col("s")), lit("[a-z]+"), lit(0))).as("ref"),
      GraftFunctions.cclass(col("s"), "runs", "0123456789").as("fastn"),
      size(regexp_extract_all(col("s"), lit("[0-9]+"), lit(0))).as("refn"))
    assert(checked.filter(col("fast") =!= col("ref") || col("fastn") =!= col("refn")).isEmpty)
  }

  test("count == length(regexp_replace('[^set]',''))") {
    val checked = corpusPlusEdges.select(
      GraftFunctions.cclass(col("s"), "count", ".!?,;:").as("fast"),
      length(regexp_replace(col("s"), "[^.!?,;:]", "")).as("ref"))
    assert(checked.filter(col("fast") =!= col("ref")).isEmpty)
  }

  test("count_not == size(regexp_extract_all('[^a-zA-Z0-9\\s]')) incl. non-ASCII") {
    val set = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 \t\n\f\r"
    val checked = corpusPlusEdges.select(
      GraftFunctions.cclass(col("s"), "count_not", set).as("fast"),
      size(regexp_extract_all(col("s"), lit("[^a-zA-Z0-9\\s]"), lit(0))).as("ref"))
    assert(checked.filter(col("fast") =!= col("ref")).isEmpty)
  }

  test("SQL registration, literal enforcement, null propagation") {
    import spark.implicits._
    val r = spark.sql("SELECT graft_cclass('a1 b2', 'runs', 'ab') AS c").collect()
    assert(r(0).getInt(0) == 2)
    intercept[Exception](
      spark.sql("SELECT graft_cclass('x', lower('RUNS'), 'ab')").collect())
    val n = Seq((1, None: Option[String])).toDF("i", "s")
      .select(GraftFunctions.cclass(col("s"), "count", "x")).collect()
    assert(n(0).isNullAt(0))
  }
}
