package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException

/** Guard parity with BigQuery `require_partition_filter=TRUE`
  * (`/root/reference/bq_create_table_ddl.sql:10-13`).
  */
class RequirePartitionFilterSpec extends SparkSpec {

  var table: String = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    val dir = java.nio.file.Files.createTempDirectory("graft-rpf").toString
    table = s"file:$dir"
    import spark.implicits._
    Seq((1, "2023", "06"), (2, "2023", "07"), (3, "2024", "01"))
      .toDF("v", "year", "month")
      .write.mode("overwrite").partitionBy("year", "month").parquet(table)
  }

  override def afterAll(): Unit = { RequirePartitionFilter.clear(); super.afterAll() }

  test("unprotected table: full scan fine") {
    RequirePartitionFilter.clear()
    assert(spark.read.parquet(table).count() == 3)
  }

  test("protected: full scan rejected at execution, filtered scan allowed") {
    RequirePartitionFilter.protect(table)
    val df = spark.read.parquet(table) // eager analysis must NOT throw
    val e = intercept[Exception](df.count())
    assert(e.getMessage.contains("partition-filter-required"))
    // late .filter on the same dataset works (enforcement is per action)
    assert(df.filter("year = '2023'").count() == 2)
    // non-partition filter is NOT enough
    val e2 = intercept[Exception](df.filter("v > 0").count())
    assert(e2.getMessage.contains("partition-filter-required"))
  }

  test("protected: direct per-partition path scan allowed (path IS the filter)") {
    RequirePartitionFilter.protect(table)
    assert(spark.read.option("basePath", table)
      .parquet(s"$table/year=2023/month=06").count() == 1)
  }

  test("protected: SQL over the table requires the filter too") {
    RequirePartitionFilter.protect(table)
    spark.read.parquet(table).createOrReplaceTempView("rpf_landing")
    intercept[Exception](spark.sql("select count(*) from rpf_landing").collect())
    assert(spark.sql(
      "select count(*) c from rpf_landing where year = '2024'").collect()(0).getLong(0) == 1)
  }
}
