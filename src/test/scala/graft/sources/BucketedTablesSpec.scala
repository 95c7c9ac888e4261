package graft.sources

import graft.SparkSpec
import graft.operators.RelationalQueries
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

class BucketedTablesSpec extends SparkSpec {

  test("bucketed join plans with zero shuffle exchanges and matches plain join") {
    val orders = RelationalQueries.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = RelationalQueries.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    BucketedTables.save(orders, "bt_orders", "o_orderkey", 8)
    BucketedTables.save(lineitem, "bt_lineitem", "o_orderkey", 8)

    val joined = BucketedTables.bucketedJoin(spark, "bt_orders", "bt_lineitem",
      "o_orderkey")
    val exec = joined.queryExecution.executedPlan
    val shuffles = exec.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.isEmpty,
      s"expected shuffle-free bucketed join, got:\n${exec.treeString}")

    val plain = orders.join(lineitem, "o_orderkey").count()
    assert(joined.count() == plain)

    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
  }
}
