package graft.operators

import graft.SparkSpec
import graft.sources.MutationOps
import org.apache.spark.sql.functions._

/** Invariants of the round-6 operators (the oracle gate proves value
  * equality against duckdb; these prove the semantic shape).
  */
class Round6QueriesSpec extends SparkSpec {

  test("u5/scd2: versions are contiguous, compressed, and chain validity") {
    val scd = MaintenanceQueries.u5Scd2(spark, sfDir).cache()
    try {
      // exactly one open (is_current) version per key, and it is the last one
      val perKey = scd.groupBy("user_id").agg(
        count(lit(1)).as("n"), max(col("version")).as("max_v"),
        sum(when(col("is_current"), 1).otherwise(0)).as("n_open"))
      assert(perKey.filter(col("n_open") =!= 1).isEmpty)
      // version numbering is 1..n without gaps
      assert(perKey.filter(col("max_v") =!= col("n")).isEmpty)

      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("version")
      val chained = scd
        .withColumn("next_from", lead(col("effective_from"), 1).over(w))
        .withColumn("next_attr", lead(col("event_type"), 1).over(w))
      // [from, to) ranges chain exactly: effective_to == next version's from
      assert(chained.filter(col("next_from").isNotNull &&
        !(col("effective_to") <=> col("next_from"))).isEmpty)
      // change compression: consecutive versions never carry an equal state
      assert(chained.filter(col("next_attr").isNotNull &&
        col("event_type") <=> col("next_attr")).isEmpty)
      // only the open version has a null effective_to
      assert(scd.filter(col("effective_to").isNull =!= col("is_current")).isEmpty)
    } finally scd.unpersist()
  }

  test("scd2 rejects reserved internal column names in snapshotDiff") {
    val df = spark.range(3).select(col("id"),
      lit(1).as("__graft_diff_old_present"))
    intercept[IllegalArgumentException] {
      MutationOps.snapshotDiff(df, df, Seq("id"),
        Seq("__graft_diff_old_present"))
    }
  }

  test("e14: every neighbor shares the query's IVF bin; scores match e11") {
    val asg = DedupQueries.e4IvfAssign(spark, sfDir)
      .select(col("vec_id"), col("centroid_id"))
    val out = VectorQueries.e14IvfPq(spark, sfDir).cache()
    try {
      // bin containment: neighbor's centroid == query's centroid
      val crossBin = out
        .join(asg.withColumnRenamed("vec_id", "query_id")
          .withColumnRenamed("centroid_id", "q_bin"), "query_id")
        .join(asg.withColumnRenamed("vec_id", "neighbor_id")
          .withColumnRenamed("centroid_id", "n_bin"), "neighbor_id")
        .filter(col("q_bin") =!= col("n_bin"))
      assert(crossBin.isEmpty)
      // agreement with the unpruned ADC scorer on the pairs both produce:
      // identical (query, neighbor) => identical score
      val e11 = VectorQueries.e11PqAdc(spark, sfDir, k = 50)
        .select(col("query_id"), col("neighbor_id"), col("pq_sim"))
      val joined = out.join(e11, Seq("query_id", "neighbor_id"))
      assert(joined.filter(!(col("ivfpq_sim") <=> col("pq_sim"))).isEmpty)
    } finally out.unpersist()
  }

  test("q44: the recursion covers every customer exactly once") {
    val out = RelationalQueries.q44RecursiveCte(spark, sfDir)
    val agg = out.agg(sum(col("n_nodes")), max(col("max_depth"))).collect()(0)
    val nCustomers = RelationalQueries.table(spark, sfDir, "customer").count()
    assert(agg.getLong(0) == nCustomers) // tree partitions the key space
    assert(agg.getInt(1) >= 1)
  }

  test("q45: listagg output is the ordered concatenation") {
    val rows = RelationalQueries.q45Listagg(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val parts = r.getString(1).split(",").toSeq
      assert(parts == parts.sorted)
      assert(parts.length == r.getLong(2))
    }
  }

  test("e15: trained bins partition the corpus and centroids are finite") {
    val out = VectorQueries.e15Kmeans(spark, sfDir).cache()
    try {
      val n = RelationalQueries.table(spark, sfDir, "embeddings").count()
      val agg = out.agg(sum(col("n_assigned")), count(lit(1))).collect()(0)
      assert(agg.getLong(0) == n) // every vector lands in exactly one bin
      assert(agg.getLong(1) <= 4 && agg.getLong(1) >= 1)
      assert(out.filter(col("centroid_norm").isNull ||
        col("centroid_norm") <= 0.0).isEmpty)
    } finally out.unpersist()
  }

  test("d28: exactly k keywords per doc, ranked by non-increasing score") {
    val out = TextQueries.d28Tfidf(spark, sfDir).cache()
    try {
      val perDoc = out.groupBy("doc_id").agg(count(lit(1)).as("n"))
      assert(perDoc.filter(col("n") =!= 3).isEmpty)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("doc_id").orderBy("rank")
      val mono = out.withColumn("next_s", lead(col("tfidf"), 1).over(w))
      assert(mono.filter(col("next_s").isNotNull &&
        col("next_s") > col("tfidf")).isEmpty)
    } finally out.unpersist()
  }
}
