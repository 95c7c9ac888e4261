package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities: deterministic salting for aggregations and
  * joins whose key distribution is heavy-tailed (the "one hot user/device
  * drowns an executor" problem at 100 TB).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these helpers
  * cover the cases AQE does not: skewed aggregation keys, and broadcast-side
  * replication where the planner can't split a straggler partition.
  *
  * Salts are DETERMINISTIC (hash-derived, not `rand()`): re-runs produce
  * identical plans and results, keeping the engine's idempotency/retry story
  * intact.
  */
object SkewUtils {

  private def saltCol(on: Column, buckets: Int): Column =
    pmod(xxhash64(on), lit(buckets))

  /** Two-phase salted sum/count: phase 1 aggregates on (key, salt) spreading
    * a hot key over `buckets` reducers; phase 2 combines per key. Output
    * equals a plain `groupBy(key).agg(sum, count)` exactly (sum of longs /
    * decimals is associative; doubles should be routed through decimal by
    * the caller, as everywhere else in this engine).
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltSource: String, buckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", saltCol(col(saltSource), buckets))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Salted equi-join of a skewed LARGE side against a SMALL side: the large
    * side's rows get a deterministic salt in [0, buckets); the small side is
    * replicated `buckets` times; the join key becomes (key, salt). Result
    * equals `large.join(small, key)` exactly, but a hot key's rows spread
    * over `buckets` tasks instead of one.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltSource: String, buckets: Int = 16): DataFrame = {
    val saltedLarge = large.withColumn("__salt", saltCol(col(saltSource), buckets))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedLarge.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
