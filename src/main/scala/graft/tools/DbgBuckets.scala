package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch: LSH band-bucket size distribution at a given scale dir (hunting
  * the d13 x100 superlinearity); not part of any gate.
  */
object DbgBuckets {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/scale/x100"
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sig = graft.operators.DedupQueries.d7MinhashSig(spark, dir)
    val bands = sig.select(col("doc_id"),
      posexplode(array(col("band0"), col("band1"), col("band2"), col("band3")))
        .as(Seq("band_idx", "bkey")))
    val sizes = bands.groupBy("band_idx", "bkey").agg(count(lit(1)).as("n"))
    sizes.orderBy(col("n").desc).show(20, false)
    sizes.agg(sum(col("n") * (col("n") - 1) / 2).as("candidate_pairs_with_dup"),
      count(lit(1)).as("n_buckets")).show(false)
    spark.stop()
  }
}
