package graft.operators

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch: band-bucket size distribution of x1's LSH stage at a scale
  * dir — localizes candidate-pair explosions (sum of B*(B-1)/2 over
  * buckets) and prints the top bucket keys so the offending shingles can
  * be identified. Not a gate.
  */
object DbgX1Lsh {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/scale/x10"
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = RelationalQueries.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val filt = CorpusPipeline.scrubbedQualityDocs(docs).localCheckpoint(true)
    println(s"[lsh] survivors: ${filt.count()}")
    val sh = DedupQueries.shingleFrameFrom(
      filt.select(col("doc_id"), col("text"), col("t"))).localCheckpoint(true)
    // shingle document-frequency tail: how many shingles are corpus-wide?
    val df = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .groupBy("s").agg(countDistinct("doc_id").as("df"))
      .localCheckpoint(true)
    println("[lsh] top-df shingles:")
    df.orderBy(col("df").desc).limit(12).collect()
      .foreach(r => println(f"  df=${r.getLong(1)}%8d  '${r.getString(0).take(60)}'"))
    // band bucket distribution
    val bands = DedupQueries.minhashBandsFrom(sh)
    val longBands = Seq("band0", "band1", "band2", "band3")
    longBands.foreach { b =>
      val sizes = bands.groupBy(col(b)).agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1) / 2).as("pairs"),
          max(col("n")).as("maxB"),
          sum(when(col("n") > 100, col("n")).otherwise(0)).as("docsInBig"))
        .collect()(0)
      println(s"[lsh] $b: pairs=${sizes.get(0)} maxBucket=${sizes.get(1)} " +
        s"docsInBuckets>100=${sizes.get(2)}")
    }
    spark.stop()
  }
}
