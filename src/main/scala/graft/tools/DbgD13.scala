package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch: d13 phase attribution at a scale dir; not part of any gate. */
object DbgD13 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/scale/x100"
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[d13] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    phase("shingledDocs count") {
      graft.operators.DedupQueries.shingledDocs(spark, dir).count()
    }
    phase("shingledDocs count (cached)") {
      graft.operators.DedupQueries.shingledDocs(spark, dir).count()
    }
    phase("d7 sig count") {
      graft.operators.DedupQueries.d7MinhashSig(spark, dir).count()
    }
    phase("full d13 noop") {
      graft.operators.DedupQueries.d13LshPairs(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    phase("full d13 noop again") {
      graft.operators.DedupQueries.d13LshPairs(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
