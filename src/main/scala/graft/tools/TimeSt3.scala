package graft.tools

import graft.GraftSession

/** Scratch phase profiler for st3 (stream-stream join); not part of any
  * gate.
  */
object TimeSt3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[st3] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    phase("warm export (via st1)") {
      graft.operators.IngestParityQueries.st1StreamingHourly(spark, sfDir).count()
    }
    phase("st3 (export cached)") {
      graft.operators.IngestParityQueries.st3StreamJoin(spark, sfDir).count()
    }
    val qn = "st3_join_" + sfDir.replaceAll("[^A-Za-z0-9]+", "_")
    spark.streams.active.foreach(_.stop())
    // progress of the finished run is not retrievable post-stop; rerun once
    // more to read progress
    val df = phase("st3 again") {
      graft.operators.IngestParityQueries.st3StreamJoin(spark, sfDir)
    }
    df.count()
    spark.sparkContext.setLogLevel("WARN")
    spark.stop()
  }
}
