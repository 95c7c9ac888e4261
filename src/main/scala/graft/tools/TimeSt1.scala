package graft.tools

import graft.GraftSession

/** Throwaway phase profiler for st1 (streaming hourly stats): separates the
  * TSV export, the streaming run, and the read-back so local-FS cost is
  * attributed correctly. Not part of any gate.
  */
object TimeSt1 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[st1] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // warm: export happens inside the first call; second call reuses cache
    phase("full st1 (incl export)") {
      graft.operators.IngestParityQueries.st1StreamingHourly(spark, sfDir).count()
    }
    phase("st1 again (export cached)") {
      graft.operators.IngestParityQueries.st1StreamingHourly(spark, sfDir).count()
    }
    // fine-grained: stream vs read-back (mirrors st1StreamingHourly's body)
    locally {
      import org.apache.spark.sql.functions.col
      val raw = s"file:" + new java.io.File(s"target/parity/raw-full-" +
        sfDir.replaceAll("[^A-Za-z0-9.]+", "_")).getAbsolutePath
      val stats = new java.io.File("target/parity/t-stats").getAbsolutePath
      val ckpt = new java.io.File("target/parity/t-ckpt").getAbsolutePath
      def wipe(d: String): Unit = {
        def rec(f: java.io.File): Unit = {
          val cs = f.listFiles(); if (cs != null) cs.foreach(rec); f.delete()
        }
        rec(new java.io.File(d)); new java.io.File(d).mkdirs()
      }
      wipe(stats); wipe(ckpt)
      val cfg = graft.core.IngestConfig(raw, "unused",
        graft.operators.IngestParityQueries.eventsSchema, "ts", "user_id")
      val q = phase("start+await streaming") {
        val q0 = graft.streaming.StreamingIngest.hourlyStats(
          spark, cfg, s"file:$stats", ckpt, graceMinutes = 40)
        q0.awaitTermination(); q0
      }
      phase("read-back stats") {
        spark.read.option("basePath", s"file:$stats").parquet(s"file:$stats")
          .select(col("hour_ts"), col("cnt")).count()
      }
      q.recentProgress.foreach { p =>
        System.err.println(s"[st1] batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
      }
    }
    spark.stop()
  }
}
