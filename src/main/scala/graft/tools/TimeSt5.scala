package graft.tools

import graft.GraftSession

/** Throwaway phase profiler for st5 (sliding windows): runs the gate query
  * twice (export memoized after the first) and dumps the streaming
  * progress durations of the second run's batches. Not part of any gate.
  */
object TimeSt5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[st5] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val l = spark.streams
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        System.err.println(s"[st5] batch=${e.progress.batchId} rows=${e.progress.numInputRows} durations=${e.progress.durationMs}")
    }
    l.addListener(listener)
    phase("st5 run 1 (incl export)") {
      graft.operators.IngestParityQueries.st5SlidingWindow(spark, sfDir).count()
    }
    phase("st5 run 2") {
      graft.operators.IngestParityQueries.st5SlidingWindow(spark, sfDir).count()
    }
    phase("st1 run (warm)") {
      graft.operators.IngestParityQueries.st1StreamingHourly(spark, sfDir).count()
    }
    spark.stop()
  }
}
