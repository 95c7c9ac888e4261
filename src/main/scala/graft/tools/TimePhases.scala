package graft.tools

/** Splits a gate query's wall time into plan (analyze+optimize+physical)
  * vs execute. Usage: runMain graft.tools.TimePhases <name> [sfDir] [reps]
  */
object TimePhases {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis->physical planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[phases] $name run $i: build ${(t1 - t0) / 1e9}%.2fs " +
        f"plan ${(t2 - t1) / 1e9}%.2fs exec ${(t3 - t2) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
