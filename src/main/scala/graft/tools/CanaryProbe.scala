package graft.tools

/** Standalone host-health probe: runs Bench's exact canary job (48-task
  * small-parquet create/list/read/delete — the syscall-shaped work the
  * host flap hits hardest) N times and prints each wall second next to the
  * compiled healthy anchor. Use before/after an isolated TimeQuery run to
  * adjudicate whether a number is host-shaped or code-shaped without
  * paying a full bench. Usage: runMain graft.tools.CanaryProbe [reps]
  */
object CanaryProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def canary(): Double = {
      val t0 = System.nanoTime()
      val dir = "target/bench-canary-probe"
      spark.range(0, 48, 1, 48).write.mode("overwrite").parquet(dir)
      require(spark.read.parquet(dir).count() == 48, "canary lost rows")
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      (System.nanoTime() - t0) / 1e9
    }
    canary() // JIT/committer warm (never timed — the r10 shakedown rule)
    val vals = (1 to reps).map(_ => canary())
    vals.zipWithIndex.foreach { case (v, i) =>
      println(f"[canary] probe ${i + 1}: $v%.3fs (healthy anchor ~0.358s)")
    }
    println(f"[canary] min=${vals.min}%.3f ratio_to_anchor=${vals.min / 0.358}%.2f")
    spark.stop()
  }
}
