package graft.tools

/** Standalone host-health probe: runs `Bench`'s OWN canary job (shared
  * code, not a copy — the probe must mirror the detector exactly) N times
  * and prints each wall second next to the same anchor the bench would
  * use (compiled historical floor, lowered by the persisted
  * `.bench-anchor` best-ever). Use before/after an isolated TimeQuery run
  * to adjudicate whether a number is host-shaped or code-shaped without
  * paying a full bench. Usage: runMain graft.tools.CanaryProbe [reps]
  */
object CanaryProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val anchor = math.min(graft.Bench.HistoricalAnchor,
      graft.Bench.readBestNorm().getOrElse(Double.MaxValue))
    graft.Bench.canary(spark) // JIT/committer warm (never timed — r10 rule)
    val vals = (1 to reps).map(_ => graft.Bench.canary(spark))
    vals.zipWithIndex.foreach { case (v, i) =>
      println(f"[canary] probe ${i + 1}: $v%.3fs (anchor $anchor%.3fs)")
    }
    println(f"[canary] min=${vals.min}%.3f ratio_to_anchor=${vals.min / anchor}%.2f")
    spark.stop()
  }
}
