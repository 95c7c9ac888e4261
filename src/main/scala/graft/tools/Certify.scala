package graft.tools

import graft.GraftSession

/** Insisted-healthy-window certification runs — the instrument for the two
  * numbers a whole-suite bench can never read cleanly on this host class
  * (thin healthy windows, multi-minute ambient flaps):
  *
  *  - `runMain graft.tools.Certify query <name> [sfDir] [reps]` — wait for
  *    a canary ≤ 1.15× anchor, then run `reps` timed reps of one gate
  *    query with a canary probe bracketing EVERY rep, and report the
  *    minimum over reps whose both-end probes were healthy. This is the
  *    s1_s2 recertification shape (r18 verdict #1): the most syscall-bound
  *    row, whose bench-run samples read 2× steady even in healthy runs.
  *
  *  - `runMain graft.tools.Certify st19freeze [factor] [nBatches]` — build
  *    st19's post-stream state at the scaled corpus UNTIMED (the stream
  *    half's decade is already adjudicated), then wait for a healthy
  *    window and time the FREEZE pass alone, canary-bracketed per rep.
  *    This is the r18 verdict #2 shape: the x100 freeze's 417 s sample
  *    spanned a 0.55→1.29-canary window and was "host-noise-bounded by
  *    argument"; one clean rep converts it to measured.
  *
  * Output: one JSON line per run (reps with bracketing canaries, the
  * healthy-rep minimum, the anchor) — recorded beside the adjudication
  * notes in SURVEY §8 / SCALESLOPE.json.
  */
object Certify {
  // Snapshotted ONCE per run (lazy val, forced at first use inside main):
  // a def would re-read the best-norm file on every comparison, so a
  // concurrent Bench updating it mid-run could classify the same rep
  // against different thresholds within one certification (r19 ADVICE).
  private lazy val anchor: Double = math.min(graft.Bench.HistoricalAnchor,
    graft.Bench.readBestNorm().getOrElse(Double.MaxValue))

  private val HealthyFactor = 1.15

  private def waitHealthy(spark: org.apache.spark.sql.SparkSession,
      maxRounds: Int): Double = {
    var c = graft.Bench.canary(spark)
    var rounds = 0
    while (c > HealthyFactor * anchor && rounds < maxRounds) {
      rounds += 1
      println(f"[certify] canary $c%.3f > $HealthyFactor x $anchor%.3f — " +
        f"waiting ($rounds/$maxRounds)")
      Thread.sleep(30000)
      c = graft.Bench.canary(spark)
    }
    c
  }

  /** Canary-bracketed timed reps of `body`; returns per-rep
    * (sec, canaryBefore, canaryAfter).
    */
  private def brackets(spark: org.apache.spark.sql.SparkSession, reps: Int,
      maxWaitRounds: Int)(body: => Unit): Seq[(Double, Double, Double)] =
    (1 to reps).map { i =>
      val cB = waitHealthy(spark, maxWaitRounds)
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      val cA = graft.Bench.canary(spark)
      println(f"[certify] rep $i: $sec%.2fs canary $cB%.3f/$cA%.3f")
      (sec, cB, cA)
    }

  private def report(tag: String, extra: String,
      rs: Seq[(Double, Double, Double)]): Unit = {
    val healthy = rs.filter { case (_, b, a) =>
      b <= HealthyFactor * anchor && a <= HealthyFactor * anchor }
    val repJson = rs.map { case (s, b, a) =>
      f"""{"sec":$s%.3f,"canary_before":$b%.3f,"canary_after":$a%.3f}"""
    }.mkString("[", ",", "]")
    val minHealthy =
      if (healthy.isEmpty) "null" else f"${healthy.map(_._1).min}%.3f"
    println(s"""{"certify":"$tag",$extra"anchor":${f"$anchor%.3f"},""" +
      s""""healthy_factor":$HealthyFactor,"reps":$repJson,""" +
      s""""n_healthy_reps":${healthy.size},""" +
      s""""min_sec":${f"${rs.map(_._1).min}%.3f"},""" +
      s""""min_healthy_sec":$minHealthy}""")
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.canary(spark) // JIT/committer warm, never timed

    mode match {
      case "query" =>
        val name = args(1)
        val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
        val reps = if (args.length > 3) args(3).toInt else 6
        val fn = graft.SparkEntry.queries(name)
        // one untimed warm rep: plan/codegen + fixture stamps out of band
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val rs = brackets(spark, reps, maxWaitRounds = 20) {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        report(name, s""""sf":"$sfDir",""", rs)

      case "st19freeze" =>
        val factor = if (args.length > 1) args(1).toInt else 100
        val nBatches = if (args.length > 2) args(2).toInt else 8
        val reps = if (args.length > 3) args(3).toInt else 2
        val dir = ScaleSlope.ensureScaled(spark, "/root/testdata/sf0.1", factor)
        println(s"[certify] building st19 flat state at x$factor (untimed)")
        graft.operators.CorpusPipeline.st19BuildFlatState(spark, dir, nBatches)
        spark.catalog.clearCache()
        val rs = brackets(spark, reps, maxWaitRounds = 40) {
          graft.operators.CorpusPipeline.st19FreezeOnly(spark, dir, nBatches)
        }
        report("st19_freeze_only", s""""scale":"x$factor",""", rs)

      case "st19freezeonly" =>
        // freeze-only reps over EXISTING flat state (built by a prior
        // st19freeze run) in a FRESH JVM — decouples the freeze
        // measurement from the same-JVM-as-build warm state the
        // `st19freeze` mode inherits (r20: its reps ran in the builder
        // JVM; this mode answers whether that flattered or hurt them)
        val factor = if (args.length > 1) args(1).toInt else 100
        val nBatches = if (args.length > 2) args(2).toInt else 8
        val reps = if (args.length > 3) args(3).toInt else 2
        val dir = ScaleSlope.ensureScaled(spark, "/root/testdata/sf0.1", factor)
        spark.catalog.clearCache()
        val rs = brackets(spark, reps, maxWaitRounds = 40) {
          graft.operators.CorpusPipeline.st19FreezeOnly(spark, dir, nBatches)
        }
        report("st19_freeze_only", s""""scale":"x$factor","fresh_jvm":true,""", rs)

      case "st19phases" =>
        // per-phase freeze decomposition over EXISTING flat state (built by
        // a prior st19freeze run): phases are short enough to certify
        // individually — each gets a post-phase canary, so a flap localizes
        // to the phases it landed on instead of poisoning the whole freeze
        val factor = if (args.length > 1) args(1).toInt else 100
        val nBatches = if (args.length > 2) args(2).toInt else 8
        val dir = ScaleSlope.ensureScaled(spark, "/root/testdata/sf0.1", factor)
        spark.catalog.clearCache()
        val c0 = waitHealthy(spark, maxRounds = 20)
        val phases = scala.collection.mutable.Buffer.empty[(String, Double, Double)]
        graft.operators.CorpusPipeline.st19FreezePhases(spark, dir, nBatches,
          (label, sec) => {
            val c = graft.Bench.canary(spark)
            println(f"[certify] phase $label: $sec%.2fs canary_after $c%.3f")
            phases += ((label, sec, c))
          })
        val pj = phases.map { case (l, s, c) =>
          f"""{"phase":"$l","sec":$s%.3f,"canary_after":$c%.3f}"""
        }.mkString("[", ",", "]")
        println(s"""{"certify":"st19_freeze_phases","scale":"x$factor",""" +
          s""""anchor":${f"$anchor%.3f"},"canary_start":${f"$c0%.3f"},""" +
          s""""total_sec":${f"${phases.map(_._2).sum}%.3f"},"phases":$pj}""")

      case other => sys.error(s"unknown certify mode: $other")
    }
    spark.stop()
  }
}
