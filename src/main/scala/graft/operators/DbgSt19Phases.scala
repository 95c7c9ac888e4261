package graft.operators

import graft.GraftSession

/** Scratch: per-phase wall time of st19 at a given scale dir (hunting the
  * x10 slope) — stream half vs freeze half, plus per-trigger millis from
  * the query's own progress. Not part of any gate.
  */
object DbgSt19Phases {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/scale/x10"
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dbg] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val cfg = t("st19Config (incl. frozen fixtures)") {
      CorpusPipeline.st19Config(spark, dir)
    }
    println(s"[dbg] buckets pb=${cfg.pbN} gb=${cfg.gbN} sb=${cfg.sbN}")
    CorpusPipeline.wipeFsPath(spark, s"file:${cfg.stateRoot}")
    CorpusPipeline.wipeFsPath(spark, s"file:${cfg.ckptDir}")
    t("stream half")(CorpusPipeline.st19RunStream(spark, cfg, cfg.splitDir))
    println("[dbg] trigger millis: " +
      CorpusPipeline.lastStreamBatchMillis.mkString(", "))
    val res = t("freeze half")(CorpusPipeline.st19Freeze(spark, cfg))
    t("freeze collect")(res.collect().foreach(r => println(s"[dbg] $r")))
    spark.stop()
  }
}
