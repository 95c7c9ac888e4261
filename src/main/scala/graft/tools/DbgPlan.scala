package graft.tools

import graft.GraftSession

/** Scratch: print a query's optimized plan to stderr (debugging expression
  * inlining); not part of any gate.
  */
object DbgPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val name = if (args.length > 1) args(1) else "d21_repetition"
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    System.err.println(df.queryExecution.optimizedPlan.toString.take(6000))
    spark.stop()
  }
}
