package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch: dump quarantine split rows for the s4 fixture; not a gate tool. */
object DbgQuar {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirty = new java.io.File(
      "target/parity/quarantine-raw-first-_root_testdata_sf0.01").getAbsolutePath
    graft.sources.HivePartitionedSource.withQuarantine(spark,
      graft.operators.IngestParityQueries.eventsSchema,
      graft.core.CsvOptions(),
      s"file:$dirty/year=*/month=*/day=*/hour=*") { (good, bad) =>
      println("GOOD " + good.count())
      good.filter(col("event_id") === 9 || col("event_id").isNull)
        .show(10, false)
      println("BAD " + bad.count())
      bad.show(10, false)
    }
    spark.stop()
  }
}
