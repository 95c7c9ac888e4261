package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for s1_s2 (TSV ingest round-trip): separates the
  * hive TSV scan, the staged partition overwrite, and the read-back
  * aggregate so local-FS cost (720 partition dirs) is attributed correctly.
  * Not part of any gate.
  */
object TimeS1S2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[s1s2] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // run 1 includes the (possibly cached) TSV export
    phase("full s1_s2 #1 (incl export)") {
      graft.operators.IngestParityQueries.s1s2IngestRoundtrip(spark, sfDir).count()
    }
    phase("full s1_s2 #2") {
      graft.operators.IngestParityQueries.s1s2IngestRoundtrip(spark, sfDir).count()
    }
    // fine-grained phases against the cached export tree
    import graft.core.{CsvOptions, IngestConfig}
    import graft.sources.{HivePartitionedSource, LandingTable}
    val sf = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val raw = "file:" + new java.io.File(s"target/parity/raw-full-$sf").getAbsolutePath
    val landing = "file:" + new java.io.File(s"target/parity/landing-full-$sf").getAbsolutePath
    val cfg = IngestConfig(raw, landing,
      graft.operators.IngestParityQueries.eventsSchema, "ts", "user_id")
    val all = phase("readTree plan") {
      HivePartitionedSource.readTree(spark, cfg, raw)
        .select(graft.operators.IngestParityQueries.eventsSchema.fieldNames.map(col): _*)
    }
    phase("scan TSV tree (count)") { all.count() }
    phase("overwritePartitions") { LandingTable.overwritePartitions(all, cfg) }
    phase("overwritePartitions again") { LandingTable.overwritePartitions(all, cfg) }
    phase("read-back agg") {
      LandingTable.read(spark, cfg)
        .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
        .agg(count(lit(1)).as("cnt")).count()
    }
    spark.stop()
  }
}
