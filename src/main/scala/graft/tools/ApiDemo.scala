package graft.tools

import graft.api.IngestApi
import graft.core._
import graft.operators.JobRunner
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

/** Starts the reference-parity HTTP API on a fixed port over a temp fixture
  * and blocks — drive it with curl:
  *
  *   sbt "runMain graft.tools.ApiDemo 8099"
  *   curl localhost:8099/partition/2023062712/exists/in-bucket
  *   curl -X PUT localhost:8099/partition/2023062712/ingest
  *   curl localhost:8099/load_job/{id}/status
  */
object ApiDemo {
  def main(args: Array[String]): Unit = {
    val port = if (args.nonEmpty) args(0).toInt else 8099
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Files.createTempDirectory("graft-apidemo-raw")
    val landing = Files.createTempDirectory("graft-apidemo-landing")
    val cfg = IngestConfig(s"file:$base", s"file:$landing",
      StructType(Seq(
        StructField("event_ts", TimestampType),
        StructField("device_id", StringType),
        StructField("bytes", LongType))),
      "event_ts", "device_id")
    val h12 = PartitionHour(2023, 6, 27, 12)
    val dir = Paths.get(base.toString, PartitionCodec.toHivePath(h12))
    Files.createDirectories(dir)
    Files.write(dir.resolve("a.tsv"),
      "2023-06-27 12:01:00\tdev-1\t10\n2023-06-27 12:02:00\tdev-2\t20"
        .getBytes("UTF-8"))

    val api = new IngestApi(spark, new JobRunner(spark), cfg)
    val bound = api.start(port)
    println(s"API listening on 127.0.0.1:$bound (raw=$base landing=$landing)")
    Thread.sleep(Long.MaxValue)
  }
}
