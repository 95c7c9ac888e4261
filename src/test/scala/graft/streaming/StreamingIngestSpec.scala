package graft.streaming

import graft.SparkSpec
import graft.core._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Streaming form of the pipeline: file-stream source over the hive TSV
  * tree, watermarked hourly windows, append-once partition overwrite.
  */
class StreamingIngestSpec extends SparkSpec {

  val schema = StructType(Seq(
    StructField("event_ts", TimestampType),
    StructField("device_id", StringType),
    StructField("bytes", LongType)))

  def writeTsv(base: String, h: PartitionHour, name: String, lines: Seq[String]): Unit = {
    val dir = Paths.get(base, PartitionCodec.toHivePath(h))
    Files.createDirectories(dir)
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes("UTF-8"))
  }

  test("rawToLanding streams files into partitioned landing; new files picked up") {
    val base = Files.createTempDirectory("graft-st-raw").toString
    val landing = Files.createTempDirectory("graft-st-landing").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-st-ckpt").toString
    val cfg = IngestConfig(s"file:$base", s"file:$landing", schema, "event_ts", "device_id")

    val h12 = PartitionHour(2023, 6, 27, 12)
    writeTsv(base, h12, "a.tsv", Seq(
      "2023-06-27 12:01:00\tdev-1\t10",
      "2023-06-27 12:02:00\tdev-2\t20"))

    val q1 = StreamingIngest.rawToLanding(spark, cfg, ckpt)
    q1.awaitTermination(60000)
    assert(spark.read.parquet(landing).count() == 2)

    // late-arriving second file in the same partition: appended, not clobbered
    writeTsv(base, h12, "b.tsv", Seq("2023-06-27 12:30:00\tdev-3\t30"))
    val q2 = StreamingIngest.rawToLanding(spark, cfg, ckpt)
    q2.awaitTermination(60000)
    val rows = spark.read.parquet(landing)
    assert(rows.count() == 3)
    assert(rows.filter("hour = 12").count() == 3)
  }

  test("hourlyStats emits watermark-final windows once into batch-keyed dirs") {
    val base = Files.createTempDirectory("graft-st2-raw").toString
    val stats = Files.createTempDirectory("graft-st2-stats").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-st2-ckpt").toString
    val cfg = IngestConfig(s"file:$base", "unused", schema, "event_ts", "device_id")

    val h12 = PartitionHour(2023, 6, 27, 12)
    val h14 = PartitionHour(2023, 6, 27, 14)
    writeTsv(base, h12, "a.tsv", Seq(
      "2023-06-27 12:01:00\tdev-1\t10",
      "2023-06-27 12:59:00\tdev-2\t20"))
    // records far past hour 12 + 40min grace close the hour-12 window
    writeTsv(base, h14, "b.tsv", Seq("2023-06-27 14:30:00\tdev-3\t30"))

    val q = StreamingIngest.hourlyStats(spark, cfg, s"file:$stats", ckpt)
    q.awaitTermination(60000)
    // hour 12 is watermark-closed (watermark = 14:30 - 40min = 13:50 > 13:00)
    val out = spark.read.parquet(stats)
    val h12row = out.filter("hour(hour_ts) = 12").collect()
    assert(h12row.length == 1 && h12row(0).getAs[Long]("cnt") == 2)
    // hour 14 is still open (watermark < 15:40): not emitted yet
    assert(out.filter("hour(hour_ts) = 14").isEmpty)
    // emission dirs are batch-keyed (replayable/idempotent per batch),
    // never one directory per hour
    val dirs = new java.io.File(stats).listFiles().map(_.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("batch=")), dirs.mkString(","))
  }
}
