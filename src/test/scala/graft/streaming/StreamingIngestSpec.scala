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

  test("backfillHour repairs exactly the target hour; untouched partitions keep FILE identity") {
    import graft.sources.LandingTable
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val base = Files.createTempDirectory("graft-bf-raw").toString
    val landing = Files.createTempDirectory("graft-bf-landing").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-bf-ckpt").toString
    val cfg = IngestConfig(s"file:$base", s"file:$landing", schema, "event_ts", "device_id")

    // raw truth: hour 12 has 3 rows, hour 13 has 2 rows
    val h12 = PartitionHour(2023, 6, 27, 12)
    val h13 = PartitionHour(2023, 6, 27, 13)
    writeTsv(base, h12, "a.tsv", Seq(
      "2023-06-27 12:01:00\tdev-1\t10",
      "2023-06-27 12:02:00\tdev-2\t20",
      "2023-06-27 12:03:00\tdev-3\t30"))
    writeTsv(base, h13, "b.tsv", Seq(
      "2023-06-27 13:01:00\tdev-4\t40",
      "2023-06-27 13:02:00\tdev-5\t50"))

    // land both hours, hour 12 CRIPPLED (a failed earlier load: 1 of 3 rows)
    def r(s: String, dev: String, b: Long) = Row(java.sql.Timestamp.valueOf(s), dev, b)
    LandingTable.overwritePartitions(spark.createDataFrame(Seq(
      r("2023-06-27 12:01:00", "dev-1", 10L),
      r("2023-06-27 13:01:00", "dev-4", 40L),
      r("2023-06-27 13:02:00", "dev-5", 50L)).asJava, schema), cfg)

    def filesOf(h: PartitionHour): Set[String] = {
      val d = new java.io.File(landing, PartitionCodec.toHivePath(h))
      Option(d.listFiles()).map(_.filter(_.isFile).map(f =>
        f.getName + ":" + f.lastModified()).toSet).getOrElse(Set.empty)
    }
    val h13Before = filesOf(h13)
    assert(h13Before.nonEmpty)
    val h12Before = filesOf(h12)

    val q = StreamingIngest.backfillHour(spark, cfg, h12, ckpt)
    q.awaitTermination(60000)

    // the crippled hour is fully repaired from raw
    val got = LandingTable.read(spark, cfg)
      .filter("hour = 12").select("device_id", "bytes").collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet
    assert(got == Set(("dev-1", 10L), ("dev-2", 20L), ("dev-3", 30L)), got)
    assert(filesOf(h12) != h12Before, "backfilled hour must be rewritten")
    // the untouched hour keeps its exact files — name AND mtime, not just
    // content: the backfill never rewrote the partition
    assert(filesOf(h13) == h13Before)
    assert(LandingTable.read(spark, cfg).filter("hour = 13").count() == 2)
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
