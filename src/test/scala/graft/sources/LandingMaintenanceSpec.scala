package graft.sources

import graft.SparkSpec
import graft.core._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Compaction preserves content while merging files; registration enables
  * pruned SQL; retention drops only expired hours. Also covers the
  * parquet-format raw source.
  */
class LandingMaintenanceSpec extends SparkSpec {

  val schema = StructType(Seq(
    StructField("event_ts", TimestampType),
    StructField("device_id", StringType),
    StructField("bytes", LongType)))

  def freshCfg(): IngestConfig = {
    val landing = Files.createTempDirectory("graft-maint").toString + "/t"
    IngestConfig("unused", s"file:$landing", schema, "event_ts", "device_id")
  }

  def load(cfg: IngestConfig, rows: Seq[(String, String, Long)], parts: Int = 4): Unit = {
    import spark.implicits._
    val df = rows.toDF("s", "device_id", "bytes")
      .selectExpr("CAST(s AS TIMESTAMP) AS event_ts", "device_id", "bytes")
      .repartition(parts)
    LandingTable.overwritePartitions(df, cfg)
  }

  test("compactPartition merges files, preserves rows and sibling partitions") {
    val cfg = freshCfg()
    load(cfg, Seq(
      ("2023-06-27 12:01:00", "d1", 1L), ("2023-06-27 12:02:00", "d2", 2L),
      ("2023-06-27 12:03:00", "d3", 3L), ("2023-06-27 12:04:00", "d4", 4L),
      ("2023-06-27 13:01:00", "d5", 5L)), parts = 4)
    val h12 = PartitionHour(2023, 6, 27, 12)
    val before = LandingTable.readPartition(spark, cfg, h12)
      .orderBy("event_ts").collect().map(_.toString).toSeq

    val (nBefore, nAfter) = LandingMaintenance.compactPartition(spark, cfg, h12)
    assert(nBefore > 1 && nAfter == 1, s"before=$nBefore after=$nAfter")
    val after = LandingTable.readPartition(spark, cfg, h12)
      .orderBy("event_ts").collect().map(_.toString).toSeq
    assert(after == before)
    assert(LandingTable.readPartition(spark, cfg, PartitionHour(2023, 6, 27, 13))
      .count() == 1)
    // compacting an absent partition is a no-op
    assert(LandingMaintenance.compactPartition(spark, cfg,
      PartitionHour(1999, 1, 1, 0)) == ((0, 0)))
  }

  test("compactFragmented selects only fragmented hours; others keep FILE identity") {
    val cfg = freshCfg()
    // hour 12: 4 files (fragmented); hour 13: single file (healthy)
    load(cfg, Seq(
      ("2023-06-27 12:01:00", "d1", 1L), ("2023-06-27 12:02:00", "d2", 2L),
      ("2023-06-27 12:03:00", "d3", 3L), ("2023-06-27 12:04:00", "d4", 4L)),
      parts = 4)
    import spark.implicits._
    LandingTable.overwritePartitions(
      Seq(("2023-06-27 13:01:00", "d5", 5L)).toDF("s", "device_id", "bytes")
        .selectExpr("CAST(s AS TIMESTAMP) AS event_ts", "device_id", "bytes")
        .coalesce(1), cfg)
    def filesOf(h: Int): Set[String] = {
      val d = new java.io.File(cfg.landingPath.stripPrefix("file:") +
        f"/year=2023/month=06/day=27/hour=$h%02d")
      Option(d.listFiles()).map(_.filter(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(f => f.getName + ":" + f.lastModified()).toSet).getOrElse(Set.empty)
    }
    val h13Before = filesOf(13)
    val h12FilesBefore = filesOf(12).size
    // round-robin across 4 partitions does not guarantee 4 non-empty
    // files; fragmentation (=> >1 file) is what the planner keys on
    assert(h13Before.size == 1 && h12FilesBefore > 1)

    val compacted = LandingMaintenance.compactFragmented(spark, cfg, maxFiles = 1)
    assert(compacted.map { case (h, n) => (h.hour, n) } ==
      Seq((12, h12FilesBefore)), compacted)
    // the fragmented hour collapsed to one file with content intact
    assert(filesOf(12).size == 1)
    assert(LandingTable.readPartition(spark, cfg, PartitionHour(2023, 6, 27, 12))
      .select("bytes").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    // the healthy hour was never rewritten — name AND mtime identical
    assert(filesOf(13) == h13Before)
    // idempotent: a second sweep finds nothing
    assert(LandingMaintenance.compactFragmented(spark, cfg, maxFiles = 1).isEmpty)
  }

  test("register exposes a pruned SQL table over the landing tree") {
    val cfg = freshCfg()
    load(cfg, Seq(
      ("2023-06-27 12:01:00", "d1", 1L), ("2023-06-28 09:00:00", "d2", 2L)))
    LandingMaintenance.register(spark, cfg, "maint_landing")
    val n = spark.sql(
      "SELECT count(*) FROM maint_landing WHERE year='2023' AND month='06' AND day='27'")
      .collect()(0).getLong(0)
    assert(n == 1)
    spark.sql("DROP TABLE maint_landing")
  }

  test("expirePartitions drops only hours before the cutoff") {
    val cfg = freshCfg()
    load(cfg, Seq(
      ("2023-06-27 10:00:00", "d1", 1L),
      ("2023-06-27 11:00:00", "d2", 2L),
      ("2023-06-27 12:00:00", "d3", 3L)))
    val dropped = LandingMaintenance.expirePartitions(spark, cfg,
      PartitionHour(2023, 6, 27, 12))
    assert(dropped.map(_.hour).sorted == Seq(10, 11))
    val left = LandingTable.read(spark, cfg)
    assert(left.count() == 1 && left.collect()(0).getAs[Long]("bytes") == 3L)
  }

  test("parquet raw format: hive tree of parquet files ingests identically") {
    import spark.implicits._
    val rawBase = Files.createTempDirectory("graft-praw").toString
    val h = PartitionHour(2023, 6, 27, 12)
    val dir = PartitionCodec.toDir(s"file:$rawBase", h)
    Seq(("2023-06-27 12:30:00", "p1", 7L)).toDF("s", "device_id", "bytes")
      .selectExpr("CAST(s AS TIMESTAMP) AS event_ts", "device_id", "bytes")
      .write.mode("overwrite").parquet(dir)

    val cfg = freshCfg().copy(sourceBase = s"file:$rawBase", sourceFormat = "parquet")
    assert(PartitionProbe.exists(spark, cfg, h))
    val df = HivePartitionedSource.read(spark, cfg, h)
    assert(df.count() == 1 && df.collect()(0).getAs[Long]("bytes") == 7L)
    LandingTable.overwritePartitions(df, cfg)
    assert(LandingTable.readPartition(spark, cfg, h).count() == 1)
  }

  test("orc raw format: hive tree of ORC files ingests identically") {
    import spark.implicits._
    val rawBase = Files.createTempDirectory("graft-oraw").toString
    val h = PartitionHour(2023, 6, 27, 12)
    val dir = PartitionCodec.toDir(s"file:$rawBase", h)
    Seq(("2023-06-27 12:45:00", "o1", 11L)).toDF("s", "device_id", "bytes")
      .selectExpr("CAST(s AS TIMESTAMP) AS event_ts", "device_id", "bytes")
      .write.mode("overwrite").orc(dir)

    val cfg = freshCfg().copy(sourceBase = s"file:$rawBase", sourceFormat = "orc")
    assert(PartitionProbe.exists(spark, cfg, h))
    val df = HivePartitionedSource.read(spark, cfg, h)
    assert(df.count() == 1 && df.collect()(0).getAs[Long]("bytes") == 11L)
    LandingTable.overwritePartitions(df, cfg)
    assert(LandingTable.readPartition(spark, cfg, h).count() == 1)
  }

  test("gzip-compressed TSV ingests transparently (codec by extension)") {
    val rawBase = Files.createTempDirectory("graft-gzraw").toString
    val h = PartitionHour(2023, 6, 27, 12)
    val dir = PartitionCodec.toDir(rawBase, h) // local path, no file: prefix
    new java.io.File(dir).mkdirs()
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/part-000.tsv.gz"))
    gz.write("2023-06-27 12:10:00\tgz-1\t42\n".getBytes("UTF-8"))
    gz.close()

    val cfg = freshCfg().copy(sourceBase = s"file:$rawBase")
    assert(PartitionProbe.exists(spark, cfg, h))
    val df = HivePartitionedSource.read(spark, cfg, h)
    val row = df.collect()
    assert(row.length == 1 && row(0).getAs[Long]("bytes") == 42L &&
      row(0).getAs[String]("device_id") == "gz-1")
  }
}
