package graft.sources

import graft.SparkSpec
import graft.core._
import org.apache.spark.sql.types._
import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

/** Input-contract edge cases (FIXTURES.md): malformed rows under PERMISSIVE
  * parsing, and gzipped partition files (the GCS reality — BQ loads .gz CSV
  * transparently; so does Spark's CSV reader, at the cost of splittability).
  */
class CsvEdgeSpec extends SparkSpec {

  val schema = StructType(Seq(
    StructField("event_ts", TimestampType),
    StructField("device_id", StringType),
    StructField("bytes", LongType)))
  val csv = CsvOptions()

  test("malformed rows: bad timestamp/number become null, short rows pad null") {
    val dir = Files.createTempDirectory("graft-edge")
    Files.write(dir.resolve("part-000.tsv"), Seq(
      "2023-06-27 12:00:00\tdev-1\t10",     // good
      "not-a-timestamp\tdev-2\t20",          // bad ts -> null ts
      "2023-06-27 12:02:00\tdev-3\tNaNN",    // bad long -> null bytes
      "2023-06-27 12:03:00\tdev-4"           // short row -> null bytes
    ).mkString("\n").getBytes("UTF-8"))

    val df = HivePartitionedSource.readGlob(spark, schema, csv, s"file:$dir/*")
    val rows = df.collect()
    assert(rows.length == 4) // PERMISSIVE keeps every line
    assert(df.filter("event_ts is null").count() == 1)
    assert(df.filter("bytes is null").count() == 2)
    // note: BigQuery's loader would FAIL the job on these rows
    // (max_bad_records defaults to 0); PERMISSIVE-null is our documented
    // deviation, chosen so one bad row can't kill a 100 TB load.
  }

  test("FAILFAST parity: a malformed row fails the load job with the message") {
    val dir = Files.createTempDirectory("graft-strict")
    val h = PartitionHour(2023, 6, 27, 12)
    val pdir = Paths.get(dir.toString, PartitionCodec.toHivePath(h))
    Files.createDirectories(pdir)
    Files.write(pdir.resolve("part-000.tsv"), Seq(
      "2023-06-27 12:00:00\tdev-1\t10",
      "not-a-timestamp\tdev-2\t20"        // BQ would fail the whole job
    ).mkString("\n").getBytes("UTF-8"))

    // reader level: FAILFAST throws instead of null-padding
    val strict = csv.copy(parseMode = "FAILFAST")
    intercept[org.apache.spark.SparkException] {
      HivePartitionedSource.readGlob(spark, schema, strict, s"file:$pdir/*").collect()
    }

    // job level: the parse error maps to JobState.Failure with the captured
    // message (BQ error_result parity, bigquery_interaction.py:112-114)
    val landing = Files.createTempDirectory("graft-strict-landing")
    val cfg = IngestConfig(s"file:$dir", s"file:$landing", schema,
      "event_ts", "device_id", csv = strict)
    val r = new graft.operators.JobRunner(spark)
    val m = r.assemble(cfg, h)
    r.start(cfg, m)
    val (st, msg) = r.await(m.jobId)
    assert(st == JobState.Failure)
    assert(msg.exists(_.toLowerCase.contains("malformed")), msg)

    // same files under the PERMISSIVE default load fine (nulls, not failure)
    val lax = cfg.copy(csv = csv)
    val m2 = r.assemble(lax, h)
    r.start(lax, m2)
    assert(r.await(m2.jobId)._1 == JobState.Success)
  }

  test("gzipped partition files read transparently") {
    val dir = Files.createTempDirectory("graft-gz")
    val h = PartitionHour(2023, 6, 27, 12)
    val pdir = Paths.get(dir.toString, PartitionCodec.toHivePath(h))
    Files.createDirectories(pdir)
    val content = "2023-06-27 12:00:00\tdev-1\t10\n2023-06-27 12:01:00\tdev-2\t20"
    val gz = new ByteArrayOutputStream()
    val zs = new GZIPOutputStream(gz)
    zs.write(content.getBytes("UTF-8")); zs.close()
    new FileOutputStream(pdir.resolve("part-000.tsv.gz").toFile).write(gz.toByteArray)

    val cfg = IngestConfig(s"file:$dir", "unused", schema, "event_ts", "device_id")
    assert(PartitionProbe.exists(spark, cfg, h))
    val df = HivePartitionedSource.read(spark, cfg, h)
    assert(df.count() == 2)
    assert(df.filter("device_id = 'dev-2'").collect()(0).getAs[Long]("bytes") == 20L)
  }
}
