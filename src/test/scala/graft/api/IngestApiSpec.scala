package graft.api

import graft.SparkSpec
import graft.core._
import graft.operators.JobRunner
import org.apache.spark.sql.types._

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.time.{Clock, Instant, ZoneOffset}

/** Wire-parity spec for the 5 reference endpoints: drives the running HTTP
  * server with a real client (route shapes from app.py:47-93).
  */
class IngestApiSpec extends SparkSpec {

  val schema = StructType(Seq(
    StructField("event_ts", TimestampType),
    StructField("device_id", StringType),
    StructField("bytes", LongType)))

  def send(port: Int, method: String, path: String,
      body: String = "{}"): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .method(method, HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("exists / ingest / poll endpoints are wire-compatible") {
    val base = Files.createTempDirectory("graft-api-raw")
    val landing = Files.createTempDirectory("graft-api-landing")
    val cfg = IngestConfig(s"file:$base", s"file:$landing", schema,
      "event_ts", "device_id")
    val h12 = PartitionHour(2023, 6, 27, 12)
    val dir = Paths.get(base.toString, PartitionCodec.toHivePath(h12))
    Files.createDirectories(dir)
    Files.write(dir.resolve("a.tsv"),
      "2023-06-27 12:01:00\tdev-1\t10".getBytes("UTF-8"))

    // fixed clock so last_hour == h12 (app.py:127-133 semantics)
    val clock = Clock.fixed(Instant.parse("2023-06-27T13:05:00Z"), ZoneOffset.UTC)
    val api = new IngestApi(spark, new JobRunner(spark), cfg, clock)
    val port = api.start()
    try {
      assert(send(port, "GET", "/")._1 == 200)

      val (ec, eb) = send(port, "GET", "/partition/2023062712/exists/in-bucket")
      assert(ec == 200 && eb == "1")
      assert(send(port, "GET", "/partition/1999010100/exists/in-bucket")._2 == "0")
      assert(send(port, "GET", "/partition/last_hour/exists/in-bucket")._2 == "1")

      val (ic, ib) = send(port, "PUT", "/partition/2023062712/ingest")
      assert(ic == 201 && ib.contains("\"job_id\"") && ib.contains("\"code\""))
      val jobId = ib.split("\"job_id\":\"")(1).split("\"")(0)

      // poll until terminal; reference shape {job_id, status{name,code,error_msg}}
      var body = ""
      var tries = 0
      var done = false
      while (!done && tries < 200) {
        val (pc, pb) = send(port, "GET", s"/load_job/$jobId/status")
        assert(pc == 200)
        body = pb
        done = !pb.contains("\"RUNNING\"")
        if (!done) Thread.sleep(100)
        tries += 1
      }
      assert(body.contains("\"name\":\"SUCCESS\"") && body.contains("\"code\":2"))

      // ingest of an empty partition reports NOT_CREATED (code 0)
      val (nc, nb) = send(port, "PUT", "/partition/1999010100/ingest")
      assert(nc == 201 && nb.contains("\"code\":0"))

      // unknown job -> 404 with the reference's detail message
      val (uc, ub) = send(port, "GET", "/load_job/nope/status")
      assert(uc == 404 && ub.contains("Job not found."))

      // malformed partition id -> 422
      assert(send(port, "GET", "/partition/20230627/exists/in-bucket")._1 == 422)

      // the landing actually contains the ingested row
      assert(spark.read.parquet(s"$landing").count() == 1)
    } finally api.stop()
  }

  test("PUT body job_configuration swaps the load config per request (app.py:29-33)") {
    val base = Files.createTempDirectory("graft-api-raw2")
    val landing = Files.createTempDirectory("graft-api-landing2")
    // endpoint's BASE config is the reference TSV contract; the request
    // below overrides it to comma-delimited WITH a header row
    val cfg = IngestConfig(s"file:$base", s"file:$landing", schema,
      "event_ts", "device_id")
    val h12 = PartitionHour(2023, 6, 27, 12)
    val dir = Paths.get(base.toString, PartitionCodec.toHivePath(h12))
    Files.createDirectories(dir)
    Files.write(dir.resolve("a.csv"),
      ("event_ts,device_id,bytes\n" +
        "2023-06-27 12:01:00,dev-1,10\n" +
        "2023-06-27 12:02:00,dev-2,20\n").getBytes("UTF-8"))

    val api = new IngestApi(spark, new JobRunner(spark), cfg)
    val port = api.start()
    try {
      val override_ =
        """{"bucket_name":"b","dataset_id":"d","table_id":"t",
          | "job_configuration":{"source_format":"CSV",
          |   "field_delimiter":",","skip_leading_rows":"1",
          |   "quote_character":"","encoding":"UTF-8",
          |   "max_bad_records":"5",
          |   "write_disposition":"WRITE_TRUNCATE",
          |   "create_disposition":"CREATE_NEVER"}}""".stripMargin
      val (ic, ib) = send(port, "PUT", "/partition/2023062712/ingest", override_)
      assert(ic == 201, ib)
      val jobId = ib.split("\"job_id\":\"")(1).split("\"")(0)
      var tries = 0
      var done = false
      while (!done && tries < 200) {
        val (_, pb) = send(port, "GET", s"/load_job/$jobId/status")
        done = !pb.contains("\"RUNNING\"")
        if (done) assert(pb.contains("\"name\":\"SUCCESS\""), pb)
        else Thread.sleep(100)
        tries += 1
      }
      assert(done)
      // both comma-delimited data rows landed; the header row did not
      val landed = spark.read.parquet(s"$landing")
      assert(landed.count() == 2)
      assert(landed.select("device_id").collect().map(_.getString(0)).toSet
        == Set("dev-1", "dev-2"))

      // a config typo must not silently fall back to defaults: 422
      val (bc, bb) = send(port, "PUT", "/partition/2023062712/ingest",
        """{"job_configuration":{"field_delimitr":","}}""")
      assert(bc == 422 && bb.contains("unknown job_configuration key"), bb)
      // unsupported disposition rejected loudly, not ignored
      assert(send(port, "PUT", "/partition/2023062712/ingest",
        """{"job_configuration":{"write_disposition":"WRITE_APPEND"}}""")._1 == 422)
      // non-numeric bad-record budget rejected
      assert(send(port, "PUT", "/partition/2023062712/ingest",
        """{"job_configuration":{"max_bad_records":"lots"}}""")._1 == 422)
      // wire shape unchanged: a bodyless/default PUT still works
      assert(send(port, "PUT", "/partition/2023062712/ingest", "")._1 == 201)
    } finally api.stop()
  }
}
