package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.time.{Clock, Instant, ZoneOffset}

class PartitionCodecSpec extends AnyFunSuite {

  /** Minimal property loop (no scalatestplus bridge in the offline cache). */
  def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  val genHour: Gen[PartitionHour] = for {
    y <- Gen.choose(1970, 2100)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28) // keep valid across months
    h <- Gen.choose(0, 23)
  } yield PartitionHour(y, m, d, h)

  test("bq id round trip (datetime <-> YYYYMMDDHH)") {
    forAll(genHour) { p =>
      assert(PartitionCodec.fromBqId(PartitionCodec.toBqId(p)) == p)
    }
  }

  test("hive path round trip, zero padded") {
    forAll(genHour) { p =>
      val path = PartitionCodec.toHivePath(p)
      assert(PartitionCodec.fromHivePath(path) == p)
      assert(!path.endsWith("/"))
      // zero padding like the reference strftime formats (partition.py:4)
      assert(path.matches(raw"year=\d{4}/month=\d{2}/day=\d{2}/hour=\d{2}"))
    }
  }

  test("known values match the reference's manual-test partition") {
    // the reference's sole manual test uses year=2023/month=06/day=27/hour=12
    val p = PartitionHour(2023, 6, 27, 12)
    assert(PartitionCodec.toBqId(p) == "2023062712")
    assert(PartitionCodec.toHivePath(p) == "year=2023/month=06/day=27/hour=12")
    assert(PartitionCodec.toGlob("gs://bucket/", p) ==
      "gs://bucket/year=2023/month=06/day=27/hour=12/*")
    // base trailing-slash handling = partition.py:26 removesuffix("/")
    assert(PartitionCodec.toGlob("gs://bucket", p) ==
      PartitionCodec.toGlob("gs://bucket/", p))
  }

  test("fromBqId rejects malformed ids") {
    intercept[IllegalArgumentException](PartitionCodec.fromBqId("2023-6-27"))
    intercept[IllegalArgumentException](PartitionCodec.fromBqId("20230627"))
  }

  test("lastHour = utcnow minus one hour, truncated (app.py:127-133)") {
    val fixed = Clock.fixed(Instant.parse("2023-06-27T13:59:31Z"), ZoneOffset.UTC)
    assert(PartitionCodec.lastHour(fixed) == PartitionHour(2023, 6, 27, 12))
    val midnight = Clock.fixed(Instant.parse("2024-01-01T00:10:00Z"), ZoneOffset.UTC)
    assert(PartitionCodec.lastHour(midnight) == PartitionHour(2023, 12, 31, 23))
  }

  test("JobState codes match the reference enum (types.py:5-10)") {
    assert(JobState.NotCreated.code == 0 && JobState.Running.code == 1 &&
      JobState.Success.code == 2 && JobState.Failure.code == 3)
    JobState.all.foreach(s => assert(JobState.fromCode(s.code) == s))
  }
}
