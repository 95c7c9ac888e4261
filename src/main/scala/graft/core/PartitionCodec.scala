package graft.core

import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit

/** One wall-clock UTC hour — the reference's unit of ingestion work.
  *
  * The reference identifies a partition three ways (see
  * `/root/reference/ingestion/partition.py:3-4`): a Python `datetime`, a
  * BigQuery partition id `YYYYMMDDHH`, and a hive path
  * `year=%Y/month=%m/day=%d/hour=%H`. `PartitionHour` is the canonical form;
  * [[PartitionCodec]] provides the bijections.
  */
final case class PartitionHour(year: Int, month: Int, day: Int, hour: Int) {
  require(month >= 1 && month <= 12, s"bad month: $month")
  require(day >= 1 && day <= 31, s"bad day: $day")
  require(hour >= 0 && hour <= 23, s"bad hour: $hour")

  def toLocalDateTime: LocalDateTime = LocalDateTime.of(year, month, day, hour, 0)
  def toInstant: Instant             = toLocalDateTime.toInstant(ZoneOffset.UTC)
  def minusHours(n: Long): PartitionHour =
    PartitionHour.fromLocalDateTime(toLocalDateTime.minusHours(n))
  def plusHours(n: Long): PartitionHour =
    PartitionHour.fromLocalDateTime(toLocalDateTime.plusHours(n))
}

object PartitionHour {
  def fromLocalDateTime(dt: LocalDateTime): PartitionHour =
    PartitionHour(dt.getYear, dt.getMonthValue, dt.getDayOfMonth, dt.getHour)
  def fromInstant(i: Instant): PartitionHour =
    fromLocalDateTime(LocalDateTime.ofInstant(i.truncatedTo(ChronoUnit.HOURS), ZoneOffset.UTC))
}

/** Bijections between the three partition identities plus the source glob.
  *
  * Semantics ported from `/root/reference/ingestion/partition.py:7-27` and the
  * last-hour derivation at `/root/reference/ingestion/app.py:127-133` — but as
  * pure driver-side Scala (these build *paths*, they are not per-row
  * expressions; the column-level analogues live in SQL via `date_format`).
  */
object PartitionCodec {
  /** `YYYYMMDDHH` — BigQuery hour-partition decorator id (`partition.py:3`). */
  val BqIdFormat: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyyMMddHH")

  def toBqId(p: PartitionHour): String = p.toLocalDateTime.format(BqIdFormat)

  def fromBqId(id: String): PartitionHour = {
    require(id.length == 10 && id.forall(_.isDigit), s"bad partition id: '$id'")
    PartitionHour(id.substring(0, 4).toInt, id.substring(4, 6).toInt,
      id.substring(6, 8).toInt, id.substring(8, 10).toInt)
  }

  /** `year=%Y/month=%m/day=%d/hour=%H` with zero-padded fields
    * (`partition.py:4`). No trailing slash.
    */
  def toHivePath(p: PartitionHour): String =
    f"year=${p.year}%04d/month=${p.month}%02d/day=${p.day}%02d/hour=${p.hour}%02d"

  private val HivePathRe =
    raw"year=(\d{4})/month=(\d{2})/day=(\d{2})/hour=(\d{2})/?".r

  def fromHivePath(path: String): PartitionHour = path match {
    case HivePathRe(y, m, d, h) => PartitionHour(y.toInt, m.toInt, d.toInt, h.toInt)
    case _ => throw new IllegalArgumentException(s"bad hive path: '$path'")
  }

  /** All files under one partition's prefix — the reference's source-uri glob
    * `{base}/{hive_path}/` + star (`partition.py:25-27`, note the
    * `removesuffix("/")` on the base).
    */
  def toGlob(base: String, p: PartitionHour): String =
    s"${base.stripSuffix("/")}/${toHivePath(p)}/*"

  /** Directory (no glob) form of the partition prefix. */
  def toDir(base: String, p: PartitionHour): String =
    s"${base.stripSuffix("/")}/${toHivePath(p)}"

  /** The scheduled path ingests `utcnow() - 1 hour` truncated to the hour
    * (`app.py:127-133`); clock injectable for tests.
    */
  def lastHour(clock: java.time.Clock = java.time.Clock.systemUTC()): PartitionHour =
    PartitionHour.fromInstant(Instant.now(clock).minus(1, ChronoUnit.HOURS))
}
