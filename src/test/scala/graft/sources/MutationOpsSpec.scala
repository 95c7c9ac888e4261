package graft.sources

import graft.SparkSpec
import graft.core._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Partition-scoped mutations (MutationOps): the contract under test is not
  * just the logical result (the oracle gate covers u1/u2) but the PHYSICAL
  * scope — untouched partitions must keep their exact files, and a delete
  * that empties a partition must remove its directory.
  */
class MutationOpsSpec extends SparkSpec {

  val schema = StructType(Seq(
    StructField("event_ts", TimestampType),
    StructField("device_id", StringType),
    StructField("bytes", LongType)))

  private def row(hour: Int, dev: String, bytes: Long) = Row(
    java.sql.Timestamp.valueOf(f"2023-06-27 $hour%02d:05:00"), dev, bytes)

  private def frame(rows: Seq[Row]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  private def mkCfg(): IngestConfig = {
    val landing = Files.createTempDirectory("graft-mut")
    IngestConfig(sourceBase = "unused", landingPath = s"file:$landing",
      schema = schema, partitionField = "event_ts", clusterField = "device_id")
  }

  private def filesOf(cfg: IngestConfig, hour: Int): Set[String] = {
    val d = new java.io.File(
      cfg.landingPath.stripPrefix("file:") +
        f"/year=2023/month=06/day=27/hour=$hour%02d")
    Option(d.listFiles()).map(_.filter(_.isFile).map(f =>
      f.getName + ":" + f.lastModified()).toSet).getOrElse(Set.empty)
  }

  test("mergeByKey rewrites only the partitions the updates map to") {
    val cfg = mkCfg()
    LandingTable.overwritePartitions(frame(Seq(
      row(10, "a", 1), row(10, "b", 2), row(11, "c", 3), row(12, "d", 4))), cfg)
    val h11Before = filesOf(cfg, 11)
    val h12Before = filesOf(cfg, 12)

    // update key "a" (replace) + key "z" (insert), both in hour 10; the "a"
    // row in hour 11 is OUT of merge scope (partition-local key contract)
    val touched = MutationOps.mergeByKey(spark, cfg,
      frame(Seq(row(10, "a", 100), row(10, "z", 200), row(11, "a", 300))),
      Seq("device_id"))
    assert(touched.toSet == Set(Seq(2023, 6, 27, 10), Seq(2023, 6, 27, 11)), touched)

    // untouched partition keeps its exact files (name AND mtime)
    assert(filesOf(cfg, 12) == h12Before)
    assert(filesOf(cfg, 11) != h11Before, "hour 11 had an update => rewritten")

    val got = LandingTable.read(spark, cfg)
      .select("device_id", "bytes").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 100L), ("z", 200L), ("a", 300L), ("c", 3L),
      ("b", 2L), ("d", 4L)), got)
  }

  test("deleteByKey removes rows, prunes untouched partitions, drops emptied dirs") {
    val cfg = mkCfg()
    LandingTable.overwritePartitions(frame(Seq(
      row(10, "a", 1), row(10, "b", 2),   // hour 10: partially deleted
      row(11, "a", 3),                    // hour 11: fully emptied
      row(12, "d", 4))), cfg)             // hour 12: untouched
    val h12Before = filesOf(cfg, 12)

    import spark.implicits._
    val (touched, emptied) = MutationOps.deleteByKey(
      spark, cfg, Seq("a").toDF("k"), "device_id")
    assert(touched.toSet == Set(Seq(2023, 6, 27, 10), Seq(2023, 6, 27, 11)), touched)
    assert(emptied == Seq(Seq(2023, 6, 27, 11)), emptied)

    assert(filesOf(cfg, 11).isEmpty, "emptied partition dir must be gone")
    assert(filesOf(cfg, 12) == h12Before, "untouched partition must keep its files")
    val got = LandingTable.read(spark, cfg)
      .select("device_id", "bytes").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("b" -> 2L, "d" -> 4L), got)
  }

  test("the touched-partition predicate prunes at planning, not at runtime") {
    val cfg = mkCfg()
    LandingTable.overwritePartitions(frame(Seq(
      row(10, "a", 1), row(11, "b", 2), row(12, "c", 3), row(13, "d", 4))), cfg)
    val pruned = LandingTable.read(spark, cfg)
      .filter(MutationOps.partitionPredicate(Seq(Seq(2023, 6, 27, 11))))
    val scans = pruned.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, pruned.queryExecution.sparkPlan.toString)
    // 1 of 4 hour directories selected => no file of the other 3 is listed,
    // the physical backing of the "cost ∝ partitions touched" contract
    assert(scans.head.selectedPartitions.partitionCount == 1,
      s"expected 1 selected partition dir, got ${scans.head.selectedPartitions.partitionCount}")
  }

  test("deleteByKey with no matching keys touches nothing") {
    val cfg = mkCfg()
    LandingTable.overwritePartitions(frame(Seq(row(10, "a", 1))), cfg)
    val before = filesOf(cfg, 10)
    import spark.implicits._
    val (touched, emptied) = MutationOps.deleteByKey(
      spark, cfg, Seq("nope").toDF("k"), "device_id")
    assert(touched.isEmpty && emptied.isEmpty)
    assert(filesOf(cfg, 10) == before)
  }

  test("scd2MergeTable rewrites only the change batch's buckets; merge ≡ rebuild") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val nBuckets = 4
    // one initial record per user; user ids chosen at runtime so the change
    // batch's bucket provably differs from at least one untouched bucket
    val users = (1L to 8L).toSeq
    val stream0 = users.map(u =>
      (u, ts(f"2023-06-27 10:0${u % 6}%d:00"), u * 10, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val dim = Files.createTempDirectory("graft-scd2m").toString + "/dim"
    MutationOps.scd2WriteTable(
      MutationOps.scd2(stream0, Seq("user_id"), Seq("event_type"), "ts", "event_id"),
      s"file:$dim", Seq("user_id"), nBuckets)

    val bucketOf = users.map(u => u ->
      stream0.filter($"user_id" === u)
        .select(pmod(hash($"user_id"), lit(nBuckets))).head().getInt(0)).toMap
    val changeUser = users.head
    val otherBucketUser = users.find(u => bucketOf(u) != bucketOf(changeUser))
      .getOrElse(fail("need a user hashing to a different bucket"))
    def bucketFiles(b: Int): Set[String] = {
      val d = new java.io.File(s"$dim/bucket=$b")
      Option(d.listFiles()).map(_.filter(_.isFile).map(f =>
        f.getName + ":" + f.lastModified()).toSet).getOrElse(Set.empty)
    }
    val untouchedBefore = bucketFiles(bucketOf(otherBucketUser))
    assert(untouchedBefore.nonEmpty)

    // batch: changeUser switches to attr B at 12:00
    val touched = MutationOps.scd2MergeTable(spark, s"file:$dim",
      Seq((changeUser, ts("2023-06-27 12:00:00"), 999L, "B"))
        .toDF("user_id", "ts", "event_id", "event_type"),
      Seq("user_id"), Seq("event_type"), "ts", "event_id", nBuckets)
    assert(touched == Seq(bucketOf(changeUser)), touched)
    assert(bucketFiles(bucketOf(otherBucketUser)) == untouchedBefore,
      "bucket without any changed key must keep its exact files")
    // read-side scoping: the bucket predicate prunes at planning — a merge
    // never even lists the untouched buckets' files
    val pruned = spark.read.option("basePath", s"file:$dim")
      .parquet(s"file:$dim")
      .filter(col("bucket").cast("int").isin(touched: _*))
    val scans = pruned.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.head.selectedPartitions.partitionCount ==
      touched.size, pruned.queryExecution.sparkPlan.toString)

    val after = spark.read.option("basePath", s"file:$dim").parquet(s"file:$dim")
    val cu = after.filter($"user_id" === changeUser)
      .select("version", "event_type", "effective_to", "is_current")
      .collect().map(r => (r.getInt(0), r.getString(1),
        Option(r.getTimestamp(2)), r.getBoolean(3))).toSet
    // open version closed at the new record's ts; new current version B
    assert(cu == Set(
      (1, "A", Some(ts("2023-06-27 12:00:00")), false),
      (2, "B", None, true)), cu)
    // a no-attr-change record compresses into the open version: same state
    MutationOps.scd2MergeTable(spark, s"file:$dim",
      Seq((changeUser, ts("2023-06-27 13:00:00"), 1000L, "B"))
        .toDF("user_id", "ts", "event_id", "event_type"),
      Seq("user_id"), Seq("event_type"), "ts", "event_id", nBuckets)
    val cu2 = spark.read.option("basePath", s"file:$dim").parquet(s"file:$dim")
      .filter($"user_id" === changeUser)
      .select("version", "event_type", "is_current").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getBoolean(2))).toSet
    assert(cu2 == Set((1, "A", false), (2, "B", true)), cu2)
  }

  test("deleteFromBucketTable prunes, keeps untouched bucket files, drops emptied dirs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bdel").toString
    val path = s"file:$dir"
    val nBuckets = 4
    MutationOps.upsertLatest(spark, path,
      (1L to 20L).map(k => (k, 1L, s"v$k")).toDF("k", "ord", "v"),
      Seq("k"), Seq("ord"), nBuckets)
    def files(): Map[String, Set[String]] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("bucket="))
        .map(b => b.getName -> b.listFiles().filter(_.isFile)
          .map(f => f.getName + ":" + f.lastModified()).toSet).toMap
    val before = files()
    assert(before.keySet.size == nBuckets)

    // doom EVERY key of one bucket plus one key of another
    val byBucket = spark.read.parquet(path)
      .select(org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.functions.col("bucket").cast("int").as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val buckets = byBucket.values.toSet.toSeq.sorted
    val whole = buckets.head
    val partial = buckets.last
    val doomed = byBucket.filter(_._2 == whole).keys.toSeq ++
      byBucket.filter(_._2 == partial).keys.toSeq.sorted.take(1)

    val (touched, emptied) = MutationOps.deleteFromBucketTable(
      spark, path, doomed.toDF("k"), "k", nBuckets)
    assert(touched.toSet == Set(whole, partial), touched)
    assert(emptied == Seq(whole), emptied)

    val after = files()
    assert(!after.contains(s"bucket=$whole"), after.keySet)
    before.keys.filterNot(Set(s"bucket=$whole", s"bucket=$partial"))
      .foreach { b => assert(after(b) == before(b), s"untouched $b changed") }
    val left = spark.read.parquet(path).select("k").as[Long].collect().toSet
    assert(left == byBucket.keySet -- doomed)
  }

  test("upsertLatest: stale changes never regress state; untouched buckets keep files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cdc").toString
    val path = s"file:$dir"
    val nBuckets = 4
    // seed every bucket so the untouched-bucket assertion below is not vacuous
    MutationOps.upsertLatest(spark, path,
      (1L to 20L).map(k => (k, 5L, s"v$k")).toDF("k", "ord", "v"),
      Seq("k"), Seq("ord"), nBuckets)
    def files(): Map[String, Set[String]] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("bucket="))
        .map(b => b.getName -> b.listFiles().filter(_.isFile)
          .map(f => f.getName + ":" + f.lastModified()).toSet).toMap
    val before = files()
    assert(before.keySet.size == nBuckets, before.keySet)

    // one STALE change (ord below stored), one newer change, one new key —
    // applying an out-of-order batch must converge to the arg-max state
    val touched = MutationOps.upsertLatest(spark, path,
      Seq((1L, 3L, "stale"), (3L, 9L, "fresh"), (21L, 1L, "insert"))
        .toDF("k", "ord", "v"),
      Seq("k"), Seq("ord"), nBuckets)
    assert(touched.nonEmpty && touched.size < nBuckets, touched)

    val touchedNames = touched.map(b => s"bucket=$b").toSet
    val after = files()
    before.keys.filterNot(touchedNames).foreach { b =>
      assert(after(b) == before(b), s"untouched $b was rewritten")
    }
    val got = spark.read.parquet(path)
      .select("k", "ord", "v").as[(Long, Long, String)]
      .collect().groupBy(_._1).map { case (k, rs) =>
        assert(rs.length == 1, s"key $k has ${rs.length} rows"); k -> rs.head
      }
    assert(got(1L) == ((1L, 5L, "v1")), got(1L))   // stale change rejected
    assert(got(3L) == ((3L, 9L, "fresh")), got(3L)) // newer change applied
    assert(got(21L) == ((21L, 1L, "insert")), got(21L)) // new key inserted
    assert(got(2L) == ((2L, 5L, "v2")), got(2L))   // bystander key untouched
    assert(got.size == 21, got.size)
  }
}
