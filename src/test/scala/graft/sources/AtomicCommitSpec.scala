package graft.sources

import graft.SparkSpec
import graft.core._
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean

/** Stage-and-swap commit (LandingTable.overwritePartitionsStaged): a reader
  * racing repeated overwrites of one partition must never observe a TORN
  * partition — every successful read returns exactly one generation's full
  * content (count AND content-marker agree), never a mix of generations or
  * a partial file set. Transient absence/read errors during the two-rename
  * window are legitimate retryable outcomes and are ignored.
  */
class AtomicCommitSpec extends SparkSpec {

  val schema = StructType(Seq(
    StructField("event_ts", TimestampType),
    StructField("device_id", StringType),
    StructField("bytes", LongType)))

  private val h = PartitionHour(2023, 6, 27, 12)

  private def frame(marker: String, rows: Int) = {
    import scala.jdk.CollectionConverters._
    val data = (0 until rows).map { i =>
      org.apache.spark.sql.Row(
        java.sql.Timestamp.valueOf(f"2023-06-27 12:${i % 60}%02d:00"),
        s"$marker-$i", marker.length.toLong)
    }.asJava
    // several input partitions => several staged files per partition dir,
    // so a torn read (subset of files) would show as a wrong count
    spark.createDataFrame(data, schema).repartition(4)
  }

  test("concurrent reader never sees a torn partition during staged overwrite") {
    val landing = Files.createTempDirectory("graft-atomic")
    val cfg = IngestConfig(sourceBase = "unused", landingPath = s"file:$landing",
      schema = schema, partitionField = "event_ts", clusterField = "device_id")

    val gens = Seq("old" -> 40, "new" -> 25)
    LandingTable.overwritePartitions(frame(gens(0)._1, gens(0)._2), cfg)

    val done = new AtomicBoolean(false)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Set[String])]()
    val reader = new Thread(() => {
      while (!done.get()) {
        try {
          val rows = LandingTable.readPartition(spark, cfg, h)
            .select("device_id").collect()
          val markers = rows.map(_.getString(0).takeWhile(_ != '-')).toSet
          seen.add((rows.length.toLong, markers))
        } catch { case _: Throwable => () } // clean transient error: retryable
      }
    })
    reader.start()
    try {
      (1 to 6).foreach { i =>
        val (m, n) = gens(i % 2)
        LandingTable.overwritePartitions(frame(m, n), cfg)
      }
    } finally {
      done.set(true)
      reader.join(30000)
    }

    val valid = gens.map { case (m, n) => (n.toLong, Set(m)) }.toSet
    // a reader whose partition listing lands inside the two-rename window
    // legitimately sees the hour absent => 0 rows; per the commit contract
    // that is a retryable transient observation, like a read error — not torn
    val transientAbsence = (0L, Set.empty[String])
    val observed = seen.toArray(Array.empty[(Long, Set[String])]).toSet
    assert(observed.nonEmpty, "reader never completed a read")
    val torn = observed -- valid - transientAbsence
    assert(torn.isEmpty, s"torn reads observed: $torn")
  }

  test("staged and dynamic commits produce identical table content") {
    val l1 = Files.createTempDirectory("graft-eq-staged")
    val l2 = Files.createTempDirectory("graft-eq-dyn")
    def cfgAt(p: java.nio.file.Path, atomic: Boolean) = IngestConfig(
      sourceBase = "unused", landingPath = s"file:$p", schema = schema,
      partitionField = "event_ts", clusterField = "device_id",
      atomicCommit = atomic)
    Seq("old" -> 12, "new" -> 9).foreach { case (m, n) =>
      LandingTable.overwritePartitions(frame(m, n), cfgAt(l1, atomic = true))
      LandingTable.overwritePartitions(frame(m, n), cfgAt(l2, atomic = false))
    }
    val a = LandingTable.read(spark, cfgAt(l1, atomic = true))
      .select("device_id", "bytes", "year", "month", "day", "hour")
    val b = LandingTable.read(spark, cfgAt(l2, atomic = false))
      .select("device_id", "bytes", "year", "month", "day", "hour")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() == 9)
  }

  test("staged commit leaves no staging/trash residue and replaces exactly one hour") {
    val landing = Files.createTempDirectory("graft-atomic2")
    val cfg = IngestConfig(sourceBase = "unused", landingPath = s"file:$landing",
      schema = schema, partitionField = "event_ts", clusterField = "device_id")
    LandingTable.overwritePartitions(frame("old", 10), cfg)
    // second hour, then re-commit the first: the second must be untouched
    val other = frame("oth", 7).withColumn("event_ts",
      org.apache.spark.sql.functions.expr("event_ts + INTERVAL 1 HOUR"))
    LandingTable.overwritePartitions(other, cfg)
    LandingTable.overwritePartitions(frame("new", 4), cfg)

    assert(LandingTable.readPartition(spark, cfg, h).count() == 4)
    assert(LandingTable.readPartition(spark, cfg,
      PartitionHour(2023, 6, 27, 13)).count() == 7)
    val leftovers = Files.list(landing).iterator()
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    while (leftovers.hasNext) names += leftovers.next().getFileName.toString
    assert(!names.exists(n => n.startsWith(".staging") || n.startsWith(".trash")),
      names.mkString(","))
  }

  test("failed-swap rollback restores displaced partitions from trash") {
    import org.apache.hadoop.fs.Path
    val landing = Files.createTempDirectory("graft-rollback")
    val cfg = IngestConfig(sourceBase = "unused", landingPath = s"file:$landing",
      schema = schema, partitionField = "event_ts", clusterField = "device_id")
    LandingTable.overwritePartitions(frame("old", 10), cfg)

    val root = new Path(cfg.landingPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rel = "year=2023/month=06/day=27/hour=12"
    val live = new Path(root, rel)
    val trash = new Path(root, ".trash-test")

    // manufacture the mid-failure state the ADVICE scenario describes:
    // rename(live, trash) succeeded, rename(staged, live) never did
    fs.mkdirs(new Path(trash, rel).getParent)
    assert(fs.rename(live, new Path(trash, rel)))
    assert(!fs.exists(live))

    assert(LandingTable.restoreFromTrash(fs, root, trash,
      LandingTable.PartitionCols.map(c => s"$c=*").mkString("/")),
      "restore must report full success")
    assert(LandingTable.readPartition(spark, cfg, h).count() == 10,
      "pre-commit content must be back after rollback")

    // superseded case: live already holds the new generation => trash copy
    // is stale, restore must leave live alone and still report success
    val trash2 = new Path(root, ".trash-test2")
    fs.mkdirs(new Path(trash2, rel).getParent)
    LandingTable.overwritePartitions(frame("new", 4), cfg) // live = new gen
    // plant a stale copy in trash2
    val stale = frame("stale", 3)
    LandingTable.overwritePartitions(stale, IngestConfig(
      sourceBase = "unused", landingPath = s"file:$landing/.trash-scratch",
      schema = schema, partitionField = "event_ts", clusterField = "device_id"))
    assert(fs.rename(new Path(s"$landing/.trash-scratch/$rel"), new Path(trash2, rel)))
    assert(LandingTable.restoreFromTrash(fs, root, trash2,
      LandingTable.PartitionCols.map(c => s"$c=*").mkString("/")))
    assert(LandingTable.readPartition(spark, cfg, h).count() == 4,
      "superseded trash copy must not clobber committed content")
  }
}
