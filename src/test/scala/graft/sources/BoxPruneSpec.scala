package graft.sources

import graft.SparkSpec
import graft.functions.GraftFunctions
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** 2-D box skipping (FileStatsManifest.prunedReadBox + graft_hilbert):
  * the Hilbert layout must beat a 1-D sort on file count for a box query
  * that constrains both dimensions, and pruning must never change results.
  */
class BoxPruneSpec extends SparkSpec {

  // the full 64×64 grid: one row per cell, both dims uniform
  private def grid() = {
    spark.range(0, 64L * 64)
      .select((col("id") / 64).cast("long").as("u"),
        (col("id") % 64).as("e"))
      .withColumn("v", col("u") * 1000 + col("e"))
  }

  test("hilbert layout prunes a 2-D box harder than a 1-D sort") {
    val g = grid()
    val linDir = Files.createTempDirectory("graft-box-lin").toString
    val hilDir = Files.createTempDirectory("graft-box-hil").toString
    g.repartitionByRange(64, col("u"), col("e"))
      .write.mode("overwrite").parquet(s"file:$linDir")
    g.withColumn("hkey", GraftFunctions.hilbert(col("u"), col("e"), 6))
      .repartitionByRange(64, col("hkey")).drop("hkey")
      .write.mode("overwrite").parquet(s"file:$hilDir")
    FileStatsManifest.write(spark, s"file:$linDir", Seq("u", "e"))
    FileStatsManifest.write(spark, s"file:$hilDir", Seq("u", "e"))

    // a 16×16 box deliberately straddling 8×8 block seams
    val box = Seq(("u", 20L, 35L), ("e", 20L, 35L))
    val (linDf, linSel, linTot) =
      FileStatsManifest.prunedReadBox(spark, s"file:$linDir", box)
    val (hilDf, hilSel, hilTot) =
      FileStatsManifest.prunedReadBox(spark, s"file:$hilDir", box)
    assert(linTot == 64 && hilTot == 64, s"($linTot, $hilTot)")
    // 1-D layout: the box's 16 u-values span ~16 of 64 u-sorted files (the
    // e-dim ranges are full-width and prune nothing). Hilbert: the box
    // covers 9 of the 64 8×8 curve blocks; range-sampling jitter can smear
    // block boundaries across files, so pin the ORDER (≤12), not the ideal
    assert(hilSel < linSel,
      s"hilbert must beat the 1-D sort: $hilSel vs $linSel of 64")
    assert(hilSel <= 12, s"hilbert box selected $hilSel of 64 files")

    // exactness: both layouts return exactly the box rows
    val want = (for (u <- 20L to 35L; e <- 20L to 35L)
      yield (u, e, u * 1000 + e)).toSet
    Seq(linDf, hilDf).foreach { df =>
      val got = df.select("u", "e", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, "box pruning changed the result set")
    }
  }

  test("box pruning keeps unmanifested files (stale-safe) and empty boxes") {
    val dir = Files.createTempDirectory("graft-box-stale").toString
    grid().withColumn("hkey", GraftFunctions.hilbert(col("u"), col("e"), 6))
      .repartitionByRange(16, col("hkey")).drop("hkey")
      .write.mode("overwrite").parquet(s"file:$dir")
    FileStatsManifest.write(spark, s"file:$dir", Seq("u", "e"))
    // post-manifest ingest lands cells far outside the original grid
    spark.range(0, 4)
      .select((col("id") + 100).as("u"), (col("id") + 100).as("e"),
        lit(-1L).as("v"))
      .coalesce(1).write.mode("append").parquet(s"file:$dir")

    val (df, nSel, nTot) = FileStatsManifest.prunedReadBox(
      spark, s"file:$dir", Seq(("u", 100L, 200L), ("e", 100L, 200L)))
    assert(nTot == 17, s"16 known + 1 unknown file, saw $nTot")
    assert(nSel >= 1)
    assert(df.select("u").collect().map(_.getLong(0)).toSet ==
      (100L until 104L).toSet, "rows in the unmanifested file must survive")

    // a box no file intersects selects only the unknown file, zero rows
    val (df2, nSel2, _) = FileStatsManifest.prunedReadBox(
      spark, s"file:$dir", Seq(("u", 500L, 600L), ("e", 0L, 63L)))
    assert(nSel2 == 1, s"only the unmanifested file may survive: $nSel2")
    assert(df2.count() == 0)
  }
}
