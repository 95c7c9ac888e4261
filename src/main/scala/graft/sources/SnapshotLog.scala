package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot-versioned table (time travel) over plain parquet — the
  * lakehouse commit model (Iceberg/Delta's core idea) with zero table-format
  * dependencies: data files are IMMUTABLE once written, and a version is
  * nothing but a manifest listing the files that constitute it. A commit
  * writes only its NEW files (into its own `data/commit-v{N}/` directory,
  * `mode=errorifexists` so immutability is enforced, not assumed) and a new
  * manifest that carries forward every surviving file from the parent
  * version by reference. Readers of version N resolve its manifest and scan
  * exactly those files — a later commit can never disturb them, which is
  * the reproducibility contract a training run needs ("the corpus as of
  * snapshot N", stable forever).
  *
  * The reference has no versioning story (BigQuery truncate-and-load
  * destroys history); this closes that gap the Spark-first way.
  *
  * Scale notes: a manifest is one line per file — O(file count), written
  * once per commit, never rewritten; copy-on-write means an update's cost
  * is proportional to the files it REPLACES, never table size (the u1/u2
  * discipline lifted from partition granularity to file granularity).
  * Partition/stats-based skipping composes via [[FileStatsManifest]] over
  * the same file list; time-travel reads prune with it exactly like head
  * reads. Manifest publication is atomic via the tmp-then-rename the
  * staged-commit sink uses, so a concurrent reader sees the old version or
  * the new one, never a torn file list.
  */
object SnapshotLog {

  private def logDir(tablePath: String) =
    new java.io.File(tablePath.stripPrefix("file:"), "_graft_log")

  private def versionFile(tablePath: String, v: Int) =
    new java.io.File(logDir(tablePath), f"v$v%05d.manifest")

  def latestVersion(tablePath: String): Option[Int] = {
    val fs = Option(logDir(tablePath).listFiles()).getOrElse(Array.empty)
    val vs = fs.map(_.getName).collect {
      case n if n.matches("v\\d{5}\\.manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toInt
    }
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Files constituting `version`, as absolute paths. */
  def manifest(tablePath: String, version: Int): Seq[String] = {
    val f = versionFile(tablePath, version)
    require(f.exists(), s"snapshot v$version does not exist at $tablePath")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().filter(_.nonEmpty).toList finally src.close()
  }

  /** Commit a new snapshot: `newData` becomes immutable parquet files under
    * this commit's own directory; the manifest = `carried` (surviving parent
    * files, by reference) ++ the new files. Returns the new version number.
    */
  def commit(spark: SparkSession, tablePath: String, newData: DataFrame,
      carried: Seq[String]): Int = {
    val v = latestVersion(tablePath).getOrElse(0) + 1
    val dataDir = new java.io.File(
      tablePath.stripPrefix("file:"), f"data/commit-v$v%05d")
    newData.write.mode("error").parquet(s"file:$dataDir")
    val fresh = Option(dataDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .map(f => s"file:${f.getAbsolutePath}").toSeq
    val lines = (carried ++ fresh).sorted
    logDir(tablePath).mkdirs()
    val tmp = new java.io.File(logDir(tablePath), s".v$v.tmp")
    java.nio.file.Files.write(tmp.toPath,
      lines.mkString("\n").getBytes("UTF-8"))
    val target = versionFile(tablePath, v)
    require(!target.exists(), s"concurrent commit of v$v at $tablePath")
    require(tmp.renameTo(target), s"manifest publish failed for v$v")
    v
  }

  /** Scan exactly the files of `version` — immune to any later commit. */
  def read(spark: SparkSession, tablePath: String, version: Int): DataFrame =
    spark.read.parquet(manifest(tablePath, version): _*)
}
