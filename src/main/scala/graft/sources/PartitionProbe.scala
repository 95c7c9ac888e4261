package graft.sources

import graft.core.{IngestConfig, PartitionCodec, PartitionHour}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** P3 — partition-existence probe (SURVEY §2.1 P3).
  *
  * The reference answers "does this hour have any raw files?" with a GCS
  * `list_blobs(prefix, max_results=1)` short-circuit
  * (`/root/reference/ingestion/app.py:96-104`), consumed by the workflow to
  * skip the ingest step entirely when empty (`workflow.yaml:25-35`).
  *
  * Spark-native: a driver-only Hadoop `FileSystem.globStatus` on the partition
  * glob — the same code path serves `file://` locally and `gs://` on a cluster
  * (via the GCS connector), and returns before any Spark job is scheduled.
  * Like the reference's `max_results=1`, this never lists outside the one
  * partition prefix, so cost is O(files-in-hour) regardless of table size.
  */
object PartitionProbe {

  def exists(spark: SparkSession, cfg: IngestConfig, hour: PartitionHour): Boolean =
    globNonEmpty(spark, PartitionCodec.toGlob(cfg.sourceBase, hour))

  def globNonEmpty(spark: SparkSession, glob: String): Boolean = {
    val path = new Path(glob)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = fs.globStatus(path)
    matches != null && matches.nonEmpty
  }
}
