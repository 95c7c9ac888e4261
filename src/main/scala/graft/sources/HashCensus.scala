package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed canonical-hash census — the incremental-dedup side table that
  * keeps d37-style "is this document already in the corpus?" probes
  * O(census), never O(corpus).
  *
  * Without it, every incoming batch anti-joins against
  * `SnapshotLog.read(priorCut).select(hash).distinct()` — a corpus-wide
  * scan + distinct shuffle per batch, which contradicts the incremental
  * op's own cost-∝-batch contract on the read side. The census instead
  * persists exactly the distinct hash column, maintained PER COMMIT with
  * cost ∝ the committed batch:
  *
  *  - the table is a catalog-registered parquet table CLUSTERED BY (h)
  *    into [[Buckets]] buckets (the b1 bucketed-join machinery), so a
  *    probe anti-join reads it bucket-aligned — Spark shuffles only the
  *    BATCH side to the bucket count; the census itself never re-shuffles;
  *  - each commit appends only the hashes of the rows it committed.
  *    Successive d37-style commits keep hashes disjoint by construction
  *    (a batch is anti-joined against the census before it commits), so
  *    append-only maintenance preserves distinctness without rewrites;
  *  - one narrow column: at 10^10 corpus rows the census is ~hash-width ×
  *    N bytes — three orders below the corpus text it stands in for.
  *
  * The census is a CACHE of the snapshot's hash set, not the truth: the
  * snapshot manifest remains the reproducibility contract, and a census
  * rebuilt from any cut (`append(distinct hashes of the cut)`) converges
  * to the same table.
  */
object HashCensus {

  val Buckets = 16

  /** Append `hashes` (a one-column `h` frame) to the census `name`,
    * creating the bucketed table on first use. Cost ∝ the appended frame.
    */
  def append(spark: SparkSession, name: String, hashes: DataFrame): Unit =
    hashes.select(col("h"))
      .write.mode("append").format("parquet")
      .bucketBy(Buckets, "h").sortBy("h")
      .saveAsTable(name)

  /** The census as a bucketed scan — anti-join probes against this read
    * the bucket files directly (no exchange on the census side once the
    * planner sees the bucket spec).
    */
  def probe(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Drop the census (managed table — files go with it). Gate queries that
    * rebuild their snapshot from scratch call this first so repeated runs
    * cannot cross-contaminate. The warehouse LOCATION is removed even when
    * the catalog has no such table: an in-memory catalog dies with its
    * JVM but the warehouse directory survives, and a leftover location
    * blocks the next run's table creation (LOCATION_ALREADY_EXISTS).
    */
  def drop(spark: SparkSession, name: String,
      warehouseDir: Option[String] = None): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // resolve the warehouse through the Hadoop FileSystem of its OWN URI —
    // a java.io.File recursion would silently no-op (and leak the table
    // location) the moment the warehouse is hdfs:/s3a:-style rather than
    // file:, which is exactly the default-FS leak MockFsSpec polices.
    // `warehouseDir` override exists for tests: the session's warehouse
    // conf is static, so the mockfs: case passes its own.
    val warehouse = new org.apache.hadoop.fs.Path(
      warehouseDir.getOrElse(spark.conf.get("spark.sql.warehouse.dir")))
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(warehouse, name.toLowerCase), true)
  }
}
