package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) tables: the co-located-join path for repeated
  * large-to-large joins on a stable key.
  *
  * A normal shuffle join re-partitions BOTH sides on every query; bucketing
  * pays that shuffle ONCE at write time (`bucketBy(n, key)` +
  * `sortBy(key)`), records the layout in the catalog, and every subsequent
  * join/aggregation on the bucket key plans with ZERO exchanges (verified in
  * `BucketedTablesSpec` by asserting no ShuffleExchange in the physical
  * plan). At 100 TB this is the difference between re-shuffling the fact
  * table per query and never shuffling it at all; bucket count should be
  * sized so one bucket ≈ one task's worth of data (128-256 MB).
  */
object BucketedTables {

  /** The warehouse location of `table`, resolved through the Hadoop
    * FileSystem of the warehouse URI — never java.io.File, which would
    * silently target the local disk when the warehouse is hdfs:/s3a:-style
    * (the default-FS leak MockFsSpec polices).
    */
  private def tableDir(spark: SparkSession, table: String): (FileSystem, Path) = {
    val warehouse = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, new Path(warehouse, table.toLowerCase))
  }

  /** Write `df` as a bucketed+sorted managed parquet table. Re-runs from a
    * fresh session must converge: an in-memory catalog forgets the table
    * between JVMs while its warehouse directory survives, and CREATE on a
    * non-empty managed location is an error — so drop both first.
    */
  def save(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val (fs, dir) = tableDir(spark, table)
    if (fs.exists(dir)) fs.delete(dir, true)
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** [[save]] memoized across runs AND JVMs: a hidden marker in the table
    * directory records (bucketCol, buckets, row count, content
    * fingerprint); when it matches, the parquet buckets on disk are the
    * ones this `df` would rewrite, so the write is skipped — and a fresh
    * JVM (whose in-memory catalog forgot the table) re-registers the
    * existing files with an external `CLUSTERED BY ... INTO n BUCKETS` DDL
    * instead of re-shuffling the data. That re-registration is exactly what
    * a production deployment does on restart: bucket layout is catalog
    * METADATA over immutable files; only the data write pays the shuffle,
    * once.
    *
    * The fingerprint is an order-independent xor of per-row xxhash64 over
    * all columns, computed in the same single aggregate pass as the count —
    * a data change that preserves row count (the stale-reuse hazard of a
    * count-only stamp) flips it. One scan of the input per call is the
    * honest price of memoization; it is what the write would read anyway.
    */
  def saveOrReuse(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    val (fs, dir) = tableDir(spark, table)
    val marker = new Path(dir, "._bucketed_ok")
    val idRow = df.selectExpr("count(*) AS n",
      "coalesce(bit_xor(xxhash64(*)), 0L) AS fp").collect()(0)
    val stamp = s"$bucketCol|$buckets|${idRow.getLong(0)}|${idRow.getLong(1)}"
    val markerValid = readMarker(fs, marker).contains(stamp)
    if (!markerValid) {
      save(df, table, bucketCol, buckets)
      val out = fs.create(marker, true)
      try out.write(stamp.getBytes("UTF-8")) finally out.close()
    } else if (!spark.catalog.tableExists(table)) {
      spark.sql(
        s"""CREATE TABLE $table (${df.schema.toDDL})
           |USING parquet
           |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol)
           |INTO $buckets BUCKETS
           |LOCATION '$dir'""".stripMargin)
    }
  }

  private def readMarker(fs: FileSystem, marker: Path): Option[String] =
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }

  /** Join two same-bucketed tables on their bucket key — plans shuffle-free
    * (SortMergeJoin over the bucketed scans).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
