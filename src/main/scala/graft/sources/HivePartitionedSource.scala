package graft.sources

import graft.core.{CsvOptions, IngestConfig, PartitionCodec, PartitionHour}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1 — hive-partitioned TSV scan (SURVEY §2.1 S1).
  *
  * The reference delegates this to a BigQuery load job over
  * `gs://bucket/year=Y/month=M/day=D/hour=H/` + star with a fixed CSV config
  * (`/root/reference/ingestion/bigquery_interaction.py:17-26`,
  * `partition.py:25-27`). Here it is a plain Spark CSV scan with an explicit
  * schema (never inferred — the reference's `CREATE_NEVER` discipline): schema
  * inference would require an extra pass over 100 TB of files and can drift
  * between partitions; the fixed schema costs nothing.
  *
  * Scale notes: reading a per-partition glob prunes at *construction* time —
  * no file listing outside the target hour ever happens, exactly like the
  * reference. Each file splits into tasks independently (CSV is splittable
  * when uncompressed), so one hour with many files parallelizes across the
  * cluster with zero shuffle.
  */
object HivePartitionedSource {

  /** Read exactly one partition-hour's files as typed rows. */
  def read(spark: SparkSession, cfg: IngestConfig, hour: PartitionHour): DataFrame =
    readGlob(spark, cfg.schema, cfg.csv,
      PartitionCodec.toGlob(cfg.sourceBase, hour), cfg.sourceFormat)

  /** Read an arbitrary glob with the configured format; the schema is always
    * caller-supplied (the reference's CREATE_NEVER discipline), never
    * inferred — for parquet that also means mismatched files fail loudly
    * instead of silently widening the schema.
    */
  def readGlob(spark: SparkSession, schema: StructType, csv: CsvOptions,
               glob: String, format: String = "csv"): DataFrame = format match {
    case "csv" =>
      spark.read.schema(schema).options(CsvOptions.toReaderOptions(csv)).csv(glob)
    case "parquet" =>
      spark.read.schema(schema).parquet(glob)
    case "json" =>
      spark.read.schema(schema)
        .option("timestampFormat", csv.timestampFormat).json(glob)
    case "orc" =>
      spark.read.schema(schema).orc(glob)
    case other =>
      throw new IllegalArgumentException(s"unsupported sourceFormat '$other'")
  }

  /** Parse a frame of raw delimiter-separated lines (`value: string`, the
    * `text` source shape — batch or streaming) under the quarantine
    * contract: schema fields plus `corruptCol` carrying the ORIGINAL line
    * for every bad row, null for good rows. A row is bad when either
    *  - any typed cell fails to parse (Univocity PERMISSIVE capture), or
    *  - its token count differs from the schema width. Spark's CSV
    *    PERMISSIVE deliberately does NOT treat wrong-arity rows as corrupt
    *    (missing trailing fields become nulls, extras are dropped), but
    *    BigQuery's `max_bad_records` counts them as bad — so arity is
    *    checked explicitly here. Exact tokenization by `split` is sound
    *    ONLY because the contract disables quoting (BQ
    *    `quote_character=''`): the delimiter can never be escaped inside a
    *    field. Callers with quoting enabled cannot use this path (require
    *    below).
    */
  def parseLinesWithCapture(lines: DataFrame, schema: StructType,
      csv: CsvOptions, corruptCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, from_csv, size, split, when}
    require(csv.quote.isEmpty,
      "arity-checked quarantine parse requires quoting disabled (the BQ " +
        "quote_character='' contract); with quoting enabled the delimiter " +
        "count is not the field count")
    val readSchema = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    val opts = CsvOptions.toReaderOptions(csv) ++ Map(
      "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)
    val delim = java.util.regex.Pattern.quote(csv.delimiter)
    val width = schema.fields.length
    lines
      .filter(col("value") =!= "") // the csv source skips blank lines; so do we
      .select(col("value"), from_csv(col("value"), readSchema, opts).as("_p"))
      .select(schema.fieldNames.map(n => col(s"_p.`$n`")).toSeq :+
        when(col(s"_p.`$corruptCol`").isNotNull ||
            size(split(col("value"), delim, -1)) =!= width,
          col("value")).as(corruptCol): _*)
  }

  /** PERMISSIVE-with-capture read — the engine side of BigQuery's
    * `max_bad_records` contract: rows that fail to parse are EXCLUDED from
    * the good frame (not silently nulled, the PERMISSIVE default; not a
    * whole-job failure, the FAILFAST mode) and surfaced as raw text for
    * quarantine/audit. Callers enforce their bad-record budget on the bad
    * frame ([[graft.operators.JobRunner]] fails the load when the count
    * exceeds `IngestConfig.maxBadRecords`, exactly BQ's semantics).
    *
    * The parsed frame is persisted for the scope of `f` and unpersisted
    * after — `f` MUST materialize everything it needs (count, land, write)
    * before returning; frames that escape `f` are invalid. This is not
    * just a performance contract: recomputing the split from the raw files
    * under CSV column pruning CHANGES the classification — a row whose
    * only malformed cell sits in a column the downstream plan never reads
    * is no longer flagged corrupt (the parser only attempts required
    * columns), so a lazily-escaped `good` frame can silently grow rows.
    * One materialization inside the persisted scope pins one consistent
    * classification for both splits. Row-level capture exists for
    * row-structured formats (csv/json); parquet/orc corruption is
    * file-level and fails the scan.
    */
  def withQuarantine[T](spark: SparkSession, schema: StructType,
      csv: CsvOptions, glob: String, format: String = "csv")(
      f: (DataFrame, DataFrame) => T): T = {
    import org.apache.spark.sql.functions.col
    val corruptCol = "_graft_corrupt"
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already contains reserved column $corruptCol")
    val readSchema = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    val parsed = (format match {
      case "csv" if csv.quote.isEmpty && !csv.header =>
        // The reference contract (no quoting, no header): read raw lines
        // and parse via parseLinesWithCapture, which ALSO quarantines
        // wrong-arity rows — BQ counts those as bad records, Spark's CSV
        // PERMISSIVE does not.
        parseLinesWithCapture(spark.read.text(glob), schema, csv, corruptCol)
      case "csv" =>
        // Quoted/headered CSV: quoting makes line-splitting unsound (and
        // embedded newlines break the text source), so only cell-level
        // parse failures are captured — a documented divergence from BQ's
        // bad-record counting for wrong-arity rows under these configs.
        spark.read.schema(readSchema)
          .options(CsvOptions.toReaderOptions(csv) ++ Map(
            "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol))
          .csv(glob)
      case "json" =>
        spark.read.schema(readSchema)
          .option("timestampFormat", csv.timestampFormat)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", corruptCol)
          .json(glob)
      case other => throw new IllegalArgumentException(
        s"quarantine read is row-level; unsupported for format '$other'")
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val good = parsed.filter(col(corruptCol).isNull)
        .select(schema.fieldNames.map(col).toSeq: _*)
      val bad = parsed.filter(col(corruptCol).isNotNull)
        .select(col(corruptCol).as("raw_record"))
      f(good, bad)
    } finally { parsed.unpersist(); () }
  }

  /** Read a whole hive-partitioned tree (partition columns year/month/day/hour
    * surface as columns via Spark partition discovery). Used for multi-hour
    * reads / backfill verification; per-hour ingest prefers [[read]].
    */
  def readTree(spark: SparkSession, cfg: IngestConfig, basePath: String): DataFrame = {
    val r = spark.read
      .schema(cfg.schema)
      .options(CsvOptions.toReaderOptions(cfg.csv))
      .option("basePath", basePath)
    val pattern = basePath + "/year=*/month=*/day=*/hour=*"
    cfg.sourceFormat match {
      case "csv"     => r.csv(pattern)
      case "parquet" => r.parquet(pattern)
      case "json"    => r.json(pattern)
      case "orc"     => r.orc(pattern)
      case other =>
        throw new IllegalArgumentException(s"unsupported sourceFormat '$other'")
    }
  }
}
