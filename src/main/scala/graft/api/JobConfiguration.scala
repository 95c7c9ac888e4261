package graft.api

import graft.core.{CsvOptions, IngestConfig}

/** Per-request `job_configuration` passthrough — the reference's ingest
  * endpoint accepts an open config dict on the PUT body that replaces the
  * default CSV load config for that one job
  * (`/root/reference/ingestion/app.py:29-33`, default dict
  * `/root/reference/ingestion/bigquery_interaction.py:17-26`, advertised in
  * `README.md:5-7`). Here the dict's BigQuery key vocabulary maps onto
  * reader/format overrides of the endpoint's base [[IngestConfig]]:
  *
  *  - `source_format`: `CSV` | `PARQUET` | `NEWLINE_DELIMITED_JSON` →
  *    [[IngestConfig.sourceFormat]]
  *  - `field_delimiter`, `quote_character`, `encoding` → [[CsvOptions]]
  *  - `skip_leading_rows`: `0` | `1` → header off/on (BigQuery's CSV loads
  *    skip N rows; row 1 is the header case — larger values have no Spark
  *    reader equivalent and are rejected rather than silently mis-parsed)
  *  - `write_disposition` / `create_disposition`: the reference pipeline is
  *    pinned to `WRITE_TRUNCATE` / `CREATE_NEVER` (partition replace into a
  *    pre-created table); any other value is rejected loudly, not ignored
  *
  * Unknown keys are REJECTED (422 at the wire), matching the principle that
  * a config typo must not silently fall back to defaults. The body's
  * `bucket_name`/`dataset_id`/`table_id` fields are accepted and ignored:
  * those resource ids are carried by the endpoint's [[IngestConfig]] paths
  * in this engine (documented in [[IngestApi]]).
  */
object JobConfiguration {

  private val AllowedKeys = Set("create_disposition", "write_disposition",
    "source_format", "field_delimiter", "skip_leading_rows",
    "quote_character", "encoding", "max_bad_records")

  /** Apply a PUT body's `job_configuration` (if any) onto `base`. An empty
    * or bodyless request returns `base` unchanged — the reference's default
    * config IS the base config. Malformed JSON or unsupported values throw
    * `IllegalArgumentException` (surfaced as 422, FastAPI's validation
    * status).
    */
  def applyOverrides(base: IngestConfig, body: String): IngestConfig = {
    if (body == null || body.trim.isEmpty) return base
    val root =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"malformed request body: ${e.getMessage}")
      }
    require(root.isObject, "request body must be a JSON object")
    val jc = root.get("job_configuration")
    if (jc == null || jc.isNull) return base
    require(jc.isObject, "job_configuration must be a JSON object of strings")

    var cfg = base
    val it = jc.properties().iterator()
    while (it.hasNext) {
      val e = it.next()
      val key = e.getKey
      require(AllowedKeys(key),
        s"unknown job_configuration key '$key' (allowed: ${AllowedKeys.toSeq.sorted.mkString(", ")})")
      require(e.getValue.isTextual,
        s"job_configuration.$key must be a string")
      val v = e.getValue.asText()
      cfg = key match {
        case "source_format" => v match {
          case "CSV"                     => cfg.copy(sourceFormat = "csv")
          case "PARQUET"                 => cfg.copy(sourceFormat = "parquet")
          case "NEWLINE_DELIMITED_JSON"  => cfg.copy(sourceFormat = "json")
          case "ORC"                     => cfg.copy(sourceFormat = "orc")
          case other => throw new IllegalArgumentException(
            s"unsupported source_format '$other'")
        }
        case "field_delimiter" =>
          require(v.nonEmpty, "field_delimiter must be non-empty")
          cfg.copy(csv = cfg.csv.copy(delimiter = v))
        case "quote_character" =>
          cfg.copy(csv = cfg.csv.copy(quote = v))
        case "encoding" =>
          cfg.copy(csv = cfg.csv.copy(encoding = v))
        case "skip_leading_rows" => v match {
          case "0" => cfg.copy(csv = cfg.csv.copy(header = false))
          case "1" => cfg.copy(csv = cfg.csv.copy(header = true))
          case other => throw new IllegalArgumentException(
            s"unsupported skip_leading_rows '$other' (0 or 1)")
        }
        case "max_bad_records" =>
          val n = try v.toInt catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"max_bad_records must be a non-negative integer, got '$v'")
          }
          require(n >= 0, s"max_bad_records must be >= 0, got $n")
          cfg.copy(maxBadRecords = n)
        case "write_disposition" =>
          require(v == "WRITE_TRUNCATE",
            s"unsupported write_disposition '$v' (partition loads are WRITE_TRUNCATE)")
          cfg
        case "create_disposition" =>
          require(v == "CREATE_NEVER",
            s"unsupported create_disposition '$v' (tables are pre-created, CREATE_NEVER)")
          cfg
      }
    }
    cfg
  }
}
