package graft.streaming

import graft.core.{CsvOptions, IngestConfig}
import graft.sources.LandingTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming form of the reference pipeline (SURVEY §2.2
  * "Streaming", §7.4): the reference implements late-data tolerance as a
  * *schedule offset* — hourly cron at minute :40 gives records 40 minutes to
  * arrive before their hour is loaded (`/root/reference/commands.sh:73`,
  * `README.md:41-47`). The streaming-native translation:
  *
  *  - the hive TSV tree becomes a file *stream* source (new files are
  *    discovered per micro-batch — the event push the reference's cron poll
  *    approximates);
  *  - the 40-minute grace becomes `withWatermark("ts", "40 minutes")`;
  *  - the hourly partition becomes a 1-hour tumbling window;
  *  - the truncate-and-replace partition load becomes Append-mode windowed
  *    aggregation + `foreachBatch` dynamic partition overwrite: a window is
  *    emitted exactly once, when the watermark passes hour-end + grace — i.e.
  *    each landing partition is written once, complete, like the reference's
  *    `WRITE_TRUNCATE` decorator load.
  *
  * Scale notes: the only state is one (window, agg) row per open hour —
  * bounded by the watermark, independent of throughput. Raw landing
  * (`rawToLanding`) is stateless pass-through with file-listing as the only
  * driver-side cost; use partitioned directories + `maxFilesPerTrigger` to
  * bound batch size on a 100 TB/day feed.
  */
object StreamingIngest {

  /** Continuous raw landing: stream new TSV files into the hive-partitioned
    * landing tree (append; a partition accumulates files as they arrive).
    */
  def rawToLanding(spark: SparkSession, cfg: IngestConfig,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val raw = spark.readStream
      .schema(cfg.schema)
      .options(CsvOptions.toReaderOptions(cfg.csv))
      .csv(s"${cfg.sourceBase.stripSuffix("/")}/year=*/month=*/day=*/hour=*")
    LandingTable.withPartitionColumns(raw, cfg.partitionField)
      .writeStream
      .partitionBy(LandingTable.PartitionCols: _*)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .format("parquet")
      .option("path", cfg.landingPath)
      .start()
  }

  /** Streaming BACKFILL of one past hour — the stream-native form of the
    * reference's backfill story (re-run the hour's load job; the decorator's
    * `WRITE_TRUNCATE` makes the re-run idempotent,
    * `/root/reference/README.md:49-60`, `bigquery_interaction.py:18-20`):
    * stream exactly that hour's raw files (directory-pruned source glob — no
    * other hour is even listed) into the landing table through the same
    * atomic truncate-and-replace commit batch ingest uses. Partitions not
    * present in the replayed batch are physically untouched, so a backfill
    * can run next to live traffic on other hours.
    *
    * Batch-atomicity contract: each micro-batch overwrites the partitions IT
    * contains, so the replayed hour must arrive as one batch — leave
    * `maxFilesPerTrigger` unset and `Trigger.AvailableNow` delivers all
    * files of the hour in a single batch, mirroring the reference's
    * one-job-per-hour atomicity unit. (A multi-batch feed would need a
    * stage-then-swap at query end; per-hour backfill doesn't.) The contract
    * is ENFORCED, not just documented: a second non-empty batch (someone
    * passed `maxFilesPerTrigger`, or a non-AvailableNow trigger split the
    * hour) fails the query loudly instead of silently leaving only the last
    * batch's rows in the partition.
    */
  def backfillHour(spark: SparkSession, cfg: IngestConfig,
      hour: graft.core.PartitionHour, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val raw = spark.readStream
      .schema(cfg.schema)
      .options(CsvOptions.toReaderOptions(cfg.csv))
      .csv(graft.core.PartitionCodec.toDir(cfg.sourceBase, hour))
    raw.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          require(batchId == 0,
            s"backfillHour($hour): hour split across micro-batches (non-empty " +
            s"batch $batchId after batch 0) — each overwrite replaces the " +
            "partition, so a split delivery would keep only the last batch; " +
            "run with Trigger.AvailableNow and maxFilesPerTrigger unset")
          LandingTable.overwritePartitions(batch, cfg)
        }
      }
      .start()
  }

  /** Watermarked hourly aggregate stream: emits each hour's final count
    * exactly once, `graceMinutes` after the hour closes (append mode — only
    * watermark-closed windows leave the operator), into a batch-keyed stats
    * table.
    *
    * Sink layout: one `batch=<id>` directory per emission micro-batch,
    * overwritten on replay — so a retried batch converges (the decorator
    * idempotency story applied at the batch grain) and the table never
    * fragments into one directory per hour. Per-hour hive partitioning is
    * right for the 100 TB LANDING table (scan pruning pays for the
    * directories; see `rawToLanding`/`LandingTable`); for a derived stats
    * table of one ROW per hour it is pathological — 8,760 directories a
    * year each holding a few bytes, with every write and every read paying
    * per-directory metadata cost. Append-once emission already makes rows
    * immutable, so batch-grain idempotency is exactly as strong.
    */
  def hourlyStats(spark: SparkSession, cfg: IngestConfig, statsPath: String,
      checkpoint: String, graceMinutes: Int = 40,
      trigger: Trigger = Trigger.AvailableNow(),
      dayGlob: String = "*"): StreamingQuery = {
    // dayGlob prunes the replay at the DIRECTORY level (days outside the
    // glob are never even listed) — the windowing semantics are per-window,
    // so a scoped replay is the same operator over fewer partitions
    val raw = spark.readStream
      .schema(cfg.schema)
      .options(CsvOptions.toReaderOptions(cfg.csv))
      .csv(s"${cfg.sourceBase.stripSuffix("/")}/year=*/month=*/day=$dayGlob/hour=*")
    val agg = raw
      .withWatermark(cfg.partitionField, s"$graceMinutes minutes")
      .groupBy(window(col(cfg.partitionField), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("hour_ts"), col("cnt"))

    agg.writeStream
      .outputMode("append") // final windows only (watermark-closed)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // persist: the emptiness probe and the write would otherwise each
        // recompute the batch — for a flush batch that means replaying the
        // whole state-store drain twice
        batch.persist()
        try {
          if (!batch.isEmpty)
            batch.coalesce(1).write.mode("overwrite")
              .parquet(s"${statsPath.stripSuffix("/")}/batch=$id")
        } finally { batch.unpersist(); () }
      }
      .start()
  }
}
