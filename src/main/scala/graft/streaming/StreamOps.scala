package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the event/dedup operators.
  *
  * The reference has no streaming at all (SURVEY.md §2.6) — its
  * re-sync-on-demand loop with the accumulate merge IS a hand-rolled
  * incremental state update. These lift the batch column expressions
  * unchanged onto `readStream` inputs: the transformations are
  * identical Catalyst plans, only the sink/trigger layer differs, so
  * batch specs double as semantics tests for the streaming path.
  *
  * Scale notes: every op below keys its state by a bounded-cardinality
  * key (window × type, user session, content hash within watermark),
  * so state store size is O(active keys), not O(stream length); the
  * watermark bounds both late data and state retention.
  */
object StreamOps {

  /** E1 streaming: tumbling 1-hour counts per event type with a
    * watermark for late-data cutoff. Append-mode capable: windows
    * finalize when the watermark passes window end. */
  def tumblingCounts(events: DataFrame,
      watermark: String = "2 hours", width: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** E2 streaming: session windows per user with a 30-minute
    * inactivity gap — the built-in `session_window` replaces the
    * batch gaps-and-islands window sort; state is one open session
    * per active user. */
  def sessionize(events: DataFrame,
      watermark: String = "2 hours", gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming exact dedup: first occurrence per content fingerprint
    * within the watermark horizon — `dropDuplicates` keyed on the
    * hash keeps state bounded by the watermark, the standard
    * at-most-once-per-key ingestion guard for a training-data feed. */
  def dedupStream(docs: DataFrame, tsCol: String = "ts",
      watermark: String = "24 hours"): DataFrame =
    docs
      .withColumn("content_key",
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .withWatermark(tsCol, watermark)
      .dropDuplicates("content_key")

  /** Streaming ingestion of vendor-item micro-batches into the keyed
    * MERGE sink — the reference's on-demand re-sync becomes
    * `writeStream.foreachBatch(mergeBatch(...))`: each micro-batch of
    * sink-shaped records (vendorId, product, condition,
    * selectedOptions, database) runs the same J4/A4/K1 merge as the
    * batch pipeline. State lives in the sink table itself, exactly
    * like the reference — no Spark state store needed. */
  def mergeBatch(sinkPath: String,
      mode: graft.sink.MergeWriter.MergeMode = graft.sink.MergeWriter.Accumulate)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val existing = graft.sink.MergeWriter.readSnapshot(spark, sinkPath)
    val merged = graft.sink.MergeWriter.merge(existing, batch, mode,
      new java.sql.Timestamp(System.currentTimeMillis()))
    // Stats must materialize before the swap (the lazy plan reads the
    // old snapshot files); then rewrite.
    val counted = merged.persist()
    counted.count()
    graft.sink.MergeWriter.writeSnapshot(spark, counted.drop("action"), sinkPath)
    counted.unpersist()
  }
}
