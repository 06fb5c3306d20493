package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** A doc tagged with its balancing key (domain, lang, source …). */
  case class DocKey(doc_id: Long, key: String, ts: java.sql.Timestamp)

  /** Per-key corpus cap — "at most N documents per domain/language"
    * — the balancing step of a training-data feed. This is genuinely
    * CUSTOM state: `dropDuplicates` can keep first-1 per key, but
    * first-N-across-micro-batches needs a counter that survives
    * batches, i.e. `flatMapGroupsWithState` (the §Streaming escape
    * hatch used only when built-ins can't express the semantics).
    *
    * State = one Long per key (emitted count), evicted by event-time
    * timeout `retention` past the watermark, so the store is
    * O(active keys), not O(stream length). Within a batch, docs are
    * ordered (ts, doc_id) so the kept set is deterministic. After a
    * key's state is evicted, its budget resets — the cap applies
    * within the retention horizon, which is what a continuously
    * ingesting pipeline wants (and the reason eviction is explicit,
    * not accidental). */
  def capPerKey(docs: Dataset[DocKey], maxPerKey: Int,
      watermark: String = "1 hour",
      retentionMs: Long = 24L * 3600 * 1000): Dataset[DocKey] = {
    import docs.sparkSession.implicits._
    docs.withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, DocKey](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[DocKey], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val emitted = state.getOption.getOrElse(0L)
            val batch = rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
            val take = batch.take(math.max(0, maxPerKey - emitted.toInt))
            state.update(emitted + take.size)
            // Timeout anchors on the key's LATEST EVENT, not the
            // current watermark: on the first batch the watermark is
            // still epoch-0, and watermark+retention would expire the
            // key immediately after one batch (observed: the budget
            // reset every batch).
            val lastEvent = batch.map(_.ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(lastEvent, state.getCurrentWatermarkMs()) + retentionMs)
            take.iterator
          }
      }
  }

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
