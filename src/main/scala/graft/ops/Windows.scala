package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Qh

/** Time-window aggregations over the `events` stream table.
  *
  * Batch/streaming unification (SURVEY.md §7 module 6): each function is a
  * plain DataFrame transform built only from streaming-compatible operators
  * (`window`, `session_window`, grouped aggregation), so the same code runs
  * under `spark.readStream` — see [[streamingTumbling]] and
  * StreamingWindowSpec. The reference has no streaming surface; this is the
  * mandated extension for the `events` table (TESTDATA.md).
  *
  * At scale: one shuffle keyed on (window, key); partial aggregation is
  * map-side combined; in streaming mode state is bounded by the watermark.
  */
object Windows {

  /** Fixed tumbling windows: each event in exactly one bucket. */
  def tumbling(events: DataFrame, every: String = "10 minutes"): DataFrame =
    events.groupBy(window(col("ts"), every), col("event_type"))
      .agg(count(lit(1)).as("n"), Qh.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))

  /** Overlapping sliding windows (length `every`, step `slide`). */
  def sliding(events: DataFrame, every: String = "10 minutes",
      slide: String = "5 minutes"): DataFrame =
    events.groupBy(window(col("ts"), every, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), Qh.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))

  /** Gap-based session windows per user. Spark `session_window` merge is
    * inclusive at the boundary: an event arriving at exactly `gap` after
    * the previous one still extends the session (StreamingWindowSpec
    * pins this down) — the DuckDB oracle mirrors it with a strict-`>`
    * new-session test in the lag/cumsum idiom.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), max(col("ts")).as("last_ts"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("last_ts"), col("n"))

  /** The same tumbling aggregation under Structured Streaming with a
    * watermark — demonstrates the batch transform runs unchanged on a
    * stream (state eviction bounded by the watermark).
    */
  def streamingTumbling(streamingEvents: DataFrame, every: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame =
    tumbling(streamingEvents.withWatermark("ts", watermark), every)

  /** [[sessions]] under Structured Streaming: the watermark both bounds
    * session state and decides when a gap-closed session becomes final
    * (append mode emits a session only once the watermark passes its
    * close — the streaming-correct semantics for merging session windows).
    */
  def streamingSessions(streamingEvents: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    sessions(streamingEvents.withWatermark("ts", watermark), gap)
}
