package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators (SURVEY.md §2.7 streaming truth;
  * NORTH-STAR). These are the real streaming forms of the batch analogs in
  * graft.ops.Events — `readStream → transform → writeStream` pipelines
  * with event-time watermarks. StreamingSpec drives them over
  * MemoryStream with controlled disorder (late-row drop, session merge);
  * they are not oracle-checkable (SURVEY §5.2-4).
  *
  * Expects an event-time column `ts`, plus `event_type`/`user_id`/`value`
  * as in the events table. At scale these are the standard shuffle-on-key
  * stateful aggregations; the watermark bounds state size.
  */
object StreamOps {

  /** 1-hour tumbling counts + value sums per event_type, late rows beyond
    * the watermark dropped. */
  def tumblingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** 1-hour windows sliding every 30 minutes. */
  def slidingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  /** 30-minute-gap sessions per user — the streaming form of
    * graft.ops.Events.sessionize (state merges as rows arrive; watermark
    * finalizes sessions). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("t_start"),
        col("session_window.end").as("t_end"), col("user_id"), col("n_events"))
}
