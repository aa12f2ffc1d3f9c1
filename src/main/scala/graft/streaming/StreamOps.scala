package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Open-session state per user: (session start, last event, count),
    * all epoch-µs. */
  type SessionState = (Long, Long, Long)

  /** CUSTOM-state sessionization via `flatMapGroupsWithState` — the
    * KeyValueGroupedDataset stateful surface, for semantics
    * `session_window` can't express (here: graft's `sessionize` boundary,
    * where a gap of EXACTLY the threshold stays in-session — the
    * strictly-greater rule — vs session_window's half-open >= split).
    *
    * Input: (user_id, epoch-µs event time). Output: CLOSED sessions
    * `(user_id, t_start, t_end, n_events)` — a session closes when a
    * later event arrives more than `gapUs` after it, so emissions are
    * deterministic in event time; the still-open tail session stays in
    * the group state. State is one 3-long tuple per active user —
    * bounded, shuffled once on user_id, the standard stateful-op shape
    * at any scale.
    *
    * Within a micro-batch the group's events sort by event time, so
    * batch boundaries never change WHICH sessions form — feeding the
    * same rows in any batch split yields the same closed sessions
    * (StreamingSpec proves equality with the batch `sessionize`
    * relation on the real events table).
    */
  def statefulSessions(events: Dataset[(Long, Long)],
      gapUs: Long = 1800000000L): Dataset[(Long, Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
          var st: Option[SessionState] = state.getOption
          it.map(_._2).toSeq.sorted.foreach { eus =>
            st match {
              case None => st = Some((eus, eus, 1L))
              case Some((s0, l0, n0)) =>
                if (eus - l0 > gapUs) { // strictly greater: == gap stays
                  out += ((uid, s0, l0, n0))
                  st = Some((eus, eus, 1L))
                } else st = Some((s0, eus, n0 + 1))
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
