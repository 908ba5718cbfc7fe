package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators. The reference has no streaming surface
  * (SURVEY §2.10) — this is the scale extension the north star asks for:
  * the same aggregation vocabulary over an unbounded events stream.
  *
  * Design: `readStream` → event-time windowed aggregation with watermarks
  * (late data bounded), and stateful sessionization via
  * `flatMapGroupsWithState` — the streaming twins of q28 (tumbling
  * windows) and q51 (sessionize), so batch and stream share semantics.
  */
object Streaming {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class SessionSummary(user_id: Long, n_events: Long,
      start_ts: Long, end_ts: Long)

  // public: the streaming state encoder's generated code constructs and
  // reads this class; `private` breaks codegen access at runtime
  final case class SessionState(n: Long, start: Long, last: Long)

  /** Tumbling event-time windows with a watermark: the streaming twin of
    * the batch `q28_events_hourly`. The grouping key must be the window
    * struct itself — `window(...).getField("start")` strips the
    * event-time metadata, so the watermark would never bound state and
    * append mode would be rejected; `.start` is projected AFTER the
    * aggregation instead. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("value_sum"))

  /** Streaming exact dedup: the streaming twin of `Dedup.exactDedup`.
    * Keys on a content hash (sha-256 of the dedup columns) and drops
    * duplicates whose event time falls inside the watermark horizon —
    * state is bounded by the horizon instead of growing forever, which is
    * the only dedup that survives an unbounded stream. Rows older than
    * the watermark are late data and already dropped by the watermark
    * itself. */
  def dedupExact(rows: DataFrame, tsCol: String, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    rows
      // hash the JSON of the key struct: null-safe and unambiguous (a
      // separator-joined concat SKIPS nulls, so ("x", null) and (null,
      // "x") would collide and wrongly dedup distinct rows)
      .withColumn("__content_hash__",
        sha2(to_json(struct(keyCols.map(col): _*)), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__content_hash__")
      .drop("__content_hash__")

  /** One micro-batch's worth of events for one user folded into the open
    * session state; returns the new state + closed sessions. Separated
    * from the streaming plumbing so the CROSS-batch semantics (late
    * events) are directly testable.
    *
    * An event inside the open session's gap-extended interval
    * [start-gap, last+gap] merges by WIDENING the interval (min/max) —
    * a late event from an earlier micro-batch must never drag `last`
    * backward (that both mis-reported the session bounds and caused a
    * later on-time event to split the session). An event beyond
    * last+gap closes the session and opens a new one; a straggler
    * older than start-gap belongs to an already-emitted session, which
    * Append mode cannot retract — it is emitted as its own singleton. */
  private[graft] def foldEvents(
      userId: Long, ts: Seq[Long], st: Option[SessionState], gapMs: Long
  ): (Option[SessionState], Seq[SessionSummary]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionSummary]
    var cur = st
    ts.sorted.foreach { t =>
      cur match {
        case Some(s) if t >= s.start - gapMs && t - s.last <= gapMs =>
          cur = Some(s.copy(n = s.n + 1,
            start = math.min(s.start, t), last = math.max(s.last, t)))
        case Some(s) if t > s.last =>
          out += SessionSummary(userId, s.n, s.start, s.last)
          cur = Some(SessionState(1, t, t))
        case Some(_) =>
          out += SessionSummary(userId, 1, t, t)
        case None =>
          cur = Some(SessionState(1, t, t))
      }
    }
    (cur, out.toSeq)
  }

  /** Stateful sessionization: 30-minute inactivity gap closes a session
    * (processing-time timeout stands in for event-time session windows).
    * Emits one summary row per closed session. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionSummary(userId, s.n, s.start, s.last))
          } else {
            val (cur, closed) =
              foldEvents(userId, it.map(_.ts.getTime).toSeq,
                state.getOption, gapMs)
            cur.foreach(state.update)
            state.setTimeoutDuration(gapMs)
            closed.iterator
          }
      }
  }
}
