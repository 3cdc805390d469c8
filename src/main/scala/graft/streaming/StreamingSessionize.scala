package graft.streaming

import java.time.Instant

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.AnalyticsOps

/** Streaming gap-based sessionization: emit a user's session row the
  * moment the session is KNOWN closed — the streaming mirror of the batch
  * `q_analytics_sessionize` (graft.ops.AnalyticsOps), for pipelines that
  * feed engagement/attribution reports continuously instead of nightly.
  *
  * Per-user `flatMapGroupsWithState` holds ONLY the open session
  * `(session_n, start_us, last_us, n_events)` — O(1) state per user, never
  * an event buffer. A session closes two ways, both emitting the same row
  * the batch query produces:
  *
  *   - an in-batch successor event with `t_us - last_us > gap` (the batch
  *     `lag` predicate, verbatim);
  *   - an EVENT-TIME TIMEOUT: the watermark passing `last_us + gap` proves
  *     no on-time event can extend the session, so the open session is
  *     flushed with no further input — this is what makes the operator
  *     viable on an unbounded stream (a batch-only formulation would hold
  *     every user's last session forever).
  *
  * Exactness contract: under per-user in-order arrival AND a watermark
  * delay covering cross-user event-time skew (an event never arrives with
  * `t_us` at-or-behind the current watermark), the emitted rows equal the
  * batch query's on the same inputs — StreamingSessionizeSpec pins exactly
  * that on the fixtures, including a session spanning micro-batches. An
  * event arriving BEHIND the watermark is DROPPED by the engine before
  * the state function runs (Spark filters late rows whenever
  * EventTimeTimeout is configured), so a too-short watermark delay
  * undercounts rather than corrupting state — corrections are owned by
  * the batch pass, the standard watermark trade every streaming
  * sessionizer accepts. (That same filter is why `setTimeoutTimestamp`
  * below can never see a timestamp at-or-behind the watermark.)
  */
object StreamingSessionize {

  /** One input event; `ts` is event-time (µs precision via the Instant
    * encoder) and doubles as the watermark column. */
  final case class SessionEvent(user_id: Long, ts: Instant, event_id: Long)

  /** A closed session — identical shape and numbering (1-based per user in
    * event-time order) to the batch q_analytics_sessionize output. */
  final case class Sessionized(user_id: Long, session_n: Long, n_events: Long,
      start_us: Long, end_us: Long, duration_us: Long)

  /** Open-session state: (session_n, start_us, last_us, n_events).
    * `n_events == 0` is the post-timeout TOMBSTONE: no open session, and
    * `session_n` is the NEXT number to assign — removing state outright
    * would restart the user's numbering at 1 and break batch equality.
    * The tombstone is the same O(1)-per-user footprint the attribution
    * state keeps deliberately (see StreamingAttribution's no-TTL note). */
  private[graft] type Open = (Long, Long, Long, Long)

  val DefaultGapUs: Long = AnalyticsOps.SessionGapUs

  /** `events` must already carry a watermark on `ts` (the spec uses
    * `withWatermark("ts", "0 seconds")` for its in-order feed; a real
    * deployment sets the delay to its observed cross-user skew). */
  def sessionize(events: Dataset[SessionEvent],
      gapUs: Long = DefaultGapUs): Dataset[Sessionized] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[Open]) =>
          userUpdate(user, it, state, gapUs)
      }
  }

  private def micros(ts: Instant): Long =
    Math.addExact(Math.multiplyExact(ts.getEpochSecond, 1000000L),
      ts.getNano / 1000L)

  private def closed(user: Long, s: Open): Sessionized =
    Sessionized(user, s._1, s._4, s._2, s._3, s._3 - s._2)

  /** Keyed update behind [[sessionize]], exposed for deterministic unit
    * testing with `TestGroupState`. Events are sorted by (t_us, event_id)
    * within the batch group — the batch window's sort order. */
  private[graft] def userUpdate(user: Long, rows: Iterator[SessionEvent],
      state: GroupState[Open], gapUs: Long): Iterator[Sessionized] = {
    if (state.hasTimedOut) {
      // watermark passed last_us + gap: no on-time event can extend it.
      // Leave a tombstone so the user's session numbering survives.
      val out = state.getOption.filter(_._4 > 0L).map(closed(user, _))
      out.foreach(s => state.update((s.session_n + 1L, 0L, 0L, 0L)))
      return out.iterator
    }
    val out = Seq.newBuilder[Sessionized]
    var open = state.getOption
    rows.toSeq.map(e => (micros(e.ts), e.event_id)).sorted
      .foreach { case (t, _) =>
        open match {
          case Some((n, start, last, cnt)) if cnt > 0L && t - last <= gapUs =>
            // same session; t >= last under the in-order contract
            open = Some((n, start, math.max(last, t), cnt + 1L))
          case Some(s @ (n, _, _, cnt)) =>
            if (cnt > 0L) out += closed(user, s) // gap: close the open one
            open = Some((n + (if (cnt > 0L) 1L else 0L), t, t, 1L))
          case None =>
            open = Some((1L, t, t, 1L))
        }
      }
    open.foreach { s =>
      state.update(s)
      // Tombstones set no timer (EventTimeTimeout never fires without
      // one). For an open session the timeout fires when the watermark
      // STRICTLY passes last_us + gap, and an on-time successor at
      // exactly last_us + gap still extends the session first — matching
      // the batch `> gap` boundary.
      if (s._4 > 0L) state.setTimeoutTimestamp((s._3 + gapUs) / 1000L)
    }
    out.result().iterator
  }
}
