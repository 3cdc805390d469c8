package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming late-data audit — the streaming twin of
  * q_analytics_late_events (r13): per event_type, maintain the watermark
  * (max event time over all COMPLETED arrival batches) as O(1) state and
  * flag each arriving event late when its event time trails that
  * watermark by more than
  * [[graft.ops.AnalyticsOps.LateDelayUs]] — exactly the drop/keep
  * decision a watermarked streaming window makes, surfaced as data
  * instead of silently applied. Arrival time = event time + the salt-16
  * deterministic ingestion jitter (the batch query's ground truth);
  * arrival batches are [[graft.ops.AnalyticsOps.LateBatchUs]]-wide —
  * the watermark advances at batch boundaries, never per record
  * (Structured Streaming's real semantics, which is also what makes the
  * batch twin scale-safe).
  *
  * State is ONE long per type (the completed-batch max) — bounded
  * forever. Within an update, events group by arrival batch and replay
  * in batch order: every event of a batch is flagged against the
  * PRE-batch watermark, then the batch's max folds in — in-batch event
  * order is irrelevant by construction (the flag depends only on the
  * carried watermark), so this twin needs no per-record ordering
  * contract at all; the stream's contract is only that an arrival batch
  * lands wholly within one trigger, in batch order (a 10-min trigger
  * aligned to the batch grid). In BATCH execution every group arrives
  * in one invocation — a full replay; StreamingLateEventsSpec pins
  * [[report]] equal to the batch query row-for-row.
  */
object StreamingLateEvents {

  /** Per-type watermark state: max event time (µs) over completed
    * arrival batches. */
  final case class WatermarkState(maxUs: Long)

  /** One flagged arrival: event-time hour window, exact cents, verdict. */
  final case class Flagged(event_type: String, w: Long, cent: Long, late: Boolean)

  private[graft] val Unset = Long.MinValue

  /** The salt-16 arrival batch of an event — shared with the batch
    * query's generated SQL (same constants, zero drift). */
  private[graft] def arrivalBatch(eventId: Long, tus: Long): Long = {
    val p = graft.functions.ReplayableHash.P
    val (a, b) = graft.functions.ReplayableHash.LateJitterParams.head
    ((a * (eventId % p) + b) % p + tus) / graft.ops.AnalyticsOps.LateBatchUs
  }

  /** The per-type state update behind [[flagged]], exposed for
    * deterministic unit testing. Events are (event_id, tus, cent);
    * grouped by arrival batch and replayed in batch order. */
  private[graft] def lateUpdate(etype: String,
      events: Iterator[(Long, Long, Long)],
      state: GroupState[WatermarkState]): Iterator[Flagged] = {
    var mx = state.getOption.map(_.maxUs).getOrElse(Unset)
    val out = scala.collection.mutable.ArrayBuffer.empty[Flagged]
    val byBatch = events.toArray
      .groupBy(e => arrivalBatch(e._1, e._2)).toArray.sortBy(_._1)
    byBatch.foreach { case (_, evs) =>
      evs.foreach { case (_, tus, cent) =>
        val late = mx != Unset &&
          tus + graft.ops.AnalyticsOps.LateDelayUs < mx
        out += Flagged(etype, tus / graft.ops.DiagOps.HourUs, cent, late)
      }
      val bmax = evs.iterator.map(_._2).max
      if (bmax > mx) mx = bmax
    }
    state.update(WatermarkState(mx))
    out.iterator
  }

  /** Flagged-arrival stream over a (streaming or batch) frame with
    * `event_type` (string), `event_id`/`ts_us`/`cent` (long) columns.
    * Append mode: one output row per arrival. */
  def flagged(ev: DataFrame): Dataset[Flagged] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.select(col("event_type"), col("event_id"), col("ts_us"), col("cent"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (etype: String, it: Iterator[(String, Long, Long, Long)],
            st: GroupState[WatermarkState]) =>
          lateUpdate(etype, it.map(e => (e._2, e._3, e._4)), st))
  }

  /** Late/on-time report over an emitted flagged table — the batch
    * module's implementation, verbatim (shared body, zero drift). */
  def report(fl: DataFrame): DataFrame =
    graft.ops.AnalyticsOps.lateReport(
      fl.select(col("event_type"), col("w"), col("cent"), col("late")))
}
