package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel stage-latency — the streaming twin of
  * q_analytics_stage_latency (r12), completing batch/stream parity for the
  * funnel family next to StreamingAttribution's running-best shape.
  *
  * State is ONE (view_us, click_us, purchase_us) triple per user — the
  * O(1)-per-user funnel state: each field is set at most once, ever, by
  * the SAME earliest-qualifying rule the batch funnelTimes aggregates
  * compute (earliest view; earliest click at/after it; earliest purchase
  * at/after that). A completed transition emits exactly once (the unset
  * guards double as redelivery idempotence: replaying a completed chain
  * emits zero rows); the per-batch iterator is sorted by (ts, stage-kind)
  * so equal-instant view→click→purchase chains resolve exactly like the
  * batch `>=` comparisons, and out-of-order arrivals WITHIN a micro-batch
  * cost nothing. Cross-batch order is the stream's contract: after an
  * event-time-ordered replay the emitted transitions equal the batch
  * latency relation row-for-row (StreamingStageLatencySpec pins it).
  *
  * The report side is NOT a second stateful operator: transitions are
  * append-only facts (one row per converting user per stage), so
  * [[report]] delegates to the batch module's stageLatencyReport — the
  * SINGLE shared implementation (r10 twin-formula discipline, applied as
  * shared code): second-quantized (stage, sec) histogram, exact mean over
  * summed µs, lower-median by value. The histogram stays bounded by the
  * latency time-span × 2 stages, the StreamingQuantile argument, if a
  * serving path ever materializes it as state.
  */
object StreamingStageLatency {

  /** Per-user funnel triple; [[Unset]] marks a stage not yet reached. */
  final case class FunnelState(viewUs: Long, clickUs: Long, purchaseUs: Long)

  final case class Transition(user_id: Long, stage: String, lat_us: Long)

  private[graft] val Unset = Long.MinValue

  /** Matches the batch funnel's equal-instant semantics: at one timestamp
    * a view may feed a click may feed a purchase (all `>=` comparisons). */
  private[graft] def kindRank(t: String): Int = t match {
    case "view" => 0
    case "click" => 1
    case "purchase" => 2
    case _ => 3
  }

  /** The per-user state update behind [[transitions]], exposed for
    * deterministic unit testing with `TestGroupState`. Events are
    * (user_id, event_type, ts_us). */
  private[graft] def funnelUpdate(user: Long,
      events: Iterator[(Long, String, Long)],
      state: GroupState[FunnelState]): Iterator[Transition] = {
    var st = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset))
    val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
    events.toArray.sortBy(e => (e._3, kindRank(e._2))).foreach {
      case (_, "view", ts) if st.viewUs == Unset =>
        st = st.copy(viewUs = ts)
      case (_, "click", ts)
          if st.viewUs != Unset && st.clickUs == Unset && ts >= st.viewUs =>
        st = st.copy(clickUs = ts)
        out += Transition(user, "1_view_to_click", ts - st.viewUs)
      case (_, "purchase", ts)
          if st.clickUs != Unset && st.purchaseUs == Unset && ts >= st.clickUs =>
        st = st.copy(purchaseUs = ts)
        out += Transition(user, "2_click_to_purchase", ts - st.clickUs)
      case _ => ()
    }
    state.update(st)
    out.iterator
  }

  /** Completed-transition stream over a (streaming or batch) frame with
    * `user_id` (long), `event_type` (string), `ts_us` (long) columns.
    * Append mode: each transition is emitted exactly once, ever. In BATCH
    * execution every group arrives in one invocation, so the internal
    * sort gives a full in-order replay — the spec's equality harness. */
  def transitions(ev: DataFrame): Dataset[Transition] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.select(col("user_id"), col("event_type"), col("ts_us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[(Long, String, Long)],
            st: GroupState[FunnelState]) => funnelUpdate(user, it, st))
  }

  /** Stage-latency report over an emitted transitions table — the batch
    * module's implementation, verbatim (shared body, zero drift). */
  def report(trans: DataFrame): DataFrame =
    graft.ops.AnalyticsOps.stageLatencyReport(
      trans.select(col("stage"), col("lat_us")))
}
