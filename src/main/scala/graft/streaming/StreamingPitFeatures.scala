package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming point-in-time feature assembly — the streaming twin of batch
  * `q_analytics_pit_features` (r12), completing batch/stream parity for
  * the feature-store primitive: as each purchase label arrives, its
  * feature vector reads the per-user running state BEFORE the label's own
  * row is folded in, which is exactly the batch query's
  * ROWS … AND 1 PRECEDING frame — the no-leakage contract holds by
  * construction at serving time, not just in the training dump.
  *
  * State is one O(1) triple per user (prior view count, prior click
  * count, last click µs). The per-batch iterator is sorted by
  * (ts_us, event_id) — the batch frame's total order — so equal-instant
  * and out-of-order arrivals WITHIN a micro-batch resolve exactly like
  * batch; cross-batch order is the stream's contract (the
  * StreamingStageLatency precedent). Counter state means a REPLAYED event
  * would double-count: like StreamingCountMin this operator declares
  * exactly-once input (checkpointed sources give it), and the spec pins
  * batch equality after in-order replay — batch-mode
  * flatMapGroupsWithState delivers each group in one invocation, so the
  * internal sort IS the in-order-replay harness.
  */
object StreamingPitFeatures {

  /** Per-user running feature state. */
  final case class PitState(nView: Long, nClick: Long, lastClickUs: Long)

  final case class PitFeatures(event_id: Long, user_id: Long, ts_us: Long,
      n_prior_view: Long, n_prior_click: Long, click_gap_us: Long)

  private[graft] val NoClick = Long.MinValue

  /** The per-user state update behind [[features]], exposed for
    * deterministic unit testing. Events are (event_id, event_type, ts_us);
    * the emitted vector per purchase reads the state BEFORE the row
    * folds in — strictly-earlier events only, the batch frame. */
  private[graft] def pitUpdate(user: Long,
      events: Iterator[(Long, String, Long)],
      state: GroupState[PitState]): Iterator[PitFeatures] = {
    var st = state.getOption.getOrElse(PitState(0L, 0L, NoClick))
    val out = scala.collection.mutable.ArrayBuffer.empty[PitFeatures]
    events.toArray.sortBy(e => (e._3, e._1)).foreach { case (id, tpe, ts) =>
      if (tpe == "purchase")
        out += PitFeatures(id, user, ts, st.nView, st.nClick,
          if (st.lastClickUs == NoClick) -1L else ts - st.lastClickUs)
      tpe match {
        case "view" => st = st.copy(nView = st.nView + 1)
        case "click" => st = st.copy(nClick = st.nClick + 1,
          lastClickUs = ts)
        case _ => ()
      }
    }
    state.update(st)
    out.iterator
  }

  /** Per-purchase feature stream over a (streaming or batch) frame with
    * `event_id, user_id, event_type, ts_us` columns. Append mode: one
    * feature row per purchase label, ever. */
  def features(ev: DataFrame): Dataset[PitFeatures] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us"))
      .as[(Long, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[(Long, Long, String, Long)],
            st: GroupState[PitState]) =>
          pitUpdate(user, it.map(r => (r._2, r._3, r._4)), st))
  }
}
