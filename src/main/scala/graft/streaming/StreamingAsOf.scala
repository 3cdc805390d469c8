package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment: attach to each event the latest order at or
  * before it for the same user — the streaming mirror of the batch
  * `q_join_asof` (graft.ops.JoinOps.asofMerge), for pipelines that enrich
  * events as they arrive instead of in a nightly join.
  *
  * Input is ONE unioned stream of tagged rows (orders and events) keyed by
  * user. Per-user `flatMapGroupsWithState` keeps only the RUNNING BEST
  * (order_ms, order_key) pair — O(1) state per user, never a timeline
  * buffer, so state size is #users regardless of event volume (the
  * streaming analog of the batch merge-scan carrying a running max instead
  * of pair expansion). Each event is emitted enriched with the best order
  * known at that point.
  *
  * Ordering contract: rows are sorted by (t_ms, kind) WITHIN each
  * micro-batch group (orders before events at the same instant — the
  * batch `<=` tie-break, JoinOps.asofMerge's `kind` column). Under
  * per-user in-order arrival across batches the output matches the batch
  * as-of exactly (StreamingAsOfSpec pins this against q_join_asof on the
  * fixtures); an order arriving LATE (after an event it should have
  * served) updates state for future events only — the standard streaming
  * enrichment contract, with corrections owned by the batch pass of the
  * same engine.
  *
  * No state TTL: unlike StreamingDedup's per-bucket keep-first sets, the
  * per-user best pair is O(1) and evicting it silently un-enriches every
  * later event for that user — correctness, not hygiene. If the user key
  * space itself churns unboundedly, cap it upstream (partition the user
  * universe), not by dropping state.
  */
object StreamingAsOf {

  /** One tagged input row: an order (`is_order = true`, order_* set) or an
    * event (`event_id` set). `t_ms` is the row's event-time in epoch ms. */
  final case class AsOfRow(user_id: Long, t_ms: Long, is_order: Boolean,
      order_key: Long, event_id: Long)

  /** An event enriched with the latest order at/before it (None = the user
    * had no qualifying order yet). */
  final case class EnrichedEvent(event_id: Long, user_id: Long,
      order_key: Option[Long], order_ms: Option[Long])

  def enrich(rows: Dataset[AsOfRow]): Dataset[EnrichedEvent] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(userUpdate)
  }

  /** Keyed state update behind [[enrich]], exposed for deterministic unit
    * testing with `TestGroupState`. State is the running lexicographic max
    * (order_ms, order_key) — exactly the batch formulation's tie-break. */
  private[graft] def userUpdate(user: Long, rows: Iterator[AsOfRow],
      state: GroupState[(Long, Long)]): Iterator[EnrichedEvent] = {
    var best = state.getOption
    val out = Seq.newBuilder[EnrichedEvent]
    // micro-batch group iterators carry no ordering guarantee — impose the
    // batch merge-scan's (t, kind) order, orders first at equal instants
    rows.toSeq
      .sortBy(r => (r.t_ms, if (r.is_order) 0 else 1, r.order_key))
      .foreach { r =>
        if (r.is_order) {
          val cand = (r.t_ms, r.order_key)
          if (best.forall(b => Ordering[(Long, Long)].compare(cand, b) > 0))
            best = Some(cand)
        } else out += EnrichedEvent(r.event_id, user, best.map(_._2), best.map(_._1))
      }
    best.foreach(state.update)
    out.result().iterator
  }
}
