package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution: assign each conversion its channel
  * the moment it arrives — the streaming mirror of the batch
  * `q_analytics_attribution` (graft.ops.AnalyticsOps.lastTouchAttribution),
  * for pipelines that credit marketing channels in near-real-time instead
  * of in a nightly report.
  *
  * Input is ONE unioned stream of tagged rows (touches and conversions)
  * keyed by user. Per-user `flatMapGroupsWithState` keeps only the RUNNING
  * BEST touch `(t_us, event_id, channel)` — O(1) state per user, never a
  * timeline buffer (the same state shape as [[StreamingAsOf]]). Each
  * conversion is emitted with the latest touch known at that point, or the
  * `none` channel when the best touch is missing or outside the lookback.
  *
  * Ordering contract: rows are sorted by (t_us, kind, event_id) WITHIN
  * each micro-batch group, conversions BEFORE touches at the same instant —
  * the batch query's strictly-before tie-break. Under per-user in-order
  * arrival across batches the per-conversion verdicts match the batch
  * attribution exactly (StreamingAttributionSpec pins the aggregated
  * channel report against q_analytics_attribution on the fixtures); a
  * touch arriving late credits future conversions only — the streaming
  * enrichment contract, with corrections owned by the batch pass.
  *
  * No state TTL, deliberately: the best-touch triple is O(1) per user and
  * evicting it silently de-attributes every later conversion. A lookback
  * window does NOT justify eviction either — eviction-by-lookback would
  * need per-event-time reasoning the state API cannot see batch-wide.
  */
object StreamingAttribution {

  /** One tagged input row: a touch (`is_conv = false`, channel set) or a
    * conversion (`is_conv = true`, value set). `t_us` is event-time µs. */
  final case class TouchRow(user_id: Long, t_us: Long, event_id: Long,
      is_conv: Boolean, channel: String, value: Double)

  /** A conversion credited to the latest strictly-earlier touch within
    * the lookback (channel = "none" otherwise). */
  final case class Attributed(event_id: Long, user_id: Long, t_us: Long,
      channel: String, value: Double)

  val DefaultLookbackUs: Long = 7L * 86400L * 1000000L

  def attribute(rows: Dataset[TouchRow],
      lookbackUs: Long = DefaultLookbackUs): Dataset[Attributed] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[TouchRow],
         state: GroupState[(Long, Long, String)]) =>
          userUpdate(user, it, state, lookbackUs)
      }
  }

  /** Keyed state update behind [[attribute]], exposed for deterministic
    * unit testing with `TestGroupState`. State is the running lexicographic
    * max (t_us, event_id) with the channel riding along — exactly the batch
    * formulation's running-max struct. */
  private[graft] def userUpdate(user: Long, rows: Iterator[TouchRow],
      state: GroupState[(Long, Long, String)],
      lookbackUs: Long): Iterator[Attributed] = {
    var best = state.getOption
    val out = Seq.newBuilder[Attributed]
    // impose the batch order: conversions FIRST at equal instants, so a
    // same-µs touch never credits the conversion (strictly-before rule)
    rows.toSeq
      .sortBy(r => (r.t_us, if (r.is_conv) 0 else 1, r.event_id))
      .foreach { r =>
        if (!r.is_conv) {
          val cand = (r.t_us, r.event_id)
          if (best.forall(b => Ordering[(Long, Long)].compare(cand, (b._1, b._2)) > 0))
            best = Some((r.t_us, r.event_id, r.channel))
        } else {
          // `t < r.t_us` guards the CROSS-batch equal-instant case: a touch
          // at exactly the conversion's t_us that arrived in an earlier
          // micro-batch is already in state, and without the strict bound it
          // would be credited — making the verdict depend on where the
          // batch boundary fell. In-batch, the sort already orders the
          // conversion first, so the strictly-before rule now holds
          // regardless of batching.
          val ch = best match {
            case Some((t, _, c)) if t < r.t_us && t >= r.t_us - lookbackUs => c
            case _ => "none"
          }
          out += Attributed(r.event_id, user, r.t_us, ch, r.value)
        }
      }
    best.foreach(state.update)
    out.result().iterator
  }
}
