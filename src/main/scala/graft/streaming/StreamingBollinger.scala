package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Bollinger bands — the streaming twin of q_ts_bollinger
  * (r12), next to StreamingForecastNaive in the bounded-per-type-state
  * monitor family.
  *
  * State per event type is a RING of the last 24 hourly cent values plus
  * the last processed hour — O(BollWindow) FOREVER, regardless of stream
  * length. Arrivals are (event_type, h, k) closed-hour grid rows; the
  * update zero-fills any skipped hours (the batch grid is gapfilled, so
  * silent hours are real zero points — the twin reproduces them even if
  * the upstream emits observed hours only), ignores hours at/before the
  * last processed one (in-order contract + monotone guard = idempotent
  * under redelivery), and emits one MOMENTS row per full-window hour:
  * (k, n, s1, s2hi, s2lo) with the same hi/lo-split exact BIGINT squared
  * sums as the batch frame. [[report]] then evaluates the batch module's
  * OWN formula strings over the emitted moments (the forecastFormulas
  * discipline as shared code), so bands/breakouts are bit-identical to
  * q_ts_bollinger after an in-order replay — pinned by
  * StreamingBollingerSpec.
  */
object StreamingBollinger {

  private val W = graft.ops.DiagOps.BollWindow
  private val Split = graft.ops.DiagOps.MomentSplit

  final case class HourMoments(event_type: String, hour: Long, k: Long,
      n: Long, s1: Long, s2hi: Long, s2lo: Long)

  /** Ring of the last ≤W (hour, cents) points + the last processed hour. */
  final case class RingState(lastHour: Long, ring: List[Long])

  /** The per-type state update behind [[moments]], exposed for unit
    * testing with `TestGroupState`. Rows are (event_type, h, k). */
  private[graft] def ringUpdate(key: String,
      rows: Iterator[(String, Long, Long)],
      state: GroupState[RingState]): Iterator[HourMoments] = {
    var st = state.getOption.getOrElse(RingState(Long.MinValue, Nil))
    val out = scala.collection.mutable.ArrayBuffer.empty[HourMoments]
    def push(h: Long, k: Long): Unit = {
      val ring = (st.ring :+ k).takeRight(W)
      st = RingState(h, ring)
      if (ring.length == W) {
        var s1 = 0L; var hi = 0L; var lo = 0L
        ring.foreach { c => s1 += c; hi += (c * c) / Split; lo += (c * c) % Split }
        out += HourMoments(key, h, k, W.toLong, s1, hi, lo)
      }
    }
    rows.toArray.sortBy(_._2).foreach { case (_, h, k) =>
      if (h > st.lastHour) {
        if (st.lastHour != Long.MinValue) {
          var fill = st.lastHour + 1
          while (fill < h) { push(fill, 0L); fill += 1 }
        }
        push(h, k)
      }
    }
    state.update(st)
    out.iterator
  }

  /** Streaming (or batch) moments over a frame with `event_type`
    * (string), `h` (long hour), `k` (long cents) columns. Append mode:
    * each full-window hour emits exactly once. */
  def moments(grid: DataFrame): Dataset[HourMoments] = {
    val spark = grid.sparkSession
    import spark.implicits._
    grid.select(col("event_type"), col("h"), col("k"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[(String, Long, Long)],
            st: GroupState[RingState]) => ringUpdate(key, it, st))
  }

  /** Band report over emitted moments — the batch module's formula
    * strings, verbatim (shared constants + strings, zero drift). */
  def report(m: DataFrame): DataFrame =
    m.selectExpr(Seq("event_type", "hour") ++
        graft.ops.DiagOps.bollFormulas: _*)
      .orderBy("event_type", "hour")
}
