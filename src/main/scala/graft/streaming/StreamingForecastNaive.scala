package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming seasonal-naive forecast monitor — the streaming twin of batch
  * `q_ts_forecast_naive`: as each hourly grid cent row `(event_type, h, k)`
  * arrives, the type's state forecasts it from the value one period (24
  * grid hours) earlier and folds the error into running exact-BIGINT MAE /
  * bias sums — the online "do we need a better forecaster" dashboard.
  *
  * Arrival contract: rows arrive IN ORDER per type across batches (the
  * StreamingAttribution discipline; within a micro-batch the slice is
  * sorted by `h` before folding), and the grid is gap-free zero-filled —
  * exactly what the batch query's upstream produces. State per type is the
  * last `period` cents plus three counters: O(period) FOREVER, regardless
  * of stream length. Each changing batch re-emits the cumulative summary
  * under a bumped monotone version; [[latestReport]] reduces emissions to
  * the current per-type backtest row, evaluating the SAME formula strings
  * as the batch query (graft.ops.DiagOps.forecastFormulas) — after a full
  * in-order replay the report EQUALS batch `q_ts_forecast_naive`
  * (StreamingForecastNaiveSpec pins it).
  */
object StreamingForecastNaive {

  final case class FcEmit(event_type: String, version: Long, n_scored: Long,
      sae: Long, se: Long)

  /** Ring of the last `period` grid cents + running error sums — the
    * MgState parallel-seq layout rule (encoder-friendly). */
  final case class FcState(version: Long, ring: Seq[Long], n: Long,
      sae: Long, se: Long)

  /** The keyed state-update behind [[reports]], exposed for deterministic
    * unit testing with `TestGroupState`. */
  private[graft] def typeUpdate(period: Int)(
      et: String, rows: Iterator[(String, Long, Long)],
      state: GroupState[FcState]): Iterator[FcEmit] = {
    val prev = state.getOption.getOrElse(FcState(0L, Nil, 0L, 0L, 0L))
    var ring = prev.ring
    var n = prev.n
    var sae = prev.sae
    var se = prev.se
    rows.toSeq.sortBy(_._2).foreach { case (_, _, k) =>
      if (ring.length == period) {
        val f = ring.head
        n += 1; sae += math.abs(k - f); se += k - f
        ring = ring.tail :+ k
      } else ring = ring :+ k
    }
    if (n == prev.n && ring == prev.ring) Iterator.empty
    else {
      val version = prev.version + 1
      state.update(FcState(version, ring, n, sae, se))
      Iterator.single(FcEmit(et, version, n, sae, se))
    }
  }

  /** Per-micro-batch cumulative backtest summaries over a streaming (or
    * batch) frame with (event_type, h, k) grid columns. Update mode. */
  def reports(grid: DataFrame, period: Int = 24): Dataset[FcEmit] = {
    val spark = grid.sparkSession
    import spark.implicits._
    grid
      .select(col("event_type"), col("h").cast("long"), col("k").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (et: String, it: Iterator[(String, Long, Long)],
         st: GroupState[FcState]) => typeUpdate(period)(et, it, st))
  }

  /** Reduce an emitted-summary table to the CURRENT per-type report — the
    * max-version row per type, projected through the SAME formula strings
    * as the batch query (window-not-self-join; memory-sink rule). */
  def latestReport(emitted: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    emitted.withColumn("__mxv", max("version").over(w))
      .where(col("version") === col("__mxv")).drop("__mxv")
      .selectExpr(Seq("event_type", "n_scored") ++
        graft.ops.DiagOps.forecastFormulas: _*)
      .orderBy("event_type")
  }
}
