package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming OHLC downsampling bars — the streaming twin of batch
  * `q_ts_ohlc`, completing the streaming-analog family (dedup / as-of /
  * attribution / sessionize / top-k) with the windowed-aggregation shape:
  * no custom state at all, just a watermarked event-time window over the
  * SAME declarative aggregates the batch query uses.
  *
  * The open/close trick carries over verbatim: `min_by`/`max_by` on the
  * packed (epoch_us, event_id) DECIMAL(38,0) order key are ordinary
  * commutative aggregates, so Spark's streaming state per open bar is one
  * partial-agg row (O(1) per (type, hour) window — never buffered events),
  * and bars finalize exactly when the watermark passes the window end.
  * State is bounded by #types × #open-windows, independent of event rate.
  *
  * Append mode emits each bar exactly once, when it can no longer change —
  * the contract a downstream feature store wants. StreamingSpec pins the
  * emitted bars against the batch aggregation of the same rows.
  */
object StreamingOhlc {

  private val HourUs = 3600000000L

  /** Hour bars over a (possibly streaming) events frame with columns
    * (event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE).
    * `delay` is the watermark lateness bound. */
  def bars(events: DataFrame, delay: String = "2 hours"): DataFrame = {
    events
      .withWatermark("ts", delay)
      .withColumn("okey", expr(
        "CAST(unix_micros(ts) AS DECIMAL(38,0)) * 10000000000000000000BD" +
          " + CAST(event_id AS DECIMAL(38,0))"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).cast("long").as("n_events"),
        expr("min_by(value, okey)").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        expr("max_by(value, okey)").as("close"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("volume"))
      .select(col("event_type"),
        expr(s"unix_micros(window.start) div $HourUs").as("hour_idx"),
        col("n_events"), col("open"), col("high"), col("low"),
        col("close"), col("volume"))
  }
}
