package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingForecastNaive
import graft.streaming.StreamingForecastNaive.{FcEmit, FcState}

/** The streaming forecast monitor must equal the batch lag-24 backtest
  * exactly after an in-order replay of the hourly grid, with O(period)
  * state per type and change-only versioned emissions.
  */
class StreamingForecastNaiveSpec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-fcnaive-ckpt").toString

  test("typeUpdate warms the ring, then scores against the period-old cell (unit)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val s = TestGroupState.create[FcState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    // period 3: first 3 rows only warm up (no scores), 4th scores vs row 1
    val warm = StreamingForecastNaive.typeUpdate(3)(
      "t", Iterator(("t", 0L, 10L), ("t", 1L, 20L), ("t", 2L, 30L)), s).toSeq
    assert(warm == Seq(FcEmit("t", 1L, 0L, 0L, 0L)),
      "warm-up emits a versioned zero-score summary (state changed)")
    val s2 = TestGroupState.create[FcState](
      Optional.of(s.get), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val scored = StreamingForecastNaive.typeUpdate(3)(
      "t", Iterator(("t", 4L, 7L), ("t", 3L, 25L)), s2).toSeq
    // in-batch rows fold in h order: 25 vs 10 (|15|), 7 vs 20 (|-13|)
    assert(scored == Seq(FcEmit("t", 2L, 2L, 28L, 2L)), scored.toString)
    assert(s2.get.ring == Seq(30L, 25L, 7L), "ring keeps the last period cells")
    // empty batch: no state change, no emission
    val s3 = TestGroupState.create[FcState](
      Optional.of(s2.get), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    assert(StreamingForecastNaive.typeUpdate(3)("t", Iterator.empty, s3).isEmpty)
  }

  test("streamed report equals batch q_ts_forecast_naive after in-order replay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // the batch query's exact grid, derived driver-side: zero-filled
    // hourly cents per type (decimal-exact sums surfaced as double, then
    // the round(×100) cent projection — the dsum path)
    val ev = ops.table(spark, sfDir, "events")
      .selectExpr("event_type", "unix_micros(ts) div 3600000000 AS h", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val h0 = ev.map(_._2).min
    val h1 = ev.map(_._2).max
    val sums = ev.groupBy(e => (e._1, e._2)).view
      .mapValues(es => math.round(es.map(x =>
        BigDecimal(x._3).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble * 100)).toMap
    val grid = for {
      t <- ev.map(_._1).distinct.sorted
      h <- h0 to h1
    } yield (t, h, sums.getOrElse((t, h), 0L))

    val input = MemoryStream[(String, Long, Long)]
    val query = StreamingForecastNaive.reports(
        input.toDF().toDF("event_type", "h", "k"))
      .writeStream.format("memory").queryName("fcnaive_out")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      // global h order within each type ⇒ the in-order arrival contract;
      // four waves exercise cross-batch ring carry
      val ordered = grid.sortBy { case (t, h, _) => (h, t) }
      ordered.grouped(math.max(1, ordered.length / 4)).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      val got = StreamingForecastNaive
        .latestReport(spark.table("fcnaive_out")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSeq
      val want = SparkEntry.queries("q_ts_forecast_naive")(spark, sfDir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSeq
      assert(got == want,
        "streaming backtest must equal the batch query exactly")
      // bounded state: every emission's scored count grows monotonically
      // per type and the summary is one row per (type, version)
      val emitted = spark.table("fcnaive_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      emitted.groupBy(_._1).foreach { case (_, es) =>
        val byV = es.sortBy(_._2).map(_._3).toSeq
        assert(byV == byV.sorted, "n_scored must be monotone in version")
      }
    } finally query.stop()
  }
}
