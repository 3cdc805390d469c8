package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.{DeliverySettings, RetryPolicy}
import graft.streaming.{DeliverySink, MockDeliveryService}

/** True Structured Streaming behavior of the delivery pipeline (SURVEY §2B
  * engine-only row): memory source → micro-batches → framed sink with
  * failed-row retry; windowed aggregation with watermark; streaming dedup.
  */
class StreamingSpec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-ckpt").toString

  test("streaming delivery pipeline delivers every record exactly once per input") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val svc = new MockDeliveryService()
    val settings = DeliverySettings("s", batchSize = 50, parallelism = 2,
      triggerIntervalMs = 0L, retryPolicy = Some(RetryPolicy(1, 6)))
    val (query, stats) = DeliverySink.run(
      input.toDF(), settings, svc, checkpoint())
    try {
      input.addData((1 to 120).map(i => s"r-$i"): _*)
      query.processAllAvailable()
      input.addData((121 to 130).map(i => s"r-$i"): _*)
      query.processAllAvailable()
      val st = stats()
      assert(st.records == 130 && st.residualFailures == 0)
      assert(svc.batchSizes.forall(_ <= 50))
      assert(svc.delivered.size == 130)
      assert(svc.deliveredStrings.forall(s => s.startsWith("{\"value\":\"r-") && s.endsWith("}\n")))
    } finally query.stop()
  }

  test("streaming delivery retries failed records and reports them") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    // every record fails its first attempt; succeeds when resubmitted
    val svc = new MockDeliveryService(failEveryNth = 1, failFirstAttempts = 1)
    val settings = DeliverySettings("s", batchSize = 500, parallelism = 1,
      triggerIntervalMs = 0L, retryPolicy = Some(RetryPolicy(1, 6)))
    val (query, stats) = DeliverySink.run(input.toDF(), settings, svc, checkpoint())
    try {
      input.addData((1 to 40).map(i => s"x-$i"): _*)
      query.processAllAvailable()
      val st = stats()
      assert(st.records == 40 && st.retriedRecords == 40 && st.residualFailures == 0)
    } finally query.stop()
  }

  test("windowed aggregation with watermark over a stream matches batch analog") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
    val query = agg.writeStream
      .format("memory").queryName("win_agg").outputMode("complete")
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      input.addData((ts(1, 5), "a", 1.0), (ts(1, 40), "a", 2.0), (ts(2, 10), "b", 4.0))
      query.processAllAvailable()
      val rows = spark.table("win_agg")
        .select(col("window.start").cast("string"), col("event_type"), col("n"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(rows == Set(
        ("2024-01-01 01:00:00", "a", 2L, 3.0),
        ("2024-01-01 02:00:00", "b", 1L, 4.0)))
    } finally query.stop()
  }

  test("session windows over a stream merge events within the gap") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val query = agg.writeStream
      .format("memory").queryName("sess_win").outputMode("complete")
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // user 1: two events 10 min apart (one session), then one 2 h later
      input.addData((ts(1, 0), 1L), (ts(1, 10), 1L), (ts(3, 0), 1L))
      query.processAllAvailable()
      val rows = spark.table("sess_win")
        .select(col("session_window.start").cast("string"), col("user_id"), col("n"))
        .as[(String, Long, Long)].collect().toSet
      assert(rows == Set(
        ("2024-01-01 01:00:00", 1L, 2L),
        ("2024-01-01 03:00:00", 1L, 1L)))
    } finally query.stop()
  }

  test("streaming OHLC bars finalize exactly once and equal a driver-side replay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val bars = graft.streaming.StreamingOhlc.bars(
      input.toDF().toDF("event_id", "ts", "event_type", "value"), "30 minutes")
    val query = bars.writeStream
      .format("memory").queryName("ohlc_out").outputMode("append")
      .option("checkpointLocation", checkpoint())
      .start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // batch 1: out-of-order arrivals inside two hour-bars, plus a tie-break
    // case (two events at the same instant — event_id orders open/close)
    val data = Seq(
      (1L, ts(1, 20), "a", 10.0), (2L, ts(1, 5), "a", 7.0),
      (3L, ts(1, 45), "a", 9.0), (6L, ts(1, 45), "a", 12.0),
      (4L, ts(2, 10), "a", 3.0), (5L, ts(2, 15), "b", 4.5))
    try {
      input.addData(data: _*)
      query.processAllAvailable()
      // closed bars only append once the watermark passes the window end —
      // nothing may be emitted yet
      val sentinel = (99L, ts(9, 0), "a", 1.0)
      input.addData(sentinel)
      query.processAllAvailable()
      val got = spark.table("ohlc_out")
        .select("event_type", "hour_idx", "n_events", "open", "high", "low",
          "close", "volume")
        .as[(String, Long, Long, Double, Double, Double, Double, Double)]
        .collect().toSet
      // independent driver-side replay (sentinel's bar is still open)
      val expected = data.groupBy(e => (e._3, e._2.getTime / 3600000L))
        .map { case ((t, h), es) =>
          val sorted = es.sortBy(e => (e._2.getTime, e._1))
          (t, h, es.size.toLong, sorted.head._4, es.map(_._4).max,
            es.map(_._4).min, sorted.last._4,
            es.map(e => BigDecimal(e._4).setScale(4, BigDecimal.RoundingMode.HALF_UP))
              .sum.toDouble)
        }.toSet
      assert(got == expected, "finalized streaming bars differ from batch replay")
      assert(!got.exists(_._2 == sentinel._2.getTime / 3600000L),
        "the open sentinel bar must not be emitted yet")
    } finally query.stop()
  }

  test("streaming dedup drops at-least-once duplicates within the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val dedup = input.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
    val query = dedup.writeStream
      .format("memory").queryName("dedup_out").outputMode("append")
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      input.addData((1L, t), (2L, t), (1L, t))
      query.processAllAvailable()
      input.addData((2L, t), (3L, t))
      query.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally query.stop()
  }

  test("stream-stream interval join matches the batch join on the same rows") {
    // two UNBOUNDED sources joined on key + time range: both sides carry a
    // watermark and the range condition bounds the buffered state — the
    // Structured Streaming attribution-join shape (impression ← click
    // within 10 minutes). Output must equal the batch join of the same data.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val impDf = imps.toDF().toDF("ad_id", "imp_ts").withWatermark("imp_ts", "30 minutes")
    val clkDf = clicks.toDF().toDF("c_ad_id", "clk_ts").withWatermark("clk_ts", "30 minutes")
    val joined = impDf.join(clkDf,
      col("ad_id") === col("c_ad_id") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") <= col("imp_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("ad_id"), col("imp_ts"), col("clk_ts"))
    val query = joined.writeStream
      .format("memory").queryName("ss_join").outputMode("append")
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      val impRows = Seq((1L, ts(1, 0)), (2L, ts(1, 5)), (3L, ts(2, 0)))
      val clkRows = Seq((1L, ts(1, 4)), // joins (within 10 min)
        (2L, ts(1, 30)), // too late after the impression -> no join
        (3L, ts(1, 50)), // before the impression -> no join
        (1L, ts(1, 9))) // second click on ad 1, also joins
      imps.addData(impRows: _*)
      clicks.addData(clkRows.take(2): _*)
      query.processAllAvailable()
      clicks.addData(clkRows.drop(2): _*)
      query.processAllAvailable()
      val got = spark.table("ss_join")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
      val want = impRows.toDF("ad_id", "imp_ts")
        .join(clkRows.toDF("c_ad_id", "clk_ts"),
          col("ad_id") === col("c_ad_id") &&
            col("clk_ts") >= col("imp_ts") &&
            col("clk_ts") <= col("imp_ts") + expr("INTERVAL 10 MINUTES"))
        .select(col("ad_id"), col("imp_ts"), col("clk_ts"))
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
      assert(got == want && got.size == 2)
    } finally query.stop()
  }
}
