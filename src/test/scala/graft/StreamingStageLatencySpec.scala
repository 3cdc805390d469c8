package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingStageLatency
import graft.streaming.StreamingStageLatency.{FunnelState, Transition}

/** The streaming funnel-latency twin must equal the batch
  * q_analytics_stage_latency report after an event-time-ordered replay,
  * emit each transition exactly once (redelivery idempotence), and match
  * the batch's equal-instant `>=` semantics. */
class StreamingStageLatencySpec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-ssl-ckpt").toString

  private def freshState() = {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    TestGroupState.create[FunnelState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
  }

  test("funnelUpdate: ordered chain emits both transitions with exact lats") {
    val s = freshState()
    val out = StreamingStageLatency.funnelUpdate(7L, Iterator(
      (7L, "view", 100L), (7L, "click", 350L), (7L, "purchase", 1000L)), s).toSeq
    assert(out == Seq(
      Transition(7L, "1_view_to_click", 250L),
      Transition(7L, "2_click_to_purchase", 650L)))
    assert(s.get == FunnelState(100L, 350L, 1000L))
  }

  test("funnelUpdate: clicks before the first view never qualify") {
    val s = freshState()
    val out = StreamingStageLatency.funnelUpdate(1L, Iterator(
      (1L, "click", 50L), (1L, "view", 100L), (1L, "click", 90L),
      (1L, "click", 120L)), s).toSeq
    assert(out == Seq(Transition(1L, "1_view_to_click", 20L)),
      "only the earliest click at/after the earliest view counts")
  }

  test("funnelUpdate: equal-instant chain completes with zero latencies") {
    val s = freshState()
    val out = StreamingStageLatency.funnelUpdate(2L, Iterator(
      (2L, "purchase", 100L), (2L, "click", 100L), (2L, "view", 100L)), s).toSeq
    assert(out == Seq(
      Transition(2L, "1_view_to_click", 0L),
      Transition(2L, "2_click_to_purchase", 0L)),
      "the (ts, kind) sort resolves equal instants view->click->purchase")
  }

  test("funnelUpdate: a full redelivery wave emits zero rows") {
    val s = freshState()
    val wave = Seq((3L, "view", 10L), (3L, "click", 20L), (3L, "purchase", 30L))
    val first = StreamingStageLatency.funnelUpdate(3L, wave.iterator, s).toSeq
    assert(first.length == 2)
    val redelivered = StreamingStageLatency.funnelUpdate(3L, wave.iterator, s).toSeq
    assert(redelivered.isEmpty, "completed stages must never re-emit")
    assert(s.get == FunnelState(10L, 20L, 30L))
  }

  test("batch-mode transitions + report equal q_analytics_stage_latency") {
    val ev = ops.table(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val got = StreamingStageLatency.report(
        StreamingStageLatency.transitions(ev).toDF())
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val expect = SparkEntry.queries("q_analytics_stage_latency")(spark, sfDir)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == expect, s"twin drift: $got vs $expect")
    assert(got.nonEmpty && got.map(_._1) ==
      Seq("1_view_to_click", "2_click_to_purchase"))
  }

  test("chunked in-order streaming replay reproduces the batch report") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = ops.table(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e._3, StreamingStageLatency.kindRank(e._2))).toSeq

    val input = MemoryStream[(Long, String, Long)]
    val query = StreamingStageLatency.transitions(
        input.toDF().toDF("user_id", "event_type", "ts_us"))
      .writeStream.format("memory").queryName("ssl_out")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      rows.grouped(math.max(1, rows.length / 4)).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      val got = StreamingStageLatency.report(spark.table("ssl_out"))
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
      val expect = SparkEntry.queries("q_analytics_stage_latency")(spark, sfDir)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
      assert(got == expect, s"streaming replay drift: $got vs $expect")
      // append-exactly-once: one row per converting user per stage
      val emitted = spark.table("ssl_out")
      assert(emitted.count() ==
        emitted.select("user_id", "stage").distinct().count())
    } finally query.stop()
  }
}
