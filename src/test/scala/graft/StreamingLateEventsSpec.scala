package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingLateEvents
import graft.streaming.StreamingLateEvents.WatermarkState

/** The streaming late-data twin must equal the batch
  * q_analytics_late_events report after an arrival-batch-ordered replay;
  * the watermark must advance at batch boundaries only (never per
  * record) and flag exactly the events the batch prefix-max flags. */
class StreamingLateEventsSpec extends SparkTestBase {

  private val D = graft.ops.AnalyticsOps.LateDelayUs
  private val B = graft.ops.AnalyticsOps.LateBatchUs

  private def checkpoint(): String =
    Files.createTempDirectory("graft-sle-ckpt").toString

  private def freshState() = {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    TestGroupState.create[WatermarkState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
  }

  test("lateUpdate: first batch is never late; watermark folds after flagging") {
    val s = freshState()
    val t0 = 1000L * B
    // two events in the SAME arrival batch, 10 min apart in event time:
    // both flag against the (empty) pre-batch watermark — the later one
    // must NOT make the earlier one late (batch-granular, not per-record)
    val pairs0 = for {
      a <- 1L to 200L; b <- 1L to 200L
      if StreamingLateEvents.arrivalBatch(a, t0 + 2L * D) ==
        StreamingLateEvents.arrivalBatch(b, t0)
    } yield (a, b)
    assert(pairs0.nonEmpty)
    val (idLater, idEarlier) = pairs0.head
    val out = StreamingLateEvents.lateUpdate("view", Iterator(
      (idLater, t0 + 2L * D, 1L),    // later event time, same batch
      (idEarlier, t0, 2L)),          // 10 min earlier event time
      s).toSeq
    assert(out.map(_.late) == Seq(false, false),
      "same-batch events flag against the PRE-batch watermark only")
    assert(s.get == WatermarkState(t0 + 2L * D))
  }

  test("lateUpdate: multi-batch invocation replays batches in order") {
    val s = freshState()
    // mid-batch anchor: with tEarly on a batch multiple the floor
    // divisions align and no jitter (range ~1.67 batches) can put the
    // +2D event in a strictly earlier batch — 550 s in, it can
    val tEarly = 1000L * B + 550000000L
    val tLate = tEarly + 2L * D // one batch width later in event time
    // the jitter range (~16.7 min) exceeds the batch width (10 min), so
    // there exist id pairs where the LATER-in-event-time event ARRIVES
    // in an earlier batch — the out-of-order case the audit exists for
    val pairs = for {
      a <- 1L to 200L; b <- 1L to 200L
      if StreamingLateEvents.arrivalBatch(a, tLate) <
        StreamingLateEvents.arrivalBatch(b, tEarly)
    } yield (a, b)
    assert(pairs.nonEmpty, "jitter must be able to reorder adjacent batches")
    val (idA, idB) = pairs.head
    val out = StreamingLateEvents.lateUpdate("view", Iterator(
      (idB, tEarly, 1L),             // arrives in the LATER batch
      (idA, tLate, 2L)),             // arrives in the EARLIER batch
      s).toSeq
    // after idA's batch completes the watermark is tLate; tEarly trails
    // it by 2D > D -> late
    assert(out.map(f => (f.cent, f.late)) == Seq((2L, false), (1L, true)))
    assert(s.get == WatermarkState(tLate), "watermark never regresses")
  }

  test("lateUpdate: watermark persists across invocations (cross-batch flags)") {
    val s = freshState()
    val t1 = 5000L * B
    StreamingLateEvents.lateUpdate("view", Iterator((1L, t1, 1L)), s).toSeq
    val second = StreamingLateEvents.lateUpdate("view",
      Iterator((2L, t1 - 2L * D, 2L)), s).toSeq
    assert(second.map(_.late) == Seq(true),
      "an event 10 min behind the carried watermark must flag late")
    val third = StreamingLateEvents.lateUpdate("view",
      Iterator((3L, t1 - D, 3L)), s).toSeq
    assert(third.map(_.late) == Seq(false),
      "exactly D behind is NOT late (strict inequality)")
    assert(s.get == WatermarkState(t1))
  }

  test("batch-mode flagged + report equal q_analytics_late_events (sf0.001 and sf0.01)") {
    Seq(sfDir, "/root/testdata/sf0.01").foreach { dir =>
      val ev = ops.table(spark, dir, "events")
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cent"))
      val got = StreamingLateEvents.report(
          StreamingLateEvents.flagged(ev).toDF())
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
      val expect = SparkEntry.queries("q_analytics_late_events")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
      assert(got == expect, s"twin drift at $dir")
      if (dir.endsWith("sf0.01"))
        assert(got.map(_._4).sum > 0,
          "sf0.01 must exercise the late branch (jitter spread > batch width)")
    }
  }

  test("chunked arrival-batch-ordered streaming replay reproduces the batch report") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = ops.table(spark, sfDir, "events")
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cent"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(e => (StreamingLateEvents.arrivalBatch(e._2, e._3), e._2))
      .toSeq

    // chunk at ARRIVAL-BATCH boundaries (the stream's contract: a batch
    // lands wholly within one trigger, in batch order)
    val abs = rows.map(e => StreamingLateEvents.arrivalBatch(e._2, e._3))
    val distinctAbs = abs.distinct
    val cut = distinctAbs(distinctAbs.length / 2)
    val chunks = Seq(rows.zip(abs).filter(_._2 <= cut).map(_._1),
      rows.zip(abs).filter(_._2 > cut).map(_._1)).filter(_.nonEmpty)

    val input = MemoryStream[(String, Long, Long, Long)]
    val query = StreamingLateEvents.flagged(
        input.toDF().toDF("event_type", "event_id", "ts_us", "cent"))
      .writeStream.format("memory").queryName("sle_out")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      chunks.foreach { c => input.addData(c); query.processAllAvailable() }
      val got = StreamingLateEvents.report(spark.table("sle_out"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
      val expect = SparkEntry.queries("q_analytics_late_events")(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
      assert(got == expect, "streaming replay drift")
      // append-exactly-once: one flagged row per arrival
      assert(spark.table("sle_out").count() == rows.length.toLong)
    } finally query.stop()
  }
}
