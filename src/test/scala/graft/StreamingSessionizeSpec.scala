package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingSessionize
import graft.streaming.StreamingSessionize.{SessionEvent, Sessionized}

/** The streaming sessionizer must reproduce the batch
  * q_analytics_sessionize exactly under in-order arrival — same fixture,
  * same gap predicate, same 1-based numbering — with sessions that close
  * by successor-gap AND by event-time timeout, including sessions spanning
  * micro-batches.
  */
class StreamingSessionizeSpec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-sess-ckpt").toString

  private val Sentinel = 999999999L

  test("streaming sessions equal the batch sessionization on the fixtures") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = ops.table(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[SessionEvent].collect()
      .sortBy(e => (e.ts, e.user_id, e.event_id))
    val maxTs = rows.map(_.ts).max

    val input = MemoryStream[SessionEvent]
    val query = StreamingSessionize.sessionize(
        input.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      // globally time-ordered chunks: the watermark after each batch is
      // behind every later event (the in-order contract), and per-user
      // sessions routinely SPAN the chunk boundaries
      val chunks = rows.grouped(math.max(1, rows.length / 5)).toSeq
      chunks.foreach { c => input.addData(c.toIndexedSeq); query.processAllAvailable() }
      // two far-future sentinel events push the watermark past every open
      // session's last_us + gap, firing the event-time timeouts; the
      // sentinel's own (still-open) session is excluded from the compare
      input.addData(Seq(SessionEvent(Sentinel, maxTs.plusSeconds(3600L), 1L)))
      query.processAllAvailable()
      input.addData(Seq(SessionEvent(Sentinel, maxTs.plusSeconds(7200L), 2L)))
      query.processAllAvailable()

      val got = spark.table("sess_out").as[Sessionized].collect()
        .filter(_.user_id != Sentinel)
        .map(s => (s.user_id, s.session_n, s.n_events, s.start_us, s.end_us,
          s.duration_us)).sorted.toSeq
      val want = SparkEntry.queries("q_analytics_sessionize")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).sorted.toSeq
      assert(got == want)
      assert(want.nonEmpty)
    } finally query.stop()
  }

  test("timeout closes the open session and numbering survives the tombstone") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val gap = StreamingSessionize.DefaultGapUs
    def ev(tUs: Long, id: Long) =
      SessionEvent(7L, Instant.ofEpochSecond(tUs / 1000000L,
        (tUs % 1000000L) * 1000L), id)

    // batch 1: two events 10 min apart -> one open session in state
    val s = TestGroupState.create[StreamingSessionize.Open](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(0L)), false)
    val out1 = StreamingSessionize.userUpdate(7L,
      Iterator(ev(1000000L, 1L), ev(600L * 1000000L + 1000000L, 2L)), s, gap).toSeq
    assert(out1.isEmpty)
    assert(s.get == ((1L, 1000000L, 600L * 1000000L + 1000000L, 2L)))
    assert(s.getTimeoutTimestampMs.get ==
      (600L * 1000000L + 1000000L + gap) / 1000L)

    // watermark passes last + gap: timeout fires, session 1 is emitted,
    // a tombstone carrying session_n = 2 stays behind
    val s2 = TestGroupState.create[StreamingSessionize.Open](
      Optional.of(s.get), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf((600L * 1000000L + 1000000L + gap) / 1000L + 1L)),
      true)
    val out2 = StreamingSessionize.userUpdate(7L, Iterator.empty, s2, gap).toSeq
    assert(out2 == Seq(Sessionized(7L, 1L, 2L, 1000000L,
      600L * 1000000L + 1000000L, 600L * 1000000L)))
    assert(s2.get == ((2L, 0L, 0L, 0L)))
    assert(!s2.getTimeoutTimestampMs.isPresent ||
      s2.getTimeoutTimestampMs.get == (600L * 1000000L + 1000000L + gap) / 1000L + 1L)

    // the next event starts session 2, not session 1 (fresh state wrapper:
    // the engine constructs one per invocation, and TestGroupState pins
    // hasTimedOut for the object's lifetime)
    val s3 = TestGroupState.create[StreamingSessionize.Open](
      Optional.of(s2.get), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(0L)), false)
    val out3 = StreamingSessionize.userUpdate(7L,
      Iterator(ev(7200L * 1000000L, 3L)), s3, gap).toSeq
    assert(out3.isEmpty)
    assert(s3.get == ((2L, 7200L * 1000000L, 7200L * 1000000L, 1L)))
  }

  test("an in-batch gap closes the session with the batch boundary semantics") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val gap = StreamingSessionize.DefaultGapUs
    def ev(tUs: Long, id: Long) =
      SessionEvent(9L, Instant.ofEpochSecond(tUs / 1000000L,
        (tUs % 1000000L) * 1000L), id)
    val s = TestGroupState.create[StreamingSessionize.Open](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(0L)), false)
    // t=0, t=gap (exactly: same session — the batch `> gap` rule),
    // t=2*gap+1 (closes session 1), t=2*gap+2 (same session 2)
    val out = StreamingSessionize.userUpdate(9L,
      Iterator(ev(0L, 1L), ev(gap, 2L), ev(2L * gap + 1L, 3L),
        ev(2L * gap + 2L, 4L)), s, gap).toSeq
    assert(out == Seq(Sessionized(9L, 1L, 2L, 0L, gap, gap)))
    assert(s.get == ((2L, 2L * gap + 1L, 2L * gap + 2L, 2L)))
  }
}
