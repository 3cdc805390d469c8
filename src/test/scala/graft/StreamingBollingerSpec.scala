package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingBollinger
import graft.streaming.StreamingBollinger.RingState

/** The streaming Bollinger twin must equal batch q_ts_bollinger
  * bit-for-bit after an in-order replay (shared grid builder + shared
  * formula strings), zero-fill skipped hours like the gapfilled batch
  * grid, and keep O(window) state per type. */
class StreamingBollingerSpec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-sb-ckpt").toString

  private def freshState() = {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    TestGroupState.create[RingState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
  }

  test("ringUpdate: emits from the 24th hour, zero-fills gaps, caps state") {
    val s = freshState()
    // hours 0..22 (23 points): nothing emits yet
    val warm = StreamingBollinger.ringUpdate("t",
      (0L to 22L).map(h => ("t", h, h + 1)).iterator, s).toSeq
    assert(warm.isEmpty && s.get.ring.length == 23)
    // hour 23 completes the window; skipping to hour 26 zero-fills 24, 25
    val out = StreamingBollinger.ringUpdate("t",
      Iterator(("t", 23L, 100L), ("t", 26L, 7L)), s).toSeq
    assert(out.map(_.hour) == Seq(23L, 24L, 25L, 26L))
    assert(out.map(_.k) == Seq(100L, 0L, 0L, 7L), "gap hours are zero points")
    assert(out.forall(_.n == 24L))
    assert(s.get.ring.length == 24, "ring stays O(window)")
    assert(out.head.s1 == (1L to 23L).sum + 100L)
  }

  test("ringUpdate: redelivered or out-of-order-old hours emit nothing") {
    val s = freshState()
    val first = StreamingBollinger.ringUpdate("t",
      (0L to 25L).map(h => ("t", h, h)).iterator, s).toSeq
    assert(first.map(_.hour) == Seq(23L, 24L, 25L))
    val redelivered = StreamingBollinger.ringUpdate("t",
      (0L to 25L).map(h => ("t", h, h)).iterator, s).toSeq
    assert(redelivered.isEmpty, "monotone hour guard must drop replays")
  }

  test("batch-mode moments + report equal q_ts_bollinger bit-for-bit") {
    val grid = ops.DiagOps.hourlyCentGrid(spark, sfDir)
    val got = StreamingBollinger.report(
        StreamingBollinger.moments(grid).toDF()).collect().map(_.toSeq).toSeq
    val expect = SparkEntry.queries("q_ts_bollinger")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == expect, "twin drift vs batch")
  }

  test("chunked in-order streaming replay reproduces the batch report") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = ops.DiagOps.hourlyCentGrid(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._2).toSeq

    val input = MemoryStream[(String, Long, Long)]
    val query = StreamingBollinger.moments(
        input.toDF().toDF("event_type", "h", "k"))
      .writeStream.format("memory").queryName("sb_out")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      rows.grouped(math.max(1, rows.length / 4)).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      val got = StreamingBollinger.report(spark.table("sb_out"))
        .collect().map(_.toSeq).toSeq
      val expect = SparkEntry.queries("q_ts_bollinger")(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      assert(got == expect, "streaming replay drift vs batch")
    } finally query.stop()
  }
}
