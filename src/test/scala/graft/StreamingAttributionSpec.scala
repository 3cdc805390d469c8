package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingAttribution
import graft.streaming.StreamingAttribution.{Attributed, TouchRow}

/** The streaming last-touch attribution must reproduce the batch
  * q_analytics_attribution exactly under per-user in-order arrival — same
  * fixture, same strictly-before tie-break — and follow the enrichment
  * contract (state-so-far only) for late touches.
  */
class StreamingAttributionSpec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-attr-ckpt").toString

  test("streaming verdicts aggregate to the batch attribution report") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val tagged = ops.table(spark, sfDir, "events")
      .where(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("event_id"),
        (col("event_type") === "purchase").as("is_conv"),
        col("event_type").as("channel"), col("value"))
      .as[TouchRow].collect()
      .sortBy(r => (r.t_us, if (r.is_conv) 0 else 1, r.event_id))

    val input = MemoryStream[TouchRow]
    val query = StreamingAttribution.attribute(input.toDS())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      val chunks = tagged.grouped(math.max(1, tagged.length / 5)).toSeq
      chunks.foreach { c => input.addData(c.toIndexedSeq); query.processAllAvailable() }

      val got = spark.table("attr_out").as[Attributed].collect()
      // exact channel report: counts + DECIMAL(18,4)-exact revenue sums
      val gotReport = got.groupBy(_.channel).map { case (ch, as) =>
        (ch, (as.length.toLong,
          as.map(a => BigDecimal(a.value).setScale(4, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble))
      }
      val want = SparkEntry.queries("q_analytics_attribution")(spark, sfDir)
        .collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
      assert(gotReport == want)
    } finally query.stop()
  }

  test("a late touch credits only future conversions (enrichment contract)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val week = StreamingAttribution.DefaultLookbackUs
    val s = TestGroupState.create[(Long, Long, String)](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    // batch 1: conversion at t=100 with no touch seen -> 'none'
    val out1 = StreamingAttribution.userUpdate(7L,
      Iterator(TouchRow(7L, 100L, 1001L, is_conv = true, "purchase", 5.0)),
      s, week).toSeq
    assert(out1 == Seq(Attributed(1001L, 7L, 100L, "none", 5.0)))
    assert(!s.exists)
    // batch 2: the touch that SHOULD have served t=100 arrives late (t=50),
    // then a later conversion at t=200 — only the later one is credited
    val out2 = StreamingAttribution.userUpdate(7L,
      Iterator(TouchRow(7L, 50L, 11L, is_conv = false, "click", 0.0),
        TouchRow(7L, 200L, 1002L, is_conv = true, "purchase", 7.0)),
      s, week).toSeq
    assert(out2 == Seq(Attributed(1002L, 7L, 200L, "click", 7.0)))
    assert(s.get == ((50L, 11L, "click")))
  }

  test("same-instant touch is excluded, lookback expiry yields 'none'") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val week = StreamingAttribution.DefaultLookbackUs
    val s = TestGroupState.create[(Long, Long, String)](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    // a touch at the conversion's exact instant must NOT be credited
    // (strictly-before rule), but an earlier touch is
    val out = StreamingAttribution.userUpdate(9L,
      Iterator(TouchRow(9L, 90L, 5L, is_conv = false, "view", 0.0),
        TouchRow(9L, 100L, 6L, is_conv = false, "click", 0.0),
        TouchRow(9L, 100L, 2001L, is_conv = true, "purchase", 3.0)),
      s, week).toSeq
    assert(out == Seq(Attributed(2001L, 9L, 100L, "view", 3.0)))
    // the same-instant click still becomes state for the future
    assert(s.get == ((100L, 6L, "click")))
    // a conversion far beyond the lookback reverts to 'none'
    val out2 = StreamingAttribution.userUpdate(9L,
      Iterator(TouchRow(9L, 100L + week + 1L, 2002L, is_conv = true, "purchase", 4.0)),
      s, week).toSeq
    assert(out2 == Seq(Attributed(2002L, 9L, 100L + week + 1L, "none", 4.0)))
  }

  test("cross-batch same-instant touch is excluded too (batch-boundary independence)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val week = StreamingAttribution.DefaultLookbackUs
    val s = TestGroupState.create[(Long, Long, String)](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    // batch 1: only the touch at t=100 — it lands in state
    val out1 = StreamingAttribution.userUpdate(3L,
      Iterator(TouchRow(3L, 100L, 31L, is_conv = false, "click", 0.0)),
      s, week).toSeq
    assert(out1.isEmpty && s.get == ((100L, 31L, "click")))
    // batch 2: conversion at the SAME t=100 — the strictly-before rule must
    // hold even though the touch arrived in an earlier micro-batch
    val out2 = StreamingAttribution.userUpdate(3L,
      Iterator(TouchRow(3L, 100L, 3001L, is_conv = true, "purchase", 2.0)),
      s, week).toSeq
    assert(out2 == Seq(Attributed(3001L, 3L, 100L, "none", 2.0)))
    // a strictly later conversion is still credited from that state
    val out3 = StreamingAttribution.userUpdate(3L,
      Iterator(TouchRow(3L, 101L, 3002L, is_conv = true, "purchase", 6.0)),
      s, week).toSeq
    assert(out3 == Seq(Attributed(3002L, 3L, 101L, "click", 6.0)))
  }
}
