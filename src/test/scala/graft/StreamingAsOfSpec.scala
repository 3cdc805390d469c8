package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingAsOf
import graft.streaming.StreamingAsOf.{AsOfRow, EnrichedEvent}

/** The streaming as-of enrichment must reproduce the batch q_join_asof
  * exactly under per-user in-order arrival — same fixture, same tie-breaks —
  * and follow the enrichment contract (state-so-far only) for late orders.
  */
class StreamingAsOfSpec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-asof-ckpt").toString

  test("streaming enrichment matches batch q_join_asof under in-order arrival") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // fixture rows as tagged as-of input, globally ordered by (t, kind)
    val orders = ops.table(spark, sfDir, "orders")
      .select(col("o_custkey").as("user_id"),
        ops.ntzMillis(col("o_orderdate")).as("t_ms"),
        lit(true).as("is_order"), col("o_orderkey").as("order_key"),
        lit(-1L).as("event_id"))
    val events = ops.table(spark, sfDir, "events")
      .select(col("user_id"), unix_millis(col("ts")).as("t_ms"),
        lit(false).as("is_order"), lit(-1L).as("order_key"), col("event_id"))
    val tagged = orders.unionByName(events).as[AsOfRow].collect()
      .sortBy(r => (r.t_ms, if (r.is_order) 0 else 1, r.order_key))

    val input = MemoryStream[AsOfRow]
    val query = StreamingAsOf.enrich(input.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      // several micro-batches, split at time boundaries so per-user order
      // holds across batches (rows of equal t never straddle a batch)
      val chunks = tagged.grouped(math.max(1, tagged.length / 5)).toSeq
      chunks.foreach { c => input.addData(c.toIndexedSeq); query.processAllAvailable() }

      val got = spark.table("asof_out").as[EnrichedEvent].collect()
        .map(e => e.event_id -> ((e.order_key, e.order_ms))).toMap
      val want = SparkEntry.queries("q_join_asof")(spark, sfDir)
        .collect()
        .map { r =>
          val key = if (r.isNullAt(2)) None else Some(r.getLong(2))
          val ms = if (r.isNullAt(3)) None else Some(r.getLong(3))
          r.getLong(0) -> ((key, ms))
        }.toMap
      assert(got.size == want.size)
      assert(got == want)
    } finally query.stop()
  }

  test("a late order enriches only future events (enrichment contract)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // batch 1: event at t=100 with no order seen -> unenriched
    val s1 = TestGroupState.create[(Long, Long)](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out1 = StreamingAsOf.userUpdate(7L,
      Iterator(AsOfRow(7L, 100L, is_order = false, -1L, 1001L)), s1).toSeq
    assert(out1 == Seq(EnrichedEvent(1001L, 7L, None, None)))
    assert(!s1.exists) // no order yet -> no state written
    // batch 2: the order that SHOULD have served t=100 arrives late (t=50),
    // then a later event at t=200 — only the later event sees it
    val out2 = StreamingAsOf.userUpdate(7L,
      Iterator(AsOfRow(7L, 50L, is_order = true, 555L, -1L),
        AsOfRow(7L, 200L, is_order = false, -1L, 1002L)), s1).toSeq
    assert(out2 == Seq(EnrichedEvent(1002L, 7L, Some(555L), Some(50L))))
    assert(s1.get == ((50L, 555L)))
  }

  test("same-instant order serves the event, and ties pick the max order key") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val s = TestGroupState.create[(Long, Long)](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    // two orders at the event's exact instant (arbitrary iterator order):
    // `<=` includes them, tie-break takes the larger key — batch semantics
    val out = StreamingAsOf.userUpdate(9L,
      Iterator(AsOfRow(9L, 100L, is_order = false, -1L, 2001L),
        AsOfRow(9L, 100L, is_order = true, 20L, -1L),
        AsOfRow(9L, 100L, is_order = true, 30L, -1L)), s).toSeq
    assert(out == Seq(EnrichedEvent(2001L, 9L, Some(30L), Some(100L))))
  }
}
