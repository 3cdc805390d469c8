package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingPitFeatures
import graft.streaming.StreamingPitFeatures.{PitFeatures, PitState}

/** The streaming PIT feature vectors must equal the batch
  * q_analytics_pit_features rows exactly after an in-order replay, and the
  * per-purchase read must see only STRICTLY earlier state (the no-leakage
  * contract, now at serving time).
  */
class StreamingPitFeaturesSpec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-pit-ckpt").toString

  test("pitUpdate reads state before folding the label's own row (unit)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val s = TestGroupState.create[PitState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    // one batch, deliberately out of order: purchase@30 view@10 click@20
    val out = StreamingPitFeatures.pitUpdate(7L,
      Iterator((3L, "purchase", 30L), (1L, "view", 10L), (2L, "click", 20L)),
      s).toSeq
    assert(out == Seq(PitFeatures(3L, 7L, 30L, 1L, 1L, 10L)),
      "in-batch sort must order (ts, id) before the state folds")
    // an equal-instant purchase AND click at ts 40, purchase id lower:
    // (ts, event_id) order folds the purchase FIRST -> click not visible
    val out2 = StreamingPitFeatures.pitUpdate(7L,
      Iterator((5L, "click", 40L), (4L, "purchase", 40L)), s).toSeq
    assert(out2 == Seq(PitFeatures(4L, 7L, 40L, 1L, 1L, 20L)),
      "equal-instant rows resolve by the batch frame's (ts, id) order")
    assert(s.get == PitState(1L, 2L, 40L), "state after both batches")
  }

  test("streamed features equal batch q_analytics_pit_features after in-order replay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ev = ops.table(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long, String, Long)]
      .collect().toSeq
      .sortBy(e => (e._4, e._1)) // the in-order replay contract

    val input = MemoryStream[(Long, Long, String, Long)]
    val query = StreamingPitFeatures.features(
        input.toDF().toDF("event_id", "user_id", "event_type", "ts_us"))
      .writeStream.format("memory").queryName("pit_out")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      ev.grouped(math.max(1, ev.length / 3)).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      val got = spark.table("pit_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
      val batch = SparkEntry.queries("q_analytics_pit_features")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
      assert(got == batch,
        "streaming feature vectors must equal the batch dump exactly")
    } finally query.stop()
  }
}
