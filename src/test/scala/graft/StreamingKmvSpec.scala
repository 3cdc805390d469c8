package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingKmv
import graft.streaming.StreamingKmv.{KmvState, ShardKmv}

/** The streaming KMV sketch must equal the batch q_agg_kmv_distinct triple
  * EXACTLY on the same rows, stay idempotent under redelivery (min-fold),
  * and keep only O(k) state per (type, shard).
  */
class StreamingKmvSpec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-kmv-ckpt").toString

  test("shardUpdate keeps the k smallest distinct hashes, emits only on change (unit)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val s = TestGroupState.create[KmvState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val hs1 = Seq(10L, 11L, 12L, 11L) // duplicate hash in one batch
    val out1 = StreamingKmv.shardUpdate(2)(("click", 3), hs1.iterator, s).toSeq
    assert(out1 == Seq(ShardKmv("click", 3, 1L, 10L), ShardKmv("click", 3, 1L, 11L)))
    assert(s.get.hs == Seq(10L, 11L), "state holds the 2 smallest distinct")
    // redelivery of kept hashes: no state change, no emission (min-fold)
    val out2 = StreamingKmv.shardUpdate(2)(("click", 3),
      Seq(10L, 11L).iterator, s).toSeq
    assert(out2.isEmpty && s.get.version == 1L,
      "redelivered hashes must not bump the version")
    // a larger hash than every kept one: also no change
    assert(StreamingKmv.shardUpdate(2)(("click", 3),
      Iterator(99L), s).isEmpty)
    // a smaller hash displaces the largest kept one
    val out3 = StreamingKmv.shardUpdate(2)(("click", 3), Iterator(5L), s).toSeq
    assert(out3.map(_.h) == Seq(5L, 10L) && s.get.version == 2L)
    assert(s.get.hs.length == 2, "state stays capped at k")
  }

  test("streamed sketch equals the batch q_agg_kmv_distinct triple") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = ops.table(spark, sfDir, "events")
      .select(col("event_type"), col("user_id"))
      .as[(String, Long)].collect().toSeq

    val input = MemoryStream[(String, Long)]
    val query = StreamingKmv.sketches(
        input.toDF().toDF("event_type", "user_id"), k = graft.ops.DiagOps.KmvK)
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      // three arrival waves, then a full REDELIVERY wave (idempotence)
      rows.grouped(math.max(1, rows.length / 3)).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      val afterFirst = spark.table("kmv_out").count()
      input.addData(rows); query.processAllAvailable()
      assert(spark.table("kmv_out").count() == afterFirst,
        "full redelivery must emit nothing new")
      val got = StreamingKmv
        .latestSketch(spark.table("kmv_out"), k = graft.ops.DiagOps.KmvK)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      val batch = SparkEntry.queries("q_agg_kmv_distinct")(spark, sfDir)
        .select("event_type", "sketch_size", "kth_hash", "est_distinct")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      assert(got == batch,
        "streaming KMV must equal the batch sketch triple exactly")
    } finally query.stop()
  }
}
