package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingSampleK
import graft.streaming.StreamingSampleK.{SampleState, ShardSample}

/** The streaming bottom-k sample must equal the batch q_llm_sample_k draw
  * EXACTLY on the same rows (same priorities, same k smallest, same order),
  * stay idempotent under redelivery, and keep only O(k) state per shard.
  */
class StreamingSampleKSpec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-samplek-ckpt").toString

  test("shardUpdate keeps the k smallest, emits only on change (unit)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val s = TestGroupState.create[SampleState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val ids1 = Seq(10L, 11L, 12L)
    val out1 = StreamingSampleK.shardUpdate(2)(3, ids1.iterator, s).toSeq
    val expect1 = ids1.map(id => (StreamingSampleK.priority(id), id))
      .sorted.take(2)
    assert(out1 == expect1.map { case (h, id) => ShardSample(3, 1L, id, h) })
    // redelivery of already-kept ids: no state change, no emission
    val out2 = StreamingSampleK.shardUpdate(2)(3,
      expect1.map(_._2).iterator, s).toSeq
    assert(out2.isEmpty && s.get.version == 1L,
      "redelivered ids must not bump the version")
    // a smaller-priority arrival displaces the largest kept pair
    val better = (1L to 500L)
      .find(id => StreamingSampleK.priority(id) < expect1.last._1).get
    val out3 = StreamingSampleK.shardUpdate(2)(3, Iterator(better), s).toSeq
    assert(out3.nonEmpty && out3.map(_.version).distinct == Seq(2L))
    assert(s.get.ids.length == 2, "state must stay capped at k")
    assert(s.get.ids.contains(better))
  }

  test("streamed sample equals the batch q_llm_sample_k draw, including order") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ids = ops.table(spark, sfDir, "documents")
      .select(col("doc_id")).as[Long].collect().toSeq

    val input = MemoryStream[Long]
    val query = StreamingSampleK.samples(input.toDF().toDF("doc_id"), k = 100)
      .writeStream.format("memory").queryName("samplek_out")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      // four arrival waves, then a full REDELIVERY wave (idempotence)
      ids.grouped(math.max(1, ids.length / 4)).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      val afterFirst = spark.table("samplek_out").count()
      input.addData(ids); query.processAllAvailable()
      assert(spark.table("samplek_out").count() == afterFirst,
        "full redelivery must emit nothing new")
      val got = StreamingSampleK
        .latestSample(spark.table("samplek_out"), k = 100).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("h"))).toSeq
      val batch = SparkEntry.queries("q_llm_sample_k")(spark, sfDir)
        .select("doc_id", "h").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == batch,
        "streaming bottom-k must equal the batch draw exactly (incl. order)")
    } finally query.stop()
  }
}
