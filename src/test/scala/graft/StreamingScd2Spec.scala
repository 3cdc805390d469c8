package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingScd2
import graft.streaming.StreamingScd2.{ChangeEmit, ChangeState}

/** The streaming SCD2 twin must equal batch q_sink_scd2 bit-for-bit after
  * any full replay (shared change projection + shared assembly body),
  * hold O(1) state per changed customer, and be idempotent under a full
  * redelivery wave (min-fold state). */
class StreamingScd2Spec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-scd2-ckpt").toString

  test("changeUpdate folds min and is redelivery-idempotent (unit)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val s = TestGroupState.create[ChangeState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    assert(StreamingScd2.changeUpdate(5L, Iterator(300L, 100L, 200L), s).toSeq ==
      Seq(ChangeEmit(5L, 1L, 100L)))
    // a later, larger change event must NOT move the effective ms
    assert(StreamingScd2.changeUpdate(5L, Iterator(250L), s).toSeq ==
      Seq(ChangeEmit(5L, 2L, 100L)))
    // full redelivery: same value out, only the version bumps
    assert(StreamingScd2.changeUpdate(5L, Iterator(300L, 100L, 200L), s).toSeq ==
      Seq(ChangeEmit(5L, 3L, 100L)))
    assert(s.get == ChangeState(3L, 100L))
  }

  test("chunked replay + full redelivery reproduce batch q_sink_scd2") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = graft.ops.SourceSinkOps
      .scd2ChangeEvents(ops.table(spark, sfDir, "orders"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(events.nonEmpty, "fixture yields no change events — weak test")

    val input = MemoryStream[(Long, Long)]
    val query = StreamingScd2.changes(
        input.toDF().toDF("c_custkey", "chg_ms"))
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      events.grouped(math.max(1, events.length / 3)).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      // full redelivery wave: every event again, state must not move
      input.addData(events); query.processAllAvailable()

      val emitted = spark.table("scd2_out")
      val latest = StreamingScd2.latestChanges(emitted)
      assert(latest.count() == events.map(_._1).distinct.length.toLong,
        "one live state row per changed customer")
      val dim = ops.table(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val got = StreamingScd2.scd2(dim, latest).collect().map(_.toSeq).toSeq
      val expect = SparkEntry.queries("q_sink_scd2")(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      assert(got == expect, "streaming replay drift vs batch scd2")
    } finally query.stop()
  }
}
