package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingKAnon
import graft.streaming.StreamingKAnon.{ClassCount, ClassState}

/** The streaming k-anonymity twin must reproduce batch
  * q_profile_k_anon bit-for-bit after any chunked replay, with state
  * keyed by quasi-identifier classes (domain-bounded), not rows. */
class StreamingKAnonSpec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-ka-ckpt").toString

  test("classUpdate accumulates counts and the sensitive set (unit)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val s = TestGroupState.create[ClassState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out1 = StreamingKAnon.classUpdate((7L, 12L),
      Iterator("BUILDING", "AUTOMOBILE", "BUILDING"), s).toSeq
    assert(out1 == Seq(ClassCount(7L, 12L, 1L, 3L, 2L)))
    val out2 = StreamingKAnon.classUpdate((7L, 12L),
      Iterator("MACHINERY"), s).toSeq
    assert(out2 == Seq(ClassCount(7L, 12L, 2L, 4L, 3L)))
    assert(s.get == ClassState(2L, 4L,
      Seq("AUTOMOBILE", "BUILDING", "MACHINERY")))
  }

  test("after a chunked replay the report equals batch q_profile_k_anon") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = graft.ops.ProfileOps
      .kAnonBanded(graft.ops.table(spark, sfDir, "customer"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq

    val input = MemoryStream[(Long, Long, String)]
    val query = StreamingKAnon.classes(
        input.toDF().toDF("nation", "bal_band", "c_mktsegment"))
      .writeStream.format("memory").queryName("ka_out")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      val classes = StreamingKAnon.latestClasses(spark.table("ka_out"))
      // bounded state: one live class per observed (nation, band)
      assert(classes.count() == rows.map(r => (r._1, r._2)).distinct.size.toLong)
      val got = StreamingKAnon.report(classes)
        .collect().map(_.toSeq).toSeq
      val want = SparkEntry.queries("q_profile_k_anon")(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      assert(got == want, "streaming k-anonymity drifted from batch")
    } finally query.stop()
  }
}
