package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingSemdedup
import graft.streaming.StreamingSemdedup.{CellState, Verdict}

/** The streaming embedding-side SemDeDup twin must reproduce batch
  * `q_llm_emb_semdedup` EXACTLY on a vec_id-ordered replay (same plane
  * family, same keep-first cap, bit-identical cosine kernel), keep state
  * bounded at cells × cap, and apply the keep-first cap per cell.
  */
class StreamingSemdedupSpec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-sd-ckpt").toString

  test("cellUpdate: keep-first cap, min-id dup root, lower-id-only pairing (unit)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val e1 = Seq(1.0, 0.0)
    val e1b = Seq(0.999, 0.001) // cosine ~1 with e1
    val e2 = Seq(0.0, 1.0)      // orthogonal
    // fresh state per simulated invocation — the round-9 TestGroupState rule
    def st() = TestGroupState.create[CellState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val s1 = st()
    // arrivals in one batch are processed in vec_id order even if presented
    // unsorted; 12 pairs with the min matching id (10), not 11
    val out = StreamingSemdedup.cellUpdate(0L,
      Iterator((12L, e1b), (10L, e1), (11L, e1b), (20L, e2)), s1,
      tau = 0.9, cap = 3).toSeq
    assert(out == Seq(
      Verdict(10L, 0L, keep = true, None),
      Verdict(11L, 0L, keep = false, Some(10L)),
      Verdict(12L, 0L, keep = false, Some(10L)),
      // cap = 3 reached: 20 is outside the pairing set -> keep
      Verdict(20L, 0L, keep = true, None)))
    assert(s1.get.ids == Seq(10L, 11L, 12L), "state holds the first-3 members")
    // a later batch pairs against remembered state; over-cap stays keep
    val s2 = st()
    StreamingSemdedup.cellUpdate(0L, Iterator((10L, e1), (11L, e2)), s2,
      tau = 0.9, cap = 3).toSeq
    val out2 = StreamingSemdedup.cellUpdate(0L, Iterator((15L, e1b)), s2,
      tau = 0.9, cap = 3).toSeq
    assert(out2 == Seq(Verdict(15L, 0L, keep = false, Some(10L))))
  }

  test("cellUpdate: a redelivered wave emits nothing and consumes no cap slot") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val e1 = Seq(1.0, 0.0)
    val e1b = Seq(0.999, 0.001)
    def st() = TestGroupState.create[CellState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val s = st()
    StreamingSemdedup.cellUpdate(0L, Iterator((10L, e1), (11L, e1b)), s,
      tau = 0.9, cap = 3).toSeq
    // full redelivery of the same wave: zero verdicts, state untouched —
    // the StreamingSampleK idempotence contract
    val redelivered = StreamingSemdedup.cellUpdate(0L,
      Iterator((10L, e1), (11L, e1b)), s, tau = 0.9, cap = 3).toSeq
    assert(redelivered.isEmpty, "redelivered ids must emit no verdicts")
    assert(s.get.ids == Seq(10L, 11L), "redelivery must not grow state")
    // the cap slot was NOT consumed: a genuinely new arrival still pairs
    val out = StreamingSemdedup.cellUpdate(0L, Iterator((12L, e1b)), s,
      tau = 0.9, cap = 3).toSeq
    assert(out == Seq(Verdict(12L, 0L, keep = false, Some(10L))))
  }

  test("id-ordered chunked replay equals batch q_llm_emb_semdedup exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val vecs = graft.ops.AnnOps.embDouble(spark, sfDir)
      .select(col("vec_id"), col("emb")).as[(Long, Seq[Double])]
      .collect().sortBy(_._1).toSeq

    val input = MemoryStream[(Long, Seq[Double])]
    val query = StreamingSemdedup.verdicts(
        input.toDF().toDF("vec_id", "emb"))
      .writeStream.format("memory").queryName("sd_out")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      vecs.grouped(math.max(1, vecs.length / 3)).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      val got = spark.table("sd_out").collect()
        .map(r => (r.getLong(0),
          (r.getBoolean(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))))
        .toMap
      val batch = SparkEntry.queries("q_llm_emb_semdedup")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0),
          (r.getBoolean(3), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
        .toMap
      assert(got.size == vecs.size, "one verdict per vector")
      assert(got == batch,
        "streaming verdicts must equal the batch semdedup row for row")
      // parity is non-vacuous: the fixture has real dups
      assert(got.values.exists(!_._1), "fixture yields no dups — weak test")
      // bounded state: cells x cap
      val cells = spark.table("sd_out").select("bucket").distinct().count()
      assert(cells <= 256L)
    } finally query.stop()
  }
}
