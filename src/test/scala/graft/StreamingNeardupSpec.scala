package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.LlmOps
import graft.streaming.StreamingNeardup
import graft.streaming.StreamingNeardup.{BandPair, BucketState}

/** The streaming MinHash-band near-dup twin must sign documents
  * bit-identically to the batch docTokens → MinHashAgg pipeline, emit
  * each shared-band pair exactly once, reproduce the batch candidate
  * relation EXACTLY on a doc_id-ordered replay (keep-first cap ≡
  * capBuckets' doc_id-ordered cap), and stay idempotent under redelivery.
  */
class StreamingNeardupSpec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-nd-ckpt").toString

  test("signature kernel equals the batch MinHashAgg signatures (all docs)") {
    val docs = ops.table(spark, sfDir, "documents")
    val batch = LlmOps.minhashSigs(LlmOps.docTokens(docs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val texts = docs.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      assert(StreamingNeardup.signature(text).toSeq == batch(id),
        s"signature mismatch for doc $id")
    }
  }

  test("bucketUpdate: pairs vs members, cap, redelivery idempotence (unit)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // fresh state per simulated invocation — the round-9 TestGroupState rule
    def st() = TestGroupState.create[BucketState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val s = st()
    // in-batch arrivals process in doc_id order even when presented unsorted
    val out = StreamingNeardup.bucketUpdate((2, 77L),
      Iterator(12L, 10L, 11L), s, cap = 3).toSeq
    assert(out == Seq(
      BandPair(2, 77L, 10L, 11L),
      BandPair(2, 77L, 10L, 12L), BandPair(2, 77L, 11L, 12L)))
    assert(s.get.ids == Seq(10L, 11L, 12L))
    // over-cap arrival: no emission, no slot (capBuckets drops the row)
    val out2 = StreamingNeardup.bucketUpdate((2, 77L), Iterator(13L), s,
      cap = 3).toSeq
    assert(out2.isEmpty)
    assert(s.get.ids == Seq(10L, 11L, 12L))
    // full redelivery: zero emissions, state untouched
    val redelivered = StreamingNeardup.bucketUpdate((2, 77L),
      Iterator(10L, 11L, 12L), s, cap = 3).toSeq
    assert(redelivered.isEmpty)
    assert(s.get.ids == Seq(10L, 11L, 12L))
  }

  test("id-ordered chunked replay equals the batch candidate relation exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = ops.table(spark, sfDir, "documents")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

    val input = MemoryStream[(Long, String)]
    val query = StreamingNeardup.candidates(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("nd_out")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      val got = StreamingNeardup.pairReport(spark.table("nd_out"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batchDocs = ops.table(spark, sfDir, "documents")
      val batch = LlmOps.candidatePairsFromSigs(
          LlmOps.minhashSigs(LlmOps.docTokens(batchDocs)), LlmOps.MaxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(batch.nonEmpty, "fixture yields no candidates — weak test")
      assert(got == batch,
        "streaming pair report must equal the batch candidate relation")
    } finally query.stop()
  }
}
