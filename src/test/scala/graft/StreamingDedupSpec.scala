package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingDedup

/** Streaming MinHash-LSH near-dup candidates: cross-batch state, recall on
  * near-identical docs, silence on unrelated docs, bucket cap. */
class StreamingDedupSpec extends SparkTestBase {

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat near the door"
  private val nearDup = base + " today" // one extra token
  private val unrelated =
    "completely different words about spark catalyst tungsten codegen shuffle partitions executors"

  test("near-identical docs across micro-batches become candidates; unrelated docs do not") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val cands = StreamingDedup.nearDupCandidates(
      input.toDF().toDF("doc_id", "text"))

    val query = cands.writeStream
      .format("memory").queryName("sdedup_out").outputMode(OutputMode.Append())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdedup-ckpt").toString)
      .start()
    try {
      input.addData((1L, base), (3L, unrelated))
      query.processAllAvailable()
      assert(spark.table("sdedup_out").isEmpty, "no pairs within the first batch")

      // the near-dup arrives LATER — state must remember batch 1
      input.addData((2L, nearDup))
      query.processAllAvailable()
      val pairs = spark.table("sdedup_out")
        .select("doc_a", "doc_b").distinct()
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)),
        s"near-dup pair not found across batches, got $pairs")
      assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
        s"unrelated doc paired: $pairs")

      // an exact replay of doc 1's text pairs with both earlier copies
      input.addData((4L, base))
      query.processAllAvailable()
      val pairs2 = spark.table("sdedup_out")
        .select("doc_a", "doc_b").distinct()
        .as[(Long, Long)].collect().toSet
      assert(pairs2.contains((1L, 4L)) && pairs2.contains((2L, 4L)))
    } finally query.stop()
  }

  test("bucket state is capped: a flood of identical docs stops emitting and growing") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val cands = StreamingDedup.nearDupCandidates(
      input.toDF().toDF("doc_id", "text"), maxPerBucket = 5)

    val query = cands.writeStream
      .format("memory").queryName("sdedup_cap").outputMode(OutputMode.Append())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdedup-ckpt2").toString)
      .start()
    try {
      input.addData((1L to 50L).map(i => (i, base)): _*)
      query.processAllAvailable()
      val pairs = spark.table("sdedup_cap")
        .select("doc_a", "doc_b").distinct()
        .as[(Long, Long)].collect().toSet
      // only the first 5 arrivals per bucket participate: C(5,2) pairs
      assert(pairs == (for {
        a <- 1L to 5L; b <- (a + 1) to 5L
      } yield (a, b)).toSet, s"got ${pairs.size} pairs")
    } finally query.stop()
  }

  test("state TTL: timers are armed on activity, timed-out buckets evict, post-eviction restarts fresh") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // deterministic unit test of the keyed update function: a live query
    // with pending processing-time timers schedules micro-batches
    // continuously, so TTL behavior is pinned here instead
    val fn = StreamingDedup.bucketUpdate(5, Some(2000L)) _

    // fresh bucket: pair emitted, members remembered, timer armed now+TTL
    val s1 = TestGroupState.create[Seq[Long]](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      10000L, Optional.empty(), false)
    val out1 = fn((0, 7L), Iterator((1L, 0, 7L), (2L, 0, 7L)), s1).toSeq
    assert(out1 == Seq(StreamingDedup.CandidatePair(1L, 2L, 0)))
    assert(s1.get == Seq(1L, 2L))
    assert(s1.getTimeoutTimestampMs.get.asInstanceOf[Long] == 12000L)

    // idle past the TTL: Spark invokes with hasTimedOut — state is removed
    val s2 = TestGroupState.create[Seq[Long]](
      Optional.of(Seq(1L, 2L)), GroupStateTimeout.ProcessingTimeTimeout,
      20000L, Optional.empty(), true)
    assert(fn((0, 7L), Iterator.empty, s2).isEmpty)
    assert(s2.isRemoved, "timed-out bucket state must be evicted")

    // a later arrival starts a FRESH bucket: no pairs with evicted members
    val s3 = TestGroupState.create[Seq[Long]](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      30000L, Optional.empty(), false)
    assert(fn((0, 7L), Iterator((9L, 0, 7L)), s3).isEmpty)
    assert(s3.get == Seq(9L))
  }
}
