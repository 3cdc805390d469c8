package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingTopK
import graft.streaming.StreamingTopK.{MgState, ShardTopK}

/** The sharded Misra–Gries streaming heavy hitters must (a) reproduce the
  * batch q_agg_heavy_hitters top-k EXACTLY when capacity covers each
  * shard's distinct keys, (b) honor the MG frequent-items guarantee when it
  * does not, and (c) implement the decrement semantics precisely (unit).
  */
class StreamingTopKSpec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-topk-ckpt").toString

  test("MG insert implements weighted decrement-all semantics (unit)") {
    // capacity 2: third key triggers decrements
    val (m1, d1) = StreamingTopK.mgInsert(Map(1L -> 3L, 2L -> 1L), 2, 3L, 1L)
    assert(m1 == Map(1L -> 2L) && d1 == 1L, "min counter vacates, others drop by 1")
    // heavy arriving weight spills through several decrement rounds, then
    // claims a freed slot with the remainder
    val (m2, d2) = StreamingTopK.mgInsert(Map(1L -> 2L, 2L -> 5L), 2, 3L, 4L)
    assert(m2 == Map(2L -> 3L, 3L -> 2L) && d2 == 2L,
      s"got $m2 decrs $d2: 2 rounds absorb w=2 (evicting key 1), remainder 2 inserts")
    // present key just accumulates
    val (m3, d3) = StreamingTopK.mgInsert(Map(1L -> 1L), 2, 1L, 7L)
    assert(m3 == Map(1L -> 8L) && d3 == 0L)
  }

  test("shardUpdate versions monotonically and carries n/decrs across batches (unit)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val s = TestGroupState.create[MgState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out1 = StreamingTopK.shardUpdate(2)(5, Iterator(10L, 10L, 11L), s).toSeq
    assert(out1 == Seq(ShardTopK(5, 1L, 10L, 2L, 3L, 0L),
      ShardTopK(5, 1L, 11L, 1L, 3L, 0L)))
    val out2 = StreamingTopK.shardUpdate(2)(5, Iterator(12L), s).toSeq
    // full table: key 12 decrements both, 11 vacates, 12 never lands
    assert(out2 == Seq(ShardTopK(5, 2L, 10L, 1L, 4L, 1L)))
    assert(s.get.version == 2L && s.get.n == 4L && s.get.decrs == 1L)
  }

  test("with covering capacity the merged summary equals batch heavy hitters") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val keys = ops.table(spark, sfDir, "lineitem")
      .select(col("l_partkey").as("key")).as[Long].collect().toSeq

    val input = MemoryStream[Long]
    val query = StreamingTopK.summaries(input.toDF().toDF("key"), capacity = 1000)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      keys.grouped(math.max(1, keys.length / 4)).foreach { c =>
        input.addData(c); query.processAllAvailable()
      }
      val summary = StreamingTopK
        .latestSummary(spark.table("topk_out"), k = 20).collect()
        .map(r => (r.getAs[Long]("key"), r.getAs[Long]("cnt"))).toSeq
      // capacity 1000 >> distinct parts per shard at sf0.001 → d = 0, exact
      val batch = SparkEntry.queries("q_agg_heavy_hitters")(spark, sfDir)
        .select("l_partkey", "c").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(summary == batch,
        "streaming summary must equal the batch top-20 exactly (incl. order)")
      val emitted = spark.table("topk_out")
      assert(emitted.agg(max("decrs")).head.getLong(0) == 0L,
        "covering capacity must never decrement")
    } finally query.stop()
  }

  test("under-capacity summaries keep the MG frequent-items guarantee") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // one shard, tiny capacity, skewed synthetic stream
    val stream = (1 to 400).map(_ => 1L) ++ (1 to 150).map(_ => 2L) ++
      (1L to 300L).map(4000L + _) // long uniform tail
    val s = TestGroupState.create[MgState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
    val out = stream.grouped(100).foldLeft(Seq.empty[ShardTopK]) { (_, c) =>
      StreamingTopK.shardUpdate(8)(0, c.iterator, s).toSeq
    }
    val n = stream.length.toLong
    val d = out.head.decrs
    val trueCnt = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val kept = out.map(r => r.key -> r.cnt).toMap
    assert(out.head.n_shard == n)
    // undercount bound: stored ≤ true ≤ stored + d, for every kept key
    kept.foreach { case (k, c) =>
      assert(c <= trueCnt(k) && trueCnt(k) <= c + d,
        s"key $k stored $c true ${trueCnt(k)} d $d")
    }
    // frequent-items guarantee: true count > n/(capacity+1) ⇒ key survives
    trueCnt.filter(_._2 > n / 9).keys.foreach { k =>
      assert(kept.contains(k), s"frequent key $k (cnt ${trueCnt(k)}) evicted")
    }
    assert(kept.contains(1L) && kept.contains(2L))
  }
}
