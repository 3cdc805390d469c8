package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.{DeliverySettings, RetryPolicy}
import graft.streaming.{DeliverySink, MockDeliveryService}

/** Custom keyed state over a stream (SURVEY §2B engine-only surface):
  * `mapGroupsWithState` / `flatMapGroupsWithState` for per-key running
  * aggregates that outlive any single micro-batch — the engine's answer to
  * "custom state" the built-in windowed aggregations can't express.
  */
class StatefulStreamingSpec extends SparkTestBase {

  private def checkpoint(): String =
    Files.createTempDirectory("graft-state-ckpt").toString

  test("mapGroupsWithState keeps a running per-user delivery counter across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Double)] // (user_id, value)

    val counted = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (prevN, prevSum) = state.getOption.getOrElse((0L, 0.0))
          val batch = rows.toSeq
          val next = (prevN + batch.size, prevSum + batch.map(_._2).sum)
          state.update(next)
          (user, next._1, next._2)
      }
      .toDF("user_id", "n_events", "sum_value")

    val query = counted.writeStream
      .format("memory").queryName("state_out").outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      input.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
      query.processAllAvailable()
      input.addData((1L, 2.0), (3L, 7.0))
      query.processAllAvailable()
      // Update-mode memory sink keeps every emitted row; the latest row per
      // user carries the accumulated state.
      val latest = spark.table("state_out")
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
      assert(latest(1L) == ((1L, 3L, 17.0)))
      assert(latest(2L) == ((2L, 1L, 1.0)))
      assert(latest(3L) == ((3L, 1L, 7.0)))
    } finally query.stop()
  }

  test("flatMapGroupsWithState emits session-close events on processing-time timeout semantics") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)] // (user_id, ts)

    // Emit one row per user per batch with the session's event count so far;
    // a real pipeline would emit only on timeout — the shape is identical.
    val sessions = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator.single((user, n))
      }
      .toDF("user_id", "n_so_far")

    val query = sessions.writeStream
      .format("memory").queryName("sess_out").outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      val t = Timestamp.valueOf("2024-01-01 00:00:00")
      input.addData((7L, t), (7L, t), (8L, t))
      query.processAllAvailable()
      input.addData((7L, t))
      query.processAllAvailable()
      val rows = spark.table("sess_out").as[(Long, Long)].collect().toSet
      assert(rows.contains((7L, 2L)) && rows.contains((7L, 3L)) && rows.contains((8L, 1L)))
    } finally query.stop()
  }

  // The reference's at-least-once + consumer-dedup delivery contract
  // (Firehose.scala:103, SURVEY §3.2), proven under CRASH RECOVERY rather
  // than a clean run: the service dies mid-batch after accepting part of
  // the epoch (epoch NOT committed to the checkpoint), the query restarts
  // from the same checkpoint, and the replay re-delivers the whole epoch —
  // duplicates appear exactly for the records the crashed attempt had
  // accepted, and deduplication converges to exactly the batch result.
  test("kill-mid-batch restart converges to exactly the batch result") {
    val srcDir = Files.createTempDirectory("graft-crash-drop").toString
    val ckpt = checkpoint()
    val schema = "event_id LONG, tag STRING, v DOUBLE"

    // 40 events; one carries a poison tag that makes the service THROW
    // mid-request — a crash after partial acceptance. parallelism = 1 +
    // batchSize 10 so acceptance before the crash is chunk-sequential.
    val lines = (0 until 40).map { i =>
      val tag = if (i == 25) "POISON" else s"tag$i"
      s"""{"event_id":$i,"tag":"$tag","v":${i * 1.5}}"""
    }
    Files.write(Paths.get(srcDir, "f1.json"),
      lines.mkString("\n").getBytes("UTF-8"))

    def source = spark.readStream.schema(schema).json(srcDir)
    val settings = DeliverySettings("crash-restart", batchSize = 10,
      triggerIntervalMs = 0L, parallelism = 1,
      retryPolicy = Some(RetryPolicy(1, 3)))

    // attempt 1: thrown service errors are NOT retried (R3 contract) —
    // the task fails, the epoch never commits, the query dies
    val svc1 = new MockDeliveryService(throwMarker = "POISON")
    val (q1, _) = DeliverySink.run(source, settings, svc1, ckpt)
    val failure = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    assert(failure.getMessage.contains("service error") ||
      Option(failure.getCause).exists(_.getMessage.contains("service error")))
    assert(svc1.delivered.size < 40,
      s"epoch must not complete, yet ${svc1.delivered.size} records landed")

    // attempt 2 (poison condition cleared), SAME checkpoint: the
    // uncommitted epoch replays in full
    val svc2 = new MockDeliveryService()
    val (q2, stats2) = DeliverySink.run(source, settings, svc2, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(stats2().residualFailures == 0)
    assert(svc2.delivered.size == 40)

    // what the downstream consumer sees across both attempts:
    val seen = svc1.deliveredStrings ++ svc2.deliveredStrings
    val expected = DeliverySink.payloads(
      spark.read.schema(schema).json(srcDir), settings)
      .collect()
      .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).toSet
    assert(expected.size == 40)
    // duplicates exactly for the crashed attempt's accepted records...
    assert(seen.size == svc1.delivered.size + 40)
    // ...bounded by the retry contract (one uncommitted replay => <= 2)...
    assert(seen.groupBy(identity).values.forall(_.size <= 2))
    // ...and consumer dedup converges to EXACTLY the batch result
    assert(seen.toSet == expected)
  }
}
