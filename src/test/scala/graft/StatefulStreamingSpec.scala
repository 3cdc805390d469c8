package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
}
