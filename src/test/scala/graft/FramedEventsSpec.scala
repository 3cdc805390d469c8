package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Guards the round-8 framed-events rewrite (StreamAnalogOps.framedEventsFor):
  * the single bucket-partitioned sort must reproduce EXACTLY what the naive
  * two-window formulation computes — keep-first dedup (earliest (ts, user_id)
  * row per event_id) and the global batch rank over survivors in event_id
  * order — because both q_stream_dedup and the flagship delivery report hash
  * against DuckDB twins written in the naive form.
  */
class FramedEventsSpec extends SparkTestBase {

  test("framed index survivors + ranks match the naive two-window form") {
    val framed = ops.StreamAnalogOps.framedEventsFor(spark, sfDir)
      .select("event_id", "rn", "batch_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val naive = {
      val ev = ops.table(spark, sfDir, "events")
      val dedupW = Window.partitionBy("event_id").orderBy("ts", "user_id")
      val deduped = ev.withColumn("dup_rn", row_number().over(dedupW))
        .where(col("dup_rn") === 1)
      // single-partition global window is FINE in a test oracle
      deduped.withColumn("rn",
          row_number().over(Window.orderBy("event_id")).cast("long"))
        .withColumn("batch_id", expr("CAST((rn - 1) div 500 AS BIGINT)"))
        .select("event_id", "rn", "batch_id")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    }

    assert(framed.keySet == naive.keySet,
      s"survivor sets differ: ${(framed.keySet diff naive.keySet).take(5)} / " +
        s"${(naive.keySet diff framed.keySet).take(5)}")
    val mismatched = framed.collect {
      case (id, rb) if naive(id) != rb => (id, rb, naive(id))
    }
    assert(mismatched.isEmpty,
      s"rn/batch mismatches (first 5): ${mismatched.take(5).toSeq}")
  }

  test("framed index keeps the earliest duplicate's row content") {
    val ev = ops.table(spark, sfDir, "events")
    val framed = ops.StreamAnalogOps.framedEventsFor(spark, sfDir)
    // each survivor's (ts, user_id) is the minimum for its event_id
    val firsts = ev.groupBy("event_id")
      .agg(min(struct(col("ts"), col("user_id"))).as("m"))
      .select(col("event_id"), col("m.ts").as("ts"), col("m.user_id").as("user_id"))
      .collect().map(r => r.getLong(0) -> ((r.get(1), r.getLong(2)))).toMap
    framed.select("event_id", "ts", "user_id").collect().foreach { r =>
      assert(firsts(r.getLong(0)) == ((r.get(1), r.getLong(2))),
        s"event ${r.getLong(0)} kept a non-earliest duplicate")
    }
  }
}
