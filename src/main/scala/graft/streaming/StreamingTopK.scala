package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters over an unbounded keyed stream — the streaming
  * twin of batch `q_agg_heavy_hitters` (exact top-k + shares), completing
  * the streaming-analog family (dedup / as-of / attribution / sessionize).
  *
  * Exact keyed counting needs state linear in the number of DISTINCT keys —
  * fine for a part catalog, fatal for open-ended keys (tokens, URLs) on a
  * 100 TB stream. So the operator is the classic bounded-memory summary
  * instead: **sharded Misra–Gries**. The key space is hash-partitioned into
  * [[NumShards]] shards; each shard maintains an MG summary of at most
  * `capacity` counters (decrement-all when a new key arrives at a full
  * table). State per shard is O(capacity) FOREVER, regardless of stream
  * length or key cardinality.
  *
  * Guarantees (per shard, n = rows seen by the shard, d = total decrements,
  * both tracked in state):
  *   - stored cnt ≤ true count ≤ stored cnt + d  (MG undercount bound);
  *   - every key with true count > d is present — in particular any key
  *     with true count > n/(capacity+1), the textbook frequent-items bound;
  *   - shards partition keys, so merging shard summaries loses nothing
  *     across shards (a key lives in exactly one shard).
  *
  * Each micro-batch the shard emits its FULL summary under a bumped
  * `version` (bounded: ≤ capacity rows per shard per batch); the current
  * global summary is the max-version row set per shard — [[latestSummary]].
  * With capacity ≥ the shard's distinct keys, d stays 0 and the summary IS
  * the exact count table (StreamingTopKSpec pins equality with the batch
  * heavy-hitters report on the same rows).
  */
object StreamingTopK {

  /** Keys-per-shard routing fan-out. At 32 local cores 64 shards keep every
    * core busy without many tiny state groups; on a large cluster this
    * scales with executor count (it is the state-op parallelism). */
  val NumShards = 64

  final case class ShardTopK(shard: Int, version: Long, key: Long,
      cnt: Long, n_shard: Long, decrs: Long)

  /** MG summary state per shard: a monotone emission version, rows seen,
    * total decrements, and the counter table (parallel seqs — a stable,
    * encoder-friendly layout). */
  final case class MgState(version: Long, n: Long, decrs: Long,
      keys: Seq[Long], cnts: Seq[Long])

  /** Weighted Misra–Gries insert into (keys→cnts), returning the updated
    * map and the decrement total it cost. Pure — unit-testable. */
  private[graft] def mgInsert(map: Map[Long, Long], capacity: Int,
      key: Long, w0: Long): (Map[Long, Long], Long) = {
    var m = map
    var w = w0
    var decrs = 0L
    while (w > 0) {
      if (m.contains(key)) { m = m.updated(key, m(key) + w); w = 0 }
      else if (m.size < capacity) { m = m.updated(key, w); w = 0 }
      else {
        // full table, absent key: decrement everyone by the min of (w, the
        // smallest counter); zeros vacate their slots. Each decrement unit
        // also absorbs one unit of the arriving weight (classic MG).
        val d = math.min(w, m.values.min)
        m = m.flatMap { case (k, c) =>
          if (c - d == 0) None else Some(k -> (c - d)) }
        w -= d
        decrs += d
      }
    }
    (m, decrs)
  }

  /** The keyed state-update behind [[summaries]], exposed for deterministic
    * unit testing with `TestGroupState`. Emits the shard's full summary
    * (sorted by cnt DESC, key — deterministic) under a bumped version. */
  private[graft] def shardUpdate(capacity: Int)(
      shard: Int, rows: Iterator[Long],
      state: GroupState[MgState]): Iterator[ShardTopK] = {
    val prev = state.getOption.getOrElse(MgState(0L, 0L, 0L, Nil, Nil))
    // pre-aggregate the batch before touching the MG table: one weighted
    // insert per distinct arriving key, in sorted key order (deterministic)
    val arrivals = rows.foldLeft(Map.empty[Long, Long]) { (m, k) =>
      m.updated(k, m.getOrElse(k, 0L) + 1L) }
    var map = prev.keys.zip(prev.cnts).toMap
    var decrs = prev.decrs
    var n = prev.n
    arrivals.toSeq.sortBy(_._1).foreach { case (k, w) =>
      val (m2, d) = mgInsert(map, capacity, k, w)
      map = m2; decrs += d; n += w
    }
    val version = prev.version + 1
    val sorted = map.toSeq.sortBy { case (k, c) => (-c, k) }
    state.update(MgState(version, n, decrs,
      sorted.map(_._1), sorted.map(_._2)))
    sorted.iterator.map { case (k, c) =>
      ShardTopK(shard, version, k, c, n, decrs) }
  }

  /** Per-micro-batch shard summaries over a streaming (or batch) frame with
    * a LONG `key` column. Update mode (each batch re-emits the summaries of
    * the shards that changed). */
  def summaries(keyed: DataFrame, capacity: Int): Dataset[ShardTopK] = {
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed
      .select(pmod(hash(col("key")), lit(NumShards)).as("shard"), col("key"))
      .as[(Int, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (shard: Int, it: Iterator[(Int, Long)],
         st: GroupState[MgState]) => shardUpdate(capacity)(shard, it.map(_._2), st))
  }

  /** Reduce an emitted-summary table to the CURRENT global summary: the
    * max-version row set per shard, top `k` by (cnt DESC, key). A batch
    * helper for sinks that append every emission (e.g. the memory sink). */
  def latestSummary(emitted: DataFrame, k: Int): DataFrame = {
    // per-shard max-version filter via a window, not a self-join: the
    // memory-sink view resolves ambiguously when joined with its own
    // aggregate, and the window partitions are the bounded shard count
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard")
    emitted.withColumn("__mxv", max("version").over(w))
      .where(col("version") === col("__mxv")).drop("__mxv")
      .orderBy(desc("cnt"), asc("key")).limit(k)
  }
}
