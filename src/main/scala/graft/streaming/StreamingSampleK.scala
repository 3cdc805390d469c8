package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.ReplayableHash

/** Streaming exactly-k deterministic uniform sample — the streaming twin of
  * batch `q_llm_sample_k` (replayable-hash priority, keep the k smallest;
  * MixOps.sampleK). The draw is a pure function of `doc_id` (the salt-7
  * affine family), so the streaming operator needs NO RNG state and is
  * idempotent under redelivery: a doc arriving twice computes the same
  * priority and leaves the kept set unchanged — exactly the property that
  * makes a bottom-k sketch the standard streaming uniform sample.
  *
  * Bounded state: ids hash-route to [[NumShards]] shards; each shard keeps
  * its k smallest `(priority, doc_id)` pairs FOREVER-O(k) in keyed state
  * and re-emits its full kept set under a bumped `version` whenever a batch
  * changes it (≤ k rows per shard per batch). The k GLOBAL smallest always
  * live inside the union of per-shard k-smallest (any global winner is a
  * winner of its own shard), so [[latestSample]] — max-version rows per
  * shard, then the k smallest by `(h, doc_id)` — equals the batch query on
  * the same rows, exactly (StreamingSampleKSpec pins it).
  */
object StreamingSampleK {

  /** Same routing fan-out rationale as [[StreamingTopK.NumShards]]: the
    * state-op parallelism, not a semantic knob. */
  val NumShards = 64

  private val (sampleA, sampleB) = ReplayableHash.params(1, salt = 7).head

  /** The batch query's priority, replicated op-for-op in driver-side Scala
    * (the StreamingSemdedup parity discipline): all intermediates < 2^63. */
  private[graft] def priority(docId: Long): Long =
    (sampleA * (docId % ReplayableHash.P) + sampleB) % ReplayableHash.P

  final case class ShardSample(shard: Int, version: Long, doc_id: Long,
      h: Long)

  /** Kept bottom-k per shard, parallel seqs sorted by (h, id) — the
    * MgState layout rule (encoder-friendly, deterministic). */
  final case class SampleState(version: Long, ids: Seq[Long], hs: Seq[Long])

  /** The keyed state-update behind [[samples]], exposed for deterministic
    * unit testing with `TestGroupState`. Emits the full kept set (sorted
    * by (h, id)) under a bumped version iff the batch changed it. */
  private[graft] def shardUpdate(k: Int)(
      shard: Int, rows: Iterator[Long],
      state: GroupState[SampleState]): Iterator[ShardSample] = {
    val prev = state.getOption.getOrElse(SampleState(0L, Nil, Nil))
    val kept = prev.hs.zip(prev.ids)
    val arrivals = rows.toSeq.distinct.map(id => (priority(id), id))
    val merged = (kept ++ arrivals).distinct.sorted.take(k)
    if (merged == kept) Iterator.empty
    else {
      val version = prev.version + 1
      state.update(SampleState(version, merged.map(_._2), merged.map(_._1)))
      merged.iterator.map { case (h, id) => ShardSample(shard, version, id, h) }
    }
  }

  /** Per-micro-batch shard bottom-k over a streaming (or batch) frame with
    * a LONG `doc_id` column. Update mode. */
  def samples(docs: DataFrame, k: Int): Dataset[ShardSample] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(pmod(hash(col("doc_id")), lit(NumShards)).as("shard"),
        col("doc_id"))
      .as[(Int, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (shard: Int, it: Iterator[(Int, Long)],
         st: GroupState[SampleState]) => shardUpdate(k)(shard, it.map(_._2), st))
  }

  /** Reduce an emitted-sample table to the CURRENT global sample: the
    * max-version row set per shard, k smallest by (h, doc_id) — the
    * window-not-self-join shape (memory-sink resolution rule). */
  def latestSample(emitted: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard")
    emitted.withColumn("__mxv", max("version").over(w))
      .where(col("version") === col("__mxv")).drop("__mxv")
      .orderBy(asc("h"), asc("doc_id")).limit(k)
  }
}
