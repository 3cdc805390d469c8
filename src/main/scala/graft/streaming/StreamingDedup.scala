package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection: MinHash-LSH candidate generation
  * over an UNBOUNDED document stream — what a 100 TB ingest pipeline runs
  * in front of the batch dedup pass, so near-copies are flagged as they
  * arrive instead of in a nightly job.
  *
  * Shape:
  *   1. per-row MinHash signatures built from pure codegen'd expressions
  *      (`transform` + `xxhash64(seed, token)` + `array_min`) — no
  *      aggregation, so they stream;
  *   2. the same banded-blocking SHAPE as the batch path (graft.ops.LlmOps)
  *      — 16 hashes, 8 bands of 2 rows, docs agreeing on any band are
  *      candidates — but a different (per-row-computable) hash family, so
  *      streaming and batch candidate sets are statistically equivalent,
  *      not row-identical;
  *   3. keyed state per bucket (`flatMapGroupsWithState`) remembers the
  *      first `maxPerBucket` doc ids seen and emits a candidate pair for
  *      every later arrival — the streaming analog of the batch
  *      keep-first-K mega-bucket cap, bounding both state size and pair
  *      fan-out per bucket.
  *
  * Candidates are emitted at-least-once across bands (same as the batch
  * path before its n_shared_bands aggregation); downstream exact
  * verification (Jaccard) is idempotent, so duplicates are harmless.
  */
object StreamingDedup {

  final case class CandidatePair(doc_a: Long, doc_b: Long, band: Int)

  private val NumHashes = 16
  private val NumBands = 8 // 2 rows per band

  /** (doc_id, band, bh) LSH bucket rows from a streaming (or batch)
    * DataFrame with `doc_id` and `text` columns — stateless, codegen'd. */
  def lshBands(docs: DataFrame): DataFrame = {
    val toks = array_distinct(filter(split(col("text"), " "),
      t => length(t) > 0))
    val sigCols = (0 until NumHashes).map { k =>
      array_min(transform(toks, t => xxhash64(lit(k), t))).as(s"sig$k")
    }
    val withSigs = docs.select(col("doc_id") +: sigCols: _*)
    val bandCols = (0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b), col(s"sig${2 * b}"), col(s"sig${2 * b + 1}")).as("bh"))
    }
    withSigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** Candidate near-dup pairs over a streaming document source. State per
    * LSH bucket holds at most `maxPerBucket` doc ids (keep-first, by
    * arrival then id); each new doc pairs against the remembered members.
    *
    * State is evicted after `stateTtl` of bucket inactivity (processing-time
    * timeout): on an UNBOUNDED stream the per-bucket keep-first sets would
    * otherwise grow with the number of distinct buckets ever seen and
    * eventually exhaust the state store — near-dups in an ingest pipeline
    * are overwhelmingly temporally close, so an idle bucket's members stop
    * earning their keep. A production deployment of the unbounded pipeline
    * should ALWAYS set a TTL, paired with a real trigger interval: pending
    * processing-time timers make Spark schedule micro-batches continuously,
    * so with the default 0 ms trigger a TTL'd query busy-loops (measured —
    * hence TTL is opt-in rather than defaulted, and bounded replays keep
    * total recall).
    */
  def nearDupCandidates(docs: DataFrame,
      maxPerBucket: Int = 50,
      stateTtl: Option[java.time.Duration] = None)
      : Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    lshBands(docs)
      .as[(Long, Int, Long)]
      .groupByKey { case (_, band, bh) => (band, bh) }
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        bucketUpdate(maxPerBucket, stateTtl.map(_.toMillis)))
  }

  /** The keyed state-update function behind [[nearDupCandidates]], exposed
    * for deterministic unit testing with Spark's `TestGroupState`
    * (processing-time TTL can't be pinned through a live query: pending
    * timers schedule continuous micro-batches). */
  private[graft] def bucketUpdate(maxPerBucket: Int, ttlMs: Option[Long])(
      key: (Int, Long), rows: Iterator[(Long, Int, Long)],
      state: GroupState[Seq[Long]]): Iterator[CandidatePair] =
    if (state.hasTimedOut) {
      state.remove() // idle bucket: drop its keep-first set
      Iterator.empty
    } else {
      val seen = state.getOption.getOrElse(Seq.empty)
      val newcomers = rows.map(_._1).toSeq.distinct.sorted
        .filterNot(seen.contains)
      var members = seen
      val out = newcomers.flatMap { id =>
        val pairs =
          if (members.size < maxPerBucket)
            members.map(prev =>
              CandidatePair(math.min(prev, id), math.max(prev, id), key._1))
          else Seq.empty // bucket capped: stop pairing AND stop growing
        if (members.size < maxPerBucket) members = members :+ id
        pairs
      }
      state.update(members)
      ttlMs.foreach(state.setTimeoutDuration) // re-arm on every activity
      out.iterator
    }
}
