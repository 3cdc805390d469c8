package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.ReplayableHash
import graft.ops.LlmOps

/** Streaming MinHash-band near-dup candidates: the last dedup modality
  * without a streaming twin (r14 verdict item 3) — exact-id ingest dedup
  * is StreamingDedup, embedding-LSH is StreamingSemdedup; this is the
  * workhorse TEXT near-dup path (tokens → MinHash signature → banded LSH
  * buckets → in-bucket candidate pairs) run as documents arrive.
  *
  * Shape (the StreamingSemdedup keyed-state template over LSH buckets):
  *   1. each arriving document is tokenized and MinHash-signed with a
  *      driver-side Scala kernel replicated op-for-op from the batch path
  *      (whitespace split + length>0 ≙ LlmOps.docTokens; one
  *      ReplayableHash.tokenHash per token + the salt-1 affine family,
  *      running minima ≙ MinHashAgg.reduce) — signatures are bit-identical
  *      across batch and stream, spec-pinned;
  *   2. the signature fans out to its [[LlmOps.NumBands]] band keys
  *      (`sig[2b]·P + sig[2b+1]` — the injective pairing lshBuckets uses),
  *      and keyed state per (band, bh) bucket remembers the first
  *      [[LlmOps.MaxBucket]] member doc ids (keep-first by arrival;
  *      micro-batch arrivals process in doc_id order) — the streaming
  *      analog of the batch capBuckets mega-bucket cap. Per-KEY state is
  *      bounded at cap longs forever; the key COUNT is O(distinct
  *      buckets), which the state store shards horizontally — the same
  *      contract as StreamingDedup's per-id keys, not the 2^8-cell
  *      semdedup bound;
  *   3. each under-cap arrival emits one candidate row per remembered
  *      member, normalized (doc_a = min, doc_b = max), so every unordered
  *      pair surfaces exactly once per shared band. Over-cap arrivals
  *      emit nothing and take no slot (batch capBuckets drops them from
  *      the bucket entirely); re-delivered ids already in state emit
  *      nothing (idempotence, the StreamingSampleK contract).
  *
  * [[pairReport]] is the batch pair tail (group the emitted band rows by
  * pair, count shared bands — LlmOps.candidatePairsFromSigs' aggregate):
  * on a doc_id-ORDERED stream it equals the batch candidate relation
  * EXACTLY (keep-first cap ≡ capBuckets' doc_id-ordered cap), pinned by
  * StreamingNeardupSpec. Out-of-order streams degrade gracefully to
  * first-arrival-wins bucket membership — still bounded, still
  * deterministic given the stream order.
  */
object StreamingNeardup {

  final case class BandPair(band: Int, bh: Long, doc_a: Long, doc_b: Long)

  /** Keyed bucket state: member doc ids, keep-first capped.
    * `private[graft]` (not `private`) so Janino-generated encoder code can
    * see it — the round-5 buffer-visibility rule. */
  private[graft] final case class BucketState(ids: Seq[Long])

  // flat (a0, b0, a1, b1, ...) affine constants — same layout as
  // MinHashAgg's hot loop, same salt-1 family
  private val ab: Array[Long] =
    ReplayableHash.MinHashParams.take(LlmOps.NumHashes)
      .flatMap { case (a, b) => Seq(a, b) }.toArray

  /** MinHash signature of a document text — op-for-op the batch
    * docTokens → MinHashAgg pipeline (distinctness is irrelevant under
    * min, so the token multiset needs no dedup pass). */
  private[graft] def signature(text: String): Array[Long] = {
    val k = LlmOps.NumHashes
    val sig = Array.fill(k)(Long.MaxValue)
    text.split(" ").foreach { tok =>
      if (tok.nonEmpty) {
        val h0 = ReplayableHash.tokenHash(tok)
        var j = 0
        while (j < k) {
          val h = (ab(2 * j) * h0 + ab(2 * j + 1)) % ReplayableHash.P
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
    }
    sig
  }

  /** The (band, bh) keys of a signature — the lshBuckets pairing. */
  private[graft] def bandKeys(sig: Array[Long]): Seq[(Int, Long)] =
    (0 until LlmOps.NumBands).map { b =>
      (b, sig(2 * b) * ReplayableHash.P + sig(2 * b + 1))
    }

  /** The per-bucket state update behind [[candidates]], exposed for
    * deterministic unit testing with `TestGroupState`. */
  private[graft] def bucketUpdate(key: (Int, Long), arrivals: Iterator[Long],
      state: GroupState[BucketState],
      cap: Int = LlmOps.MaxBucket): Iterator[BandPair] = {
    var ids = state.getOption.map(_.ids.toVector).getOrElse(Vector.empty)
    val out = Vector.newBuilder[BandPair]
    arrivals.toSeq.sorted.foreach { id =>
      if (ids.contains(id)) ()            // redelivery: no emission, no slot
      else if (ids.length >= cap) ()      // over-cap: outside the pairing set
      else {
        ids.foreach { m =>
          out += BandPair(key._1, key._2, math.min(m, id), math.max(m, id))
        }
        ids :+= id
      }
    }
    state.update(BucketState(ids))
    out.result().iterator
  }

  /** Per-arrival band-level candidate emissions over a streaming (or
    * batch) frame with `doc_id` LONG and `text` STRING columns. Update
    * mode; per-bucket state is capped at [[LlmOps.MaxBucket]] ids. */
  def candidates(docs: DataFrame): Dataset[BandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        bandKeys(signature(text)).map { case (b, bh) => (b, bh, id) }
      }
      .groupByKey { case (b, bh, _) => (b, bh) }
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (k: (Int, Long), it: Iterator[(Int, Long, Long)],
            st: GroupState[BucketState]) => bucketUpdate(k, it.map(_._3), st))
  }

  /** The batch pair tail over an emitted-candidates table: shared-band
    * count per normalized pair — after a doc_id-ordered replay this
    * equals LlmOps.candidatePairsFromSigs at the same cap, row for row. */
  def pairReport(emitted: DataFrame): DataFrame =
    emitted.groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared_bands"))
}
