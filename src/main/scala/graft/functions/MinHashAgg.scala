package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass MinHash signature aggregate (SURVEY §4.2 documented upgrade
  * path, taken): instead of K separate `min(xxhash64(seed_i, token))`
  * aggregate columns — K hash expressions and K aggregation buffers per
  * group — a single typed aggregate computes all K minima in one pass over
  * the tokens with one primitive-array buffer.
  *
  * Implemented as a typed `Aggregator` (the stable public API with the same
  * partial/merge/final contract as `TypedImperativeAggregate`): `reduce`
  * is the partial update on executors, `merge` combines map-side partials,
  * so the shuffle carries one K-long array per (group, partition) instead
  * of K separate buffers.
  *
  * The hash family is xxh64-style mixing of (seed, token-hash) — the same
  * family shape as the expression-based variant, deterministic across runs.
  */
final class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Seq[Long]] {
  require(k > 0 && k <= 128)

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  private def mix(seed: Long, h0: Long): Long = {
    // xxh64-ish avalanche over the token hash and seed
    var h = h0 ^ (seed * 0x9E3779B185EBCA87L)
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33
    h
  }

  override def reduce(buf: Array[Long], token: String): Array[Long] = {
    // hash the token once; derive the K family members by seed mixing
    var h0 = 0xCBF29CE484222325L
    var i = 0
    while (i < token.length) { h0 = (h0 ^ token.charAt(i)) * 0x100000001B3L; i += 1 }
    var j = 0
    while (j < k) {
      val h = mix(j.toLong, h0)
      if (h < buf(j)) buf(j) = h
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
