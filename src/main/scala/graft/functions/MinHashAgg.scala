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
  * The hash family is [[ReplayableHash]] — one polynomial base hash per
  * token plus K universal affine maps mod a prime, chosen (round 4) so the
  * DuckDB oracle can replay every signature bit-identically in SQL; see
  * ReplayableHash for the overflow-freedom argument.
  */
final class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Seq[Long]] {
  require(k > 0 && k <= ReplayableHash.MinHashParams.length)

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  // flat (a0, b0, a1, b1, ...) array: primitive access in the hot loop
  private val ab: Array[Long] =
    ReplayableHash.MinHashParams.take(k)
      .flatMap { case (a, b) => Seq(a, b) }.toArray

  override def reduce(buf: Array[Long], token: String): Array[Long] = {
    // hash the token once; derive the K family members by affine maps
    val h0 = ReplayableHash.tokenHash(token)
    var j = 0
    while (j < k) {
      val h = (ab(2 * j) * h0 + ab(2 * j + 1)) % ReplayableHash.P
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
