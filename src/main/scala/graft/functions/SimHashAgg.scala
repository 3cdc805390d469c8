package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass SimHash aggregate: hashes each token once with the replayable
  * polynomial base hash, derives one parity per bit position from the
  * [[ReplayableHash.SimHashParams]] affine family (vote +1 when odd, -1
  * when even), folds all vote sums in a single primitive-array buffer, and
  * finishes directly to the fingerprint (bit b set iff its vote sum is
  * positive).
  *
  * Replaces `bits` separate `sum(...)` aggregate columns — i.e. `bits`
  * aggregation buffers and expression trees per group — with one buffer and
  * one pass; the same shape win as [[MinHashAgg]], and it grows with K
  * (SimHash near-dup uses K = 64). Round 4 moved the hash family from
  * xxhash64 to [[ReplayableHash]] so the DuckDB oracle replays the exact
  * fingerprints in SQL.
  */
final class SimHashAgg(bits: Int) extends Aggregator[String, Array[Long], Long] {
  require(bits >= 1 && bits <= ReplayableHash.SimHashParams.length)

  override def zero: Array[Long] = new Array[Long](bits)

  private val ab: Array[Long] =
    ReplayableHash.SimHashParams.take(bits)
      .flatMap { case (a, b) => Seq(a, b) }.toArray

  override def reduce(buf: Array[Long], token: String): Array[Long] = {
    val h0 = ReplayableHash.tokenHash(token)
    var b = 0
    while (b < bits) {
      val parity = ((ab(2 * b) * h0 + ab(2 * b + 1)) % ReplayableHash.P) & 1L
      buf(b) += parity * 2 - 1
      b += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (buf(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Long] = ExpressionEncoder()
}
