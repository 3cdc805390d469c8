package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass SimHash aggregate: folds pre-hashed tokens (xxhash64 longs,
  * hashed by the codegen'd expression upstream) into the ±1 vote sums for
  * all `bits` positions using a single primitive-array buffer, and finishes
  * directly to the fingerprint (bit b set iff its vote sum is positive).
  *
  * Replaces `bits` separate `sum(...)` aggregate columns — i.e. `bits`
  * aggregation buffers and expression trees per group — with one buffer and
  * one pass; the same shape win as [[MinHashAgg]], and it grows with K
  * (SimHash near-dup uses K = 64).
  */
final class SimHashAgg(bits: Int) extends Aggregator[Long, Array[Long], Long] {
  require(bits >= 1 && bits <= 64)

  override def zero: Array[Long] = new Array[Long](bits)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var b = 0
    while (b < bits) {
      buf(b) += ((h >>> b) & 1L) * 2 - 1
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
