package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the winnowing / content-defined-chunking generators.
  * All arithmetic is the [[ReplayableHash]] mod-P form, so every emitted
  * digest replays bit-identically in the DuckDB oracles (generated from the
  * same constants — see the TextOps / CurationOps oracle builders).
  */
object ContentChunkers {

  /** Code points of a UTF8String (DuckDB's character indexing unit). */
  def codePoints(s: UTF8String): Array[Int] = s.toString.codePoints().toArray

  private def rangeHash(cps: Array[Int], from: Int, until: Int): Long = {
    var h = 0L
    var j = from
    while (j < until) {
      h = (h * ReplayableHash.Base + cps(j)) % ReplayableHash.P
      j += 1
    }
    h
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * hash every `k`-codepoint window, slide a window of `w` consecutive
    * k-gram hashes, keep the minimum of each — the DISTINCT selected hash
    * VALUES, sorted ascending. Because only the distinct value set is kept,
    * the paper's positional tie-break is irrelevant (ties select the same
    * value), which is what lets the DuckDB twin replay it with a plain
    * sliding `min`. Degenerate inputs collapse exactly like
    * [[TextHashes.minShingle]]: fewer than `k` codepoints → the whole-text
    * hash; fewer than `w` k-grams → the global minimum k-gram hash.
    */
  def winnowSelect(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val cps = codePoints(s)
    val n = cps.length
    if (n < k) return Array(rangeHash(cps, 0, n))
    val m = n - k + 1
    val kg = new Array[Long](m)
    var p = 0
    while (p < m) { kg(p) = rangeHash(cps, p, p + k); p += 1 }
    if (m < w) return Array(kg.min)
    val sel = new java.util.TreeSet[java.lang.Long]()
    p = 0
    while (p + w <= m) {
      var best = kg(p)
      var j = p + 1
      while (j < p + w) { if (kg(j) < best) best = kg(j); j += 1 }
      sel.add(best)
      p += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Content-defined chunk spans: cut after codepoint offset `p + k` (for
    * 0-based k-gram start `p`) whenever the k-gram hash ≡ 0 (mod `mod`) —
    * the Rabin-style "boundary follows content, not position" rule, so a
    * local edit only redraws the chunks it touches (the storage-dedup
    * property CurationSpec pins). Returns the boundary offsets
    * `0 = b(0) < … < b(c) = n` (just `[0]` for empty input ⇒ zero chunks).
    * No min/max chunk bound: the declarative cut set is what the SQL twin
    * can replay; a greedy min-size pass is inherently sequential.
    */
  def cdcBoundaries(cps: Array[Int], k: Int, mod: Int): Array[Int] = {
    val n = cps.length
    val b = scala.collection.mutable.ArrayBuffer(0)
    if (n >= k) {
      var p = 0
      while (p + k <= n) {
        if (rangeHash(cps, p, p + k) % mod == 0 && p + k != n) b += (p + k)
        p += 1
      }
    }
    if (n > 0) b += n
    b.toArray
  }

  /** (digest, length) of each chunk: the [[TextHashes.shingleKey]] 60-bit
    * pairing digest over the chunk's codepoints — downstream exchanges
    * carry 8-byte longs, never chunk text (rule-5 digest discipline). */
  def cdcChunks(s: UTF8String, k: Int, mod: Int): Array[(Long, Int)] = {
    val cps = codePoints(s)
    val b = cdcBoundaries(cps, k, mod)
    val out = new Array[(Long, Int)](b.length - 1)
    var j = 0
    while (j < b.length - 1) {
      var h1 = 0L
      var h2 = 0L
      var i = b(j)
      while (i < b(j + 1)) {
        h1 = (h1 * ReplayableHash.Base + cps(i)) % ReplayableHash.P
        h2 = (h2 * ReplayableHash.Base2 + cps(i)) % ReplayableHash.P
        i += 1
      }
      out(j) = (h1 * ReplayableHash.P + h2, b(j + 1) - b(j))
      j += 1
    }
    out
  }
}

/** `winnow_hashes(text, k, w)`: one row per DISTINCT winnowing-selected
  * fingerprint (see [[ContentChunkers.winnowSelect]]). Digests leave the
  * scan; no text ever reaches an exchange. */
case class WinnowGenerator(child: Expression, k: Int, w: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(text, …) requires a STRING first argument, got ${child.dataType.sql}")

  require(k >= 1 && k <= 1024, s"k-gram width out of range: $k")
  require(w >= 1 && w <= 1024, s"winnow window out of range: $w")

  override def elementSchema: StructType =
    StructType(Seq(StructField("wh", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else ContentChunkers.winnowSelect(v.asInstanceOf[UTF8String], k, w)
      .iterator.map(h => InternalRow(h))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowGenerator =
    copy(child = newChild)
  override def prettyName: String = "winnow_hashes"
}

/** `cdc_chunks(text, k, mod)`: one row per content-defined chunk —
  * (ci, ch, clen) = 0-based index, 60-bit pairing digest, codepoint length
  * (see [[ContentChunkers.cdcChunks]]). */
case class CdcChunkGenerator(child: Expression, k: Int, mod: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(text, …) requires a STRING first argument, got ${child.dataType.sql}")

  require(k >= 1 && k <= 1024, s"k-gram width out of range: $k")
  require(mod >= 2 && mod <= (1 << 20), s"cut modulus out of range: $mod")

  override def elementSchema: StructType = StructType(Seq(
    StructField("ci", LongType, nullable = false),
    StructField("ch", LongType, nullable = false),
    StructField("clen", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else ContentChunkers.cdcChunks(v.asInstanceOf[UTF8String], k, mod)
      .iterator.zipWithIndex
      .map { case ((h, len), i) => InternalRow(i.toLong, h, len.toLong) }
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunkGenerator =
    copy(child = newChild)
  override def prettyName: String = "cdc_chunks"
}
