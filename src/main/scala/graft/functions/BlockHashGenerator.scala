package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator`: disjoint `w`-token block hashes of a text
  * column as (blk, bh) rows — the candidate stage of span-level exact
  * dedup (the "remove duplicated 50-token spans" operator of
  * reference-class corpus curation, sized to this corpus's short docs).
  *
  * Emits one row per COMPLETE `w`-token block (stride `w`, trailing
  * partial block dropped): `blk` is the 0-based block index, `bh` the
  * [[ReplayableHash]] fold over the block's token hashes — both engines
  * compute it bit-identically, so the whole downstream df-count / dup-flag
  * pipeline replays in the DuckDB oracle.
  *
  * Deliberately emits DIGESTS, not span text: every exchange downstream of
  * the scan carries (doc_id, blk, bh) only — the plan-audit rule-5 "no raw
  * text on a shuffle" discipline is satisfied by construction.
  */
case class BlockHashGenerator(child: Expression, w: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(w >= 1 && w <= 64, s"block width out of range: $w")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"block_hashes(text, w) requires a STRING first argument, got ${child.dataType.sql}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("blk", LongType, nullable = false),
    StructField("bh", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = v.asInstanceOf[UTF8String].toString
        .split(' ').iterator.filter(_.nonEmpty).toArray
      val nBlocks = toks.length / w
      if (nBlocks == 0) Nil
      else new Iterator[InternalRow] {
        private var b = 0
        override def hasNext: Boolean = b < nBlocks
        override def next(): InternalRow = {
          var h = 0L
          var j = b * w
          while (j < (b + 1) * w) {
            h = (h * ReplayableHash.BlockBase
              + ReplayableHash.tokenHash(toks(j))) % ReplayableHash.P
            j += 1
          }
          val row = InternalRow(b.toLong, h)
          b += 1
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BlockHashGenerator =
    copy(child = newChild)
  override def prettyName: String = "block_hashes"
}
