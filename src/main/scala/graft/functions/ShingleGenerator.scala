package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator`: stream word n-gram shingles of a text
  * column as (pos, shingle) rows — one generator pass instead of
  * split→array→transform→explode materializing the token and shingle
  * arrays per row. Runs under the native `Generate` operator, so the
  * fan-out composes with whole-stage codegen on the parent side
  * (generators themselves evaluate interpreted; CodegenFallback).
  *
  * This is the shingling stage of the MinHash pipeline (reference-class
  * near-dup tooling) expressed as a first-class Catalyst extension rather
  * than a composition of array built-ins.
  */
case class ShingleGenerator(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1 && n <= 16, s"shingle width out of range: $n")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingles(text, n) requires a STRING first argument, got ${child.dataType.sql}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = v.asInstanceOf[UTF8String].toString
        .split(' ').iterator.filter(_.nonEmpty).toArray
      if (toks.length < n) Nil
      else new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i <= toks.length - n
        override def next(): InternalRow = {
          val sb = new java.lang.StringBuilder
          var j = i
          while (j < i + n) {
            if (j > i) sb.append(' ')
            sb.append(toks(j))
            j += 1
          }
          val row = InternalRow(i.toLong, UTF8String.fromString(sb.toString))
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
  override def prettyName: String = "shingles"
}
