package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Static numeric-key kernels (top-level object ⇒ Java static forwarders,
  * callable from generated code — the [[TextHashes]] pattern).
  */
object NumericKeys {

  /** Total-order long key for a finite double: the IEEE-754 bit pattern
    * with the sign-fold (negative values flip their low 63 bits), so
    * signed-long comparison of keys equals double comparison of values —
    * the classic sortable-bits transform (same map Lucene/Parquet use for
    * sortable doubles). Injective on non-NaN doubles (−0.0 keys just
    * below +0.0), which makes it a lossless radix-select substrate:
    * 16-bit digits of the key are each DOMAIN-bounded (≤ 65536), so an
    * order statistic of arbitrary doubles selects through four bounded
    * histogram levels with no row-level sort anywhere. */
  def orderKey(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & Long.MaxValue)
  }
}

/** `double_order_key(x)`: the order-preserving IEEE bit key of a double
  * (see [[NumericKeys.orderKey]]), codegen'd. Engine-internal (the
  * radix-select order-statistic machinery groups on it); never surfaced
  * in an oracled output schema — DuckDB has no bit-pattern twin, and the
  * selection that uses it returns the VALUE, not the key. */
case class DoubleOrderKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(x) requires a DOUBLE argument, got ${child.dataType.sql}")
  override def nullSafeEval(v: Any): Any =
    NumericKeys.orderKey(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NumericKeys.orderKey($c)")
  override protected def withNewChildInternal(newChild: Expression): DoubleOrderKey =
    copy(child = newChild)
  override def prettyName: String = "double_order_key"
}
