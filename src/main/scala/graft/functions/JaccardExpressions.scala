package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Static kernels for set-similarity over token-digest arrays
  * (`array<long>` — the rule-5b digest discipline applied to a scalar
  * API: tokens/shingles travel as 60-bit keys, never strings). Top-level
  * object ⇒ Java static forwarders, so generated code calls the kernels
  * directly and the expressions stay inside whole-stage codegen (the
  * [[TextHashes]] pattern).
  */
object JaccardKernel {

  private val P = ReplayableHash.P
  // member 0 of the salt-1 MinHash family — the rewrite CONSUMES the
  // existing family (the split_leakage rule: consumers of an existing
  // assignment don't burn a new salt), so a hand-built q_llm_minhash
  // pipeline and the automatic rewrite agree on bucket membership.
  private val MinA = ReplayableHash.MinHashParams.head._1
  private val MinB = ReplayableHash.MinHashParams.head._2

  /** Exact Jaccard similarity of two digest arrays AS SETS: |A∩B|/|A∪B|
    * (duplicates ignored); 0.0 when either set is empty. */
  def sim(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    val sa = new java.util.HashSet[java.lang.Long](math.max(8, n * 2))
    var i = 0
    while (i < n) { sa.add(a.getLong(i)); i += 1 }
    val sb = new java.util.HashSet[java.lang.Long](math.max(8, m * 2))
    var inter = 0
    i = 0
    while (i < m) {
      val v = b.getLong(i)
      if (sb.add(v) && sa.contains(v)) inter += 1
      i += 1
    }
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** MinHash bucket of a digest array: min over elements of the salt-1
    * member-0 affine map — P(bucket(A) = bucket(B)) = J(A, B), the
    * classic single-hash MinHash property the join rewrite prunes with.
    * −1 for an empty array (still equi-joinable; empty sets have J = 0
    * and never survive a positive threshold anyway). */
  def minHashBucket(a: ArrayData): Long = {
    val n = a.numElements()
    if (n == 0) return -1L
    var best = Long.MaxValue
    var i = 0
    while (i < n) {
      val h = (MinA * (a.getLong(i) % P) + MinB) % P
      if (h < best) best = h
      i += 1
    }
    best
  }
}

/** `jaccard_sim(a, b)`: exact set-Jaccard of two `array<long>` digest
  * columns, codegen'd — the scalar predicate
  * [[graft.plans.JaccardJoinRewrite]] recognizes on join conditions. */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(LongType, containsNull = false)
        && right.dataType == ArrayType(LongType, containsNull = false))
      TypeCheckResult.TypeCheckSuccess
    else if (left.dataType.isInstanceOf[ArrayType]
        && right.dataType.isInstanceOf[ArrayType]
        && left.dataType.asInstanceOf[ArrayType].elementType == LongType
        && right.dataType.asInstanceOf[ArrayType].elementType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(a, b) requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.sim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaccardKernel.sim($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSimilarity =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_sim"
}

/** `minhash_bucket(a)`: the salt-1 member-0 MinHash bucket of a digest
  * array (see [[JaccardKernel.minHashBucket]]), codegen'd — exposed so a
  * hand-written pipeline can pre-bucket with exactly the rewrite's key. */
case class MinHashBucket(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType]
        && child.dataType.asInstanceOf[ArrayType].elementType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(a) requires an ARRAY<BIGINT> argument, got ${child.dataType.sql}")
  override def nullSafeEval(v: Any): Any =
    JaccardKernel.minHashBucket(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JaccardKernel.minHashBucket($c)")
  override protected def withNewChildInternal(newChild: Expression): MinHashBucket =
    copy(child = newChild)
  override def prettyName: String = "minhash_bucket"
}
