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

  // the full 16-member family, 8 bands of 2 rows — EXACTLY the declared
  // q_llm_minhash banding (LlmOps.NumHashes/NumBands and the injective
  // sig_even·P + sig_odd pairing), so the banded rewrite and a
  // hand-built LSH pipeline agree on band membership
  private val NumHashes = 16
  private val NumBands = 8
  private val FamA: Array[Long] =
    ReplayableHash.MinHashParams.take(NumHashes).map(_._1).toArray
  private val FamB: Array[Long] =
    ReplayableHash.MinHashParams.take(NumHashes).map(_._2).toArray

  /** The 8 banded MinHash signatures of a digest array (r14, the banded
    * Jaccard rewrite): per-member minima over the set, paired
    * injectively two-per-band. A pair at Jaccard J shares ≥ 1 band with
    * probability 1 − (1 − J²)⁸ — the banded recall curve, vs the
    * single-hash J. Empty arrays yield all −1 sentinels, which
    * [[minHashFirstBand]] refuses to match (empty sets have J = 0). */
  def minHashBands(a: ArrayData): ArrayData = {
    val out = new Array[Long](NumBands)
    val n = a.numElements()
    if (n == 0) {
      java.util.Arrays.fill(out, -1L)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = a.getLong(i) % P
      var k = 0
      while (k < NumHashes) {
        val h = (FamA(k) * x + FamB(k)) % P
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    var b = 0
    while (b < NumBands) {
      out(b) = mins(2 * b) * P + mins(2 * b + 1)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Smallest band index where two band-signature arrays agree, or −1 —
    * the banded rewrite's dedup key: a candidate pair survives only at
    * its FIRST matching band, so the b-fold fan-out stays
    * multiplicity-preserving (exactly one joined row per pair sharing
    * ≥ 1 band). −1 sentinels (empty sets) never match. */
  def minHashFirstBand(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      if (v != -1L && v == b.getLong(i)) return i
      i += 1
    }
    -1
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

/** `minhash_bands(a)`: the 8 banded MinHash signatures of a digest array
  * (see [[JaccardKernel.minHashBands]]), codegen'd — the banded Jaccard
  * rewrite's fan-out key, exposed so hand pipelines can pre-band with
  * exactly the rewrite's (and q_llm_minhash's) band membership. */
case class MinHashBands(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType]
        && child.dataType.asInstanceOf[ArrayType].elementType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(a) requires an ARRAY<BIGINT> argument, got ${child.dataType.sql}")
  override def nullSafeEval(v: Any): Any =
    JaccardKernel.minHashBands(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JaccardKernel.minHashBands($c)")
  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
  override def prettyName: String = "minhash_bands"
}

/** `minhash_first_band(a, b)`: smallest index where two band-signature
  * arrays agree, −1 if none (see [[JaccardKernel.minHashFirstBand]]) —
  * the banded rewrite's first-match dedup residual. */
case class MinHashFirstBand(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType.isInstanceOf[ArrayType]
        && e.dataType.asInstanceOf[ArrayType].elementType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(a, b) requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.minHashFirstBand(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaccardKernel.minHashFirstBand($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashFirstBand =
    copy(left = l, right = r)
  override def prettyName: String = "minhash_first_band"
}
