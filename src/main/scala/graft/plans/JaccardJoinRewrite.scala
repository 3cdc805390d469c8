package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.functions.{JaccardSimilarity, MinHashBands, MinHashBucket, MinHashFirstBand}

/** Catalyst optimizer rule: rewrite a brute-force Jaccard-threshold join
  *
  * {{{ a JOIN b ON jaccard_sim(a.toks, b.toks) >= tau [AND ...] }}}
  *
  * — which Spark can only plan as BroadcastNestedLoopJoin or
  * CartesianProduct — into a MinHash bucket EQUI-join: both sides gain a
  * projected `__graft_minhash_bucket` column (min over the array of the
  * salt-1 member-0 affine map — the SAME family the declared MinHash
  * operators use), the bucket equality joins hash-partitioned, and the
  * original Jaccard predicate remains as the exact verifier. The
  * [[LshJoinRewrite]] opt-in + exact-subset-spec pattern, applied to the
  * second classic similarity (r12 verdict item 5).
  *
  * The rewrite is APPROXIMATE with a QUANTIFIED prune: P(bucket match) =
  * J(A, B) exactly (the single-hash MinHash property), so a pair at the
  * threshold tau survives with probability tau — recall measured in
  * JaccardJoinRewriteSpec against the brute-force join. A silent
  * result-changing rewrite must never be default Spark behavior, so the
  * rule only fires when the session opts in:
  *
  * {{{ spark.conf.set(JaccardJoinRewrite.EnabledKey, "true") }}}
  *
  * A second opt-in ([[BandsKey]], r14 — verdict item 5) switches to the
  * BANDED shape: both sides fan out 8-fold via posexplode of the
  * 8-band × 2-row MinHash signature array (`minhash_bands` — the SAME
  * banding as the declared q_llm_minhash operators), the equi key
  * becomes (band index, band signature), and the
  * `minhash_first_band(la, ra) = pos` residual keeps each candidate
  * pair ONLY at its first matching band — the fan-out is
  * multiplicity-preserving (exactly one joined row per pair sharing
  * ≥ 1 band), so banding is a legal pure prune after all. Recall lifts
  * from the single-hash J to 1 − (1 − J²)⁸ (0.53 at tau = 0.3 vs 0.3;
  * ~1 at J ≥ 0.7) at the cost of an 8× wider exchange.
  *
  * Scale story: identical to LshJoinRewrite — the naive join is
  * impossible at 10^9 × 10^9; the rewritten plan shuffles each side once
  * on an 8-byte bucket key and evaluates exact Jaccard only inside
  * buckets. Deliberately uncapped (pure prune; skew hygiene stays with
  * AQE or the declared capped operators).
  */
object JaccardJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.lsh.jaccardJoinRewrite"

  /** Second opt-in: the 8-band fan-out shape (recall 1 − (1 − J²)⁸). */
  val BandsKey = "spark.graft.lsh.jaccardBands"

  private val BucketName = "__graft_minhash_bucket"
  private val BandsName = "__graft_mh_bands"
  private val PosName = "__graft_mh_pos"
  private val SigName = "__graft_mh_sig"

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "false").toBoolean

  private def bandsEnabled: Boolean =
    conf.getConfString(BandsKey, "false").toBoolean

  private def bucketSide(plan: LogicalPlan, toks: Expression)
      : (LogicalPlan, Attribute) = {
    val a = Alias(MinHashBucket(toks), BucketName)()
    (Project(plan.output :+ a, plan), a.toAttribute)
  }

  /** One side of the banded shape: project the 8-long band-signature
    * array, then posexplode it — (band index, band signature) become the
    * join's equi keys and the array itself stays available for the
    * first-match residual. */
  private def bandSide(plan: LogicalPlan, toks: Expression)
      : (LogicalPlan, Attribute, Attribute, Attribute) = {
    val a = Alias(MinHashBands(toks), BandsName)()
    val proj = Project(plan.output :+ a, plan)
    val pos = AttributeReference(PosName, IntegerType, nullable = false)()
    val sig = AttributeReference(SigName, LongType, nullable = false)()
    val gen = Generate(PosExplode(a.toAttribute),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(pos, sig), child = proj)
    (gen, a.toAttribute, pos, sig)
  }

  private def alreadyBucketed(p: LogicalPlan): Boolean = p match {
    case Project(list, _) =>
      list.exists(a => a.name == BucketName || a.name == BandsName)
    case g: Generate =>
      g.generatorOutput.exists(_.name == PosName) || alreadyBucketed(g.child)
    case _ => false
  }

  /** The Jaccard-threshold conjunct of a join condition. Binds the
    * literal tau and only accepts 0 < tau ≤ 1 (r13 advisor note): at
    * tau = 0 the predicate is a brute-force tautology and the documented
    * "survives with probability tau" contract degenerates to probability
    * 0 — a degenerate threshold must stay un-rewritten. */
  private def jaccardConjunct(cond: Expression): Option[JaccardSimilarity] =
    splitConjunctivePredicates(cond).collectFirst {
      case GreaterThanOrEqual(j: JaccardSimilarity, Literal(t: Double, DoubleType))
          if t > 0.0 && t <= 1.0 => j
      case GreaterThan(j: JaccardSimilarity, Literal(t: Double, DoubleType))
          if t > 0.0 && t <= 1.0 => j
      case LessThanOrEqual(Literal(t: Double, DoubleType), j: JaccardSimilarity)
          if t > 0.0 && t <= 1.0 => j
      case LessThan(Literal(t: Double, DoubleType), j: JaccardSimilarity)
          if t > 0.0 && t <= 1.0 => j
    }

  /** Same guard as [[LshJoinRewrite]]: a join that already carries a
    * cross-side equality plans as a hash join — adding our bucket
    * equality would silently TIGHTEN its results. */
  private def hasEquiKey(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean = {
    def crossSides(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(left.outputSet) && a.references.nonEmpty &&
        b.references.subsetOf(right.outputSet) && b.references.nonEmpty) ||
      (a.references.subsetOf(right.outputSet) && a.references.nonEmpty &&
        b.references.subsetOf(left.outputSet) && b.references.nonEmpty)
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) => crossSides(a, b)
      case EqualNullSafe(a, b) => crossSides(a, b)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner | Cross, Some(cond), hint)
          if !alreadyBucketed(left) && !alreadyBucketed(right)
            && !hasEquiKey(cond, left, right) =>
        jaccardConjunct(cond).flatMap { jac =>
          val sides = Seq(jac.left, jac.right).map { e =>
            if (e.references.subsetOf(left.outputSet)) Some("l")
            else if (e.references.subsetOf(right.outputSet)) Some("r")
            else None
          }
          (sides, Seq(jac.left, jac.right)) match {
            case (Seq(Some("l"), Some("r")), Seq(le, re)) => Some((le, re))
            case (Seq(Some("r"), Some("l")), Seq(re, le)) => Some((le, re))
            case _ => None
          }
        } match {
          case Some((lToks, rToks)) if bandsEnabled =>
            val (newLeft, lb, lp, ls) = bandSide(left, lToks)
            val (newRight, rb, rp, rs) = bandSide(right, rToks)
            val newJoin = Join(
              newLeft, newRight, j.joinType,
              Some(And(And(EqualTo(lp, rp), EqualTo(ls, rs)),
                And(EqualTo(MinHashFirstBand(lb, rb), lp), cond))), hint)
            Project(j.output, newJoin)
          case Some((lToks, rToks)) =>
            val (newLeft, lb) = bucketSide(left, lToks)
            val (newRight, rb) = bucketSide(right, rToks)
            val newJoin = Join(
              newLeft, newRight, j.joinType,
              Some(And(EqualTo(lb, rb), cond)), hint)
            Project(j.output, newJoin)
          case None => j
        }
    }
  }
}
