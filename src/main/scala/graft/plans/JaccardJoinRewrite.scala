package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.{JaccardSimilarity, MinHashBucket}

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
  * No multi-probe variant: a cosine cell has a natural neighbor (flip the
  * weakest plane — same keyspace), but a second MinHash probe needs a
  * SECOND family member, which the right side's single bucket value can
  * never match — banding would need both sides fanned per band, a
  * multiplicity-changing rewrite, not a pure candidate prune. Higher
  * recall belongs to the declared banded operators (q_llm_minhash_*).
  *
  * Scale story: identical to LshJoinRewrite — the naive join is
  * impossible at 10^9 × 10^9; the rewritten plan shuffles each side once
  * on an 8-byte bucket key and evaluates exact Jaccard only inside
  * buckets. Deliberately uncapped (pure prune; skew hygiene stays with
  * AQE or the declared capped operators).
  */
object JaccardJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.lsh.jaccardJoinRewrite"

  private val BucketName = "__graft_minhash_bucket"

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "false").toBoolean

  private def bucketSide(plan: LogicalPlan, toks: Expression)
      : (LogicalPlan, Attribute) = {
    val a = Alias(MinHashBucket(toks), BucketName)()
    (Project(plan.output :+ a, plan), a.toAttribute)
  }

  private def alreadyBucketed(p: LogicalPlan): Boolean = p match {
    case Project(list, _) => list.exists(_.name == BucketName)
    case _ => false
  }

  /** The Jaccard-threshold conjunct of a join condition. */
  private def jaccardConjunct(cond: Expression): Option[JaccardSimilarity] =
    splitConjunctivePredicates(cond).collectFirst {
      case GreaterThanOrEqual(j: JaccardSimilarity, Literal(_, DoubleType)) => j
      case GreaterThan(j: JaccardSimilarity, Literal(_, DoubleType)) => j
      case LessThanOrEqual(Literal(_, DoubleType), j: JaccardSimilarity) => j
      case LessThan(Literal(_, DoubleType), j: JaccardSimilarity) => j
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
