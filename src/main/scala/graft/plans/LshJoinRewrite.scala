package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.CosineSimilarity

/** Catalyst optimizer rule: rewrite a brute-force cosine-threshold join
  *
  * {{{ a JOIN b ON cosine_sim(a.emb, b.emb) >= tau [AND ...] }}}
  *
  * — which Spark can only plan as BroadcastNestedLoopJoin or
  * CartesianProduct (O(|a|·|b|) similarity evaluations) — into a sign-LSH
  * bucket EQUI-join: both sides gain a projected `__graft_lsh_bucket`
  * column (the 8-plane sign bucket over the SAME hyperplane family the
  * declared near-dup operators use, [[graft.ops.LlmOps.NeardupPlanes]]),
  * the bucket equality joins hash-partitioned, and the original cosine
  * predicate remains as the exact verifier — the candidate/verify shape
  * every LSH pipeline hand-writes, produced automatically from the naive
  * formulation. This is the "rewrite brute-force similarity joins to
  * LSH-pruned joins" extension point SURVEY §4.2 reserves as the one
  * genuinely novel optimization this engine can own.
  *
  * The rewrite is APPROXIMATE: pairs whose vectors land in different
  * sign-LSH cells are pruned before the cosine check (the same nprobe=1
  * miss the semdedup operators quantify — recall measured in
  * LshJoinRewriteSpec against the brute-force join). A silent
  * result-changing rewrite must never be default Spark behavior, so the
  * rule only fires when the session opts in:
  *
  * {{{ spark.conf.set(LshJoinRewrite.EnabledKey, "true") }}}
  *
  * Install via `SparkSessionExtensions` ([[graft.functions.GraftExtensions]]
  * injects it) or on a live session with
  * `spark.experimental.extraOptimizations ++= Seq(LshJoinRewrite)`.
  *
  * Scale story: at 100 TB the naive join is not slow, it is IMPOSSIBLE
  * (10^9 × 10^9 cosine evaluations); the rewritten plan shuffles each side
  * once on an 8-byte bucket key and evaluates cosine only inside cells.
  * The rule deliberately does NOT cap bucket sizes (it must stay a pure
  * candidate-prune so the surviving semantics are exactly "same cell AND
  * >= tau"); skew hygiene for pathological cells stays with AQE skew-join
  * handling or the declared capped operators.
  */
object LshJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.lsh.joinRewrite"
  private val BucketName = "__graft_lsh_bucket"

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "false").toBoolean

  private def bucketExpr(emb: Expression): Expression =
    graft.ops.LlmOps.NeardupPlanes.zipWithIndex.map { case (plane, p) =>
      If(
        GreaterThan(
          graft.functions.VectorDot(emb,
            Literal.create(plane, ArrayType(DoubleType))),
          Literal(0.0)),
        Literal(1L << p), Literal(0L))
    }.reduce[Expression]((a, b) => Add(a, b))

  private def alreadyBucketed(p: LogicalPlan): Boolean = p match {
    case Project(list, _) => list.exists(_.name == BucketName)
    case _ => false
  }

  /** The cosine-threshold conjunct of a join condition. */
  private def cosineConjunct(cond: Expression): Option[CosineSimilarity] =
    splitConjunctivePredicates(cond).collectFirst {
      case GreaterThanOrEqual(c: CosineSimilarity, Literal(_, DoubleType)) => c
      case GreaterThan(c: CosineSimilarity, Literal(_, DoubleType)) => c
      case LessThanOrEqual(Literal(_, DoubleType), c: CosineSimilarity) => c
      case LessThan(Literal(_, DoubleType), c: CosineSimilarity) => c
    }

  /** True if the condition already carries a cross-side equality conjunct —
    * such a join plans as a hash/sort-merge join on that key (e.g. a
    * hand-written banded-LSH pipeline with its own recall guarantee), and
    * adding our bucket equality would silently TIGHTEN its results. The
    * rule only rescues joins that would otherwise be nested-loop. */
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
        cosineConjunct(cond).flatMap { cos =>
          // one argument must be computable from each side
          val sides = Seq(cos.left, cos.right).map { e =>
            if (e.references.subsetOf(left.outputSet)) Some("l")
            else if (e.references.subsetOf(right.outputSet)) Some("r")
            else None
          }
          (sides, Seq(cos.left, cos.right)) match {
            case (Seq(Some("l"), Some("r")), Seq(le, re)) => Some((le, re))
            case (Seq(Some("r"), Some("l")), Seq(re, le)) => Some((le, re))
            case _ => None
          }
        } match {
          case Some((lEmb, rEmb)) =>
            val al = Alias(bucketExpr(lEmb), BucketName)()
            val ar = Alias(bucketExpr(rEmb), BucketName)()
            val newJoin = Join(
              Project(left.output :+ al, left),
              Project(right.output :+ ar, right),
              j.joinType,
              Some(And(EqualTo(al.toAttribute, ar.toAttribute), cond)),
              hint)
            Project(j.output, newJoin)
          case None => j
        }
    }
  }
}
