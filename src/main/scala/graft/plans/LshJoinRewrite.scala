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
  * declared near-dup operators use, [[graft.ops.AnnOps.NeardupPlanes]]),
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

  /** Second opt-in: multi-probe. The LEFT side additionally probes the
    * neighboring cell with its weakest plane flipped (argmin |plane·x|,
    * ties to the lowest plane index — the q_llm_emb_semdedup_mp recipe),
    * so the surviving semantics widen from "same cell" to "right cell ∈
    * left's {cell, cell⊕weakest}". Still a strict subset of the brute
    * force, still duplicate-free (the right side carries ONE bucket value,
    * which can match at most one of the left's distinct probes), at 2×
    * left-side bucket rows — the recall/cost dial, measured in
    * LshJoinRewriteSpec. */
  val MultiProbeKey = "spark.graft.lsh.multiProbe"

  private val BucketName = "__graft_lsh_bucket"

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "false").toBoolean

  private def multiProbe: Boolean =
    conf.getConfString(MultiProbeKey, "false").toBoolean

  private def dotExprs(emb: Expression): Seq[Expression] =
    graft.ops.AnnOps.NeardupPlanes.map { plane =>
      graft.functions.VectorDot(emb,
        Literal.create(plane, ArrayType(DoubleType)))
    }

  private def bucketOf(dots: Seq[Expression]): Expression =
    dots.zipWithIndex.map { case (d, p) =>
      If(GreaterThan(d, Literal(0.0)), Literal(1L << p), Literal(0L))
    }.reduce[Expression]((a, b) => Add(a, b))

  private def bucketExpr(emb: Expression): Expression =
    bucketOf(dotExprs(emb))

  /** Single-bucket side: one projected `__graft_lsh_bucket` column. */
  private def bucketSide(plan: LogicalPlan, emb: Expression)
      : (LogicalPlan, Attribute) = {
    val a = Alias(bucketExpr(emb), BucketName)()
    (Project(plan.output :+ a, plan), a.toAttribute)
  }

  /** Multi-probe side: dots are materialized once in a lower projection,
    * then the row fans out (Generate/Explode) to its exact cell AND the
    * weakest-plane-flipped cell. ArrayDistinct guards the degenerate
    * mask-0 case so the fan-out can never emit the same bucket twice
    * (which would duplicate result pairs). The dot columns are pruned
    * before the join so the shuffle carries only the 8-byte bucket. */
  private def probeSide(plan: LogicalPlan, emb: Expression)
      : (LogicalPlan, Attribute) = {
    val dotAliases = dotExprs(emb).zipWithIndex.map { case (d, p) =>
      Alias(d, s"__graft_lsh_d$p")()
    }
    val withDots = Project(plan.output ++ dotAliases, plan)
    val dAttrs = dotAliases.map(_.toAttribute)
    val bucket = bucketOf(dAttrs)
    val minAbs = Least(dAttrs.map(Abs(_)))
    val mask = CaseWhen(
      dAttrs.zipWithIndex.map { case (d, p) =>
        (EqualTo(Abs(d), minAbs), Literal(1L << p)): (Expression, Expression)
      }, Some(Literal(0L)))
    val probes = ArrayDistinct(CreateArray(Seq(
      bucket, BitwiseXor(bucket, mask))))
    val genOut = AttributeReference(BucketName,
      org.apache.spark.sql.types.LongType, nullable = false)()
    val gen = org.apache.spark.sql.catalyst.plans.logical.Generate(
      Explode(probes), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(genOut), child = withDots)
    (Project(plan.output :+ genOut, gen), genOut)
  }

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
            val (newLeft, lb) =
              if (multiProbe) probeSide(left, lEmb)
              else bucketSide(left, lEmb)
            val (newRight, rb) = bucketSide(right, rEmb)
            val newJoin = Join(
              newLeft, newRight, j.joinType,
              Some(And(EqualTo(lb, rb), cond)), hint)
            Project(j.output, newJoin)
          case None => j
        }
    }
  }
}
