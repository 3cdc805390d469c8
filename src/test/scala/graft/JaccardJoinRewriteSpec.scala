package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, ReplayableHash}
import graft.plans.JaccardJoinRewrite

/** The opt-in Jaccard join rewrite must (a) leave plans untouched by
  * default, (b) replace the nested-loop similarity join with a MinHash
  * bucket equi-join when enabled, and (c) produce EXACTLY the same-bucket
  * subset of the brute-force result — verified against a driver-side
  * replay of the same digests/buckets on the sf0.001 documents (the
  * LshJoinRewriteSpec pattern for the second similarity).
  */
class JaccardJoinRewriteSpec extends SparkTestBase {

  private val Tau = 0.3

  private def installRule(): Unit = Pipelines.installJaccardJoinRewrite(spark)

  /** Per-doc distinct token-digest arrays (the rule-5b digest form a
    * Jaccard pipeline would carry): whitespace tokens → shingle_key. */
  private def tokenSets(): DataFrame = {
    GraftFunctions.register(spark)
    ops.table(spark, sfDir, "documents")
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
      .select(col("doc_id"), call_function("shingle_key", col("tok")).as("key"))
      .groupBy("doc_id")
      .agg(array_sort(collect_set(col("key"))).as("toks"))
  }

  private def bruteForceJoin(): DataFrame = {
    val t = tokenSets()
    val a = t.select(col("doc_id").as("id_a"), col("toks").as("toks_a"))
    val b = t.select(col("doc_id").as("id_b"), col("toks").as("toks_b"))
    a.join(b,
        call_function("jaccard_sim", col("toks_a"), col("toks_b")) >= lit(Tau)
          && col("id_a") < col("id_b"))
      .select("id_a", "id_b")
  }

  // driver-side ground truth over the COLLECTED digest arrays (no
  // re-derivation of the hashing — the arrays ARE the substrate)
  private lazy val sets: Array[(Long, Set[Long])] =
    tokenSets().collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSet))
      .sortBy(_._1)

  private def jac(a: Set[Long], b: Set[Long]): Double = {
    val inter = (a & b).size
    val union = a.size + b.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  private def bucketOf(s: Set[Long]): Long = {
    val p = ReplayableHash.P
    val (ma, mb) = ReplayableHash.MinHashParams.head
    if (s.isEmpty) -1L else s.iterator.map(x => (ma * (x % p) + mb) % p).min
  }

  private lazy val bruteTruth: Set[(Long, Long)] = (for {
    i <- sets.indices; j <- (i + 1) until sets.length
    if jac(sets(i)._2, sets(j)._2) >= Tau
  } yield (sets(i)._1, sets(j)._1)).toSet

  test("disabled by default: the naive Jaccard join stays naive and exact") {
    val df = bruteForceJoin()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected a nested-loop shape, got:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == bruteTruth)
    assert(bruteTruth.nonEmpty, "fixture must contain Jaccard near-dups at tau")
  }

  test("enabled: MinHash bucket equi-join plan, exactly the same-bucket subset") {
    installRule()
    spark.conf.set(JaccardJoinRewrite.EnabledKey, "true")
    try {
      val df = bruteForceJoin()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct")
        && !plan.contains("BroadcastNestedLoopJoin"),
        s"nested-loop survived the rewrite:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
        || plan.contains("BroadcastHashJoin"),
        s"no equi-join in rewritten plan:\n$plan")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val buckets = sets.map { case (id, s) => id -> bucketOf(s) }.toMap
      val expected = bruteTruth.filter { case (a, b) => buckets(a) == buckets(b) }
      assert(got == expected, "rewritten result is not the exact same-bucket subset")
      assert(got.subsetOf(bruteTruth))
      info(f"MinHash-join recall vs brute force: ${got.size.toDouble / bruteTruth.size}%.3f "
        + s"(${got.size}/${bruteTruth.size} pairs)")
      // the single-hash MinHash property: a pair at J >= tau survives
      // with probability >= tau — on the templated fixture the realized
      // recall sits well above the naive floor; pin a conservative one
      assert(got.size.toDouble / bruteTruth.size >= 0.2,
        "recall collapsed below the single-probe floor")
    } finally spark.conf.set(JaccardJoinRewrite.EnabledKey, "false")
  }

  // driver-side banded replay: 16-member minima, paired 2-per-band —
  // the exact JaccardKernel.minHashBands arithmetic
  private def bandsOf(s: Set[Long]): Array[Long] = {
    val p = ReplayableHash.P
    if (s.isEmpty) return Array.fill(8)(-1L)
    val mins = ReplayableHash.MinHashParams.take(16).map { case (a, b) =>
      s.iterator.map(x => (a * (x % p) + b) % p).min
    }
    Array.tabulate(8)(b => mins(2 * b) * p + mins(2 * b + 1))
  }

  test("banded mode: 8-band equi-join, exactly the shares-a-band subset, no duplicates") {
    installRule()
    spark.conf.set(JaccardJoinRewrite.EnabledKey, "true")
    spark.conf.set(JaccardJoinRewrite.BandsKey, "true")
    try {
      val df = bruteForceJoin()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct")
        && !plan.contains("BroadcastNestedLoopJoin"),
        s"nested-loop survived the banded rewrite:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
        || plan.contains("BroadcastHashJoin"),
        s"no equi-join in banded plan:\n$plan")
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      val got = rows.toSet
      assert(rows.length == got.size,
        "first-match residual must keep each pair exactly once")
      val bands = sets.map { case (id, s) => id -> bandsOf(s) }.toMap
      val expected = bruteTruth.filter { case (a, b) =>
        bands(a).zip(bands(b)).exists { case (x, y) => x != -1L && x == y }
      }
      assert(got == expected, "banded result is not the exact shares-a-band subset")
      assert(got.subsetOf(bruteTruth))
      // single-hash recall for comparison: same-bucket pairs
      val buckets = sets.map { case (id, s) => id -> bucketOf(s) }.toMap
      val single = bruteTruth.count { case (a, b) => buckets(a) == buckets(b) }
      info(f"banded recall ${got.size.toDouble / bruteTruth.size}%.3f " +
        f"(${got.size}/${bruteTruth.size}) vs single-hash ${single.toDouble / bruteTruth.size}%.3f")
      // banding must dominate the single-hash prune: every same-bucket
      // pair shares band 0's first row... not literally, so pin the FLOOR:
      // recall >= the single-hash realized recall on this fixture
      assert(got.size >= single,
        "banded recall fell below the single-hash floor")
      // r15 (verdict item 7): pin the ABSOLUTE banded floor the way
      // semdedup's 0.15/0.2 floors are pinned — r14 measured 0.92 vs
      // single-hash 0.62 at tau 0.3 on this fixture; 0.85 leaves the
      // documented margin. The exact jaccard_sim >= tau residual is
      // already re-applied (got ⊆ bruteTruth above), so this is realized
      // end-to-end recall, not the banding theory bound.
      assert(got.size.toDouble / bruteTruth.size >= 0.85,
        "banded recall fell below the pinned 0.85 fixture floor")
    } finally {
      spark.conf.set(JaccardJoinRewrite.EnabledKey, "false")
      spark.conf.set(JaccardJoinRewrite.BandsKey, "false")
    }
  }

  test("a degenerate threshold (tau = 0) is left un-rewritten") {
    installRule()
    spark.conf.set(JaccardJoinRewrite.EnabledKey, "true")
    try {
      val t = tokenSets()
      val a = t.select(col("doc_id").as("id_a"), col("toks").as("toks_a"))
      val b = t.select(col("doc_id").as("id_b"), col("toks").as("toks_b"))
      val df = a.join(b,
          call_function("jaccard_sim", col("toks_a"), col("toks_b")) >= lit(0.0)
            && col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      // jaccard_sim >= 0.0 is a tautology — bucketing it would collapse
      // the full cross result to same-bucket-only (r13 advisor note)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_minhash_bucket"),
        s"rule must not rewrite a tau <= 0 tautology:\n$plan")
    } finally spark.conf.set(JaccardJoinRewrite.EnabledKey, "false")
  }

  test("a join that already has an equi key is left alone") {
    installRule()
    spark.conf.set(JaccardJoinRewrite.EnabledKey, "true")
    try {
      val t = tokenSets().withColumn("grp", col("doc_id") % 7)
      val a = t.select(col("doc_id").as("id_a"), col("grp").as("g_a"),
        col("toks").as("toks_a"))
      val b = t.select(col("doc_id").as("id_b"), col("grp").as("g_b"),
        col("toks").as("toks_b"))
      val df = a.join(b,
          col("g_a") === col("g_b")
            && call_function("jaccard_sim", col("toks_a"), col("toks_b")) >= lit(Tau)
            && col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_minhash_bucket"),
        s"rule must not tighten a join that already hash-joins:\n$plan")
    } finally spark.conf.set(JaccardJoinRewrite.EnabledKey, "false")
  }
}
