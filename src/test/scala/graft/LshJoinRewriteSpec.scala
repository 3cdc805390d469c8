package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.plans.LshJoinRewrite

/** The opt-in LSH join rewrite must (a) leave plans untouched by default,
  * (b) replace the nested-loop/cartesian similarity join with a bucket
  * equi-join when enabled, and (c) produce EXACTLY the same-cell subset of
  * the brute-force result — verified against a driver-side replay of the
  * same planes/cosines on the sf0.001 embeddings.
  */
class LshJoinRewriteSpec extends SparkTestBase {

  private val Tau = 0.4

  private def installRule(): Unit = Pipelines.installLshJoinRewrite(spark)

  private def bruteForceJoin(): DataFrame = {
    GraftFunctions.register(spark)
    val e = ops.AnnOps.embDouble(spark, sfDir)
    val a = e.select(col("vec_id").as("id_a"), col("emb").as("emb_a"))
    val b = e.select(col("vec_id").as("id_b"), col("emb").as("emb_b"))
    a.join(b,
        call_function("cosine_sim", col("emb_a"), col("emb_b")) >= lit(Tau)
          && col("id_a") < col("id_b"))
      .select("id_a", "id_b")
  }

  // driver-side ground truth: cosines with the expressions' index-order
  // IEEE accumulation, buckets with the engine's plane family
  private lazy val embs: Array[(Long, Array[Double])] =
    spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)

  private def cos(x: Array[Double], y: Array[Double]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < math.min(x.length, y.length)) {
      dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  private def bucketOf(x: Array[Double]): Long =
    ops.AnnOps.NeardupPlanes.zipWithIndex.map { case (plane, p) =>
      var d = 0.0
      var i = 0
      while (i < math.min(x.length, plane.length)) { d += x(i) * plane(i); i += 1 }
      if (d > 0) 1L << p else 0L
    }.sum

  private lazy val bruteTruth: Set[(Long, Long)] = (for {
    i <- embs.indices; j <- (i + 1) until embs.length
    if cos(embs(i)._2, embs(j)._2) >= Tau
  } yield (embs(i)._1, embs(j)._1)).toSet

  test("disabled by default: the naive similarity join stays naive and exact") {
    val df = bruteForceJoin()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected a nested-loop shape, got:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == bruteTruth)
    assert(bruteTruth.nonEmpty)
  }

  test("enabled: bucket equi-join plan, exactly the same-cell subset") {
    installRule()
    spark.conf.set(LshJoinRewrite.EnabledKey, "true")
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
      val cells = embs.map { case (id, x) => id -> bucketOf(x) }.toMap
      val expected = bruteTruth.filter { case (a, b) => cells(a) == cells(b) }
      assert(got == expected, "rewritten result is not the exact same-cell subset")
      // the prune is sound (subset) and the recall is what the cells imply
      assert(got.subsetOf(bruteTruth))
      info(f"LSH-join recall vs brute force: ${got.size.toDouble / bruteTruth.size}%.3f "
        + s"(${got.size}/${bruteTruth.size} pairs)")
    } finally spark.conf.set(LshJoinRewrite.EnabledKey, "false")
  }

  /** Probe set replay: exact cell + weakest-plane-flipped cell, ties to
    * the lowest plane index (the q_llm_emb_semdedup_mp recipe). */
  private def probeSetOf(x: Array[Double]): Set[Long] = {
    val dots = ops.AnnOps.NeardupPlanes.map { plane =>
      var d = 0.0
      var i = 0
      while (i < math.min(x.length, plane.length)) { d += x(i) * plane(i); i += 1 }
      d
    }
    val b = dots.zipWithIndex.map { case (d, p) => if (d > 0) 1L << p else 0L }.sum
    val minAbs = dots.map(math.abs).min
    val weakest = dots.indexWhere(d => math.abs(d) == minAbs)
    Set(b, b ^ (1L << weakest))
  }

  test("multi-probe: fan-out plan, exact probe-set subset, no duplicates, better recall") {
    installRule()
    spark.conf.set(LshJoinRewrite.EnabledKey, "true")
    try {
      // single-probe baseline for the monotonicity claim
      val single = bruteForceJoin().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.conf.set(LshJoinRewrite.MultiProbeKey, "true")
      val df = bruteForceJoin()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Generate"), s"no fan-out in multi-probe plan:\n$plan")
      assert(!plan.contains("CartesianProduct")
        && !plan.contains("BroadcastNestedLoopJoin"))
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows.size == rows.toSet.size, "multi-probe emitted duplicate pairs")
      val got = rows.toSet
      // exact semantics: right cell ∈ left's probe set, then the verifier
      val cells = embs.map { case (id, x) => id -> bucketOf(x) }.toMap
      val probes = embs.map { case (id, x) => id -> probeSetOf(x) }.toMap
      val expected = bruteTruth.filter { case (a, b) => probes(a)(cells(b)) }
      assert(got == expected, "multi-probe result is not the exact probe-set subset")
      assert(single.subsetOf(got), "multi-probe recall regressed below single-probe")
      assert(got.subsetOf(bruteTruth))
      info(f"multi-probe recall: ${got.size.toDouble / bruteTruth.size}%.3f vs "
        + f"single ${single.size.toDouble / bruteTruth.size}%.3f "
        + s"(${got.size} vs ${single.size} of ${bruteTruth.size} pairs)")
    } finally {
      spark.conf.set(LshJoinRewrite.EnabledKey, "false")
      spark.conf.set(LshJoinRewrite.MultiProbeKey, "false")
    }
  }
}
