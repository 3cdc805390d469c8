package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.ApproxDistinctRewrite

/** The opt-in count(DISTINCT) → HLL++ rewrite: off means EXACT and
  * untouched; on means the sketch plan with the documented error dial —
  * the LshJoinRewrite opt-in/exact-contract discipline for the second
  * approximate rule. */
class ApproxDistinctRewriteSpec extends SparkTestBase {

  private def install(): Unit = Pipelines.installApproxDistinct(spark)

  private def grouped(): DataFrame =
    ops.table(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("u"),
        count(lit(1)).as("n"))

  private def global(): DataFrame =
    ops.table(spark, sfDir, "events")
      .agg(count_distinct(col("user_id")).as("u"))

  private lazy val exactGrouped: Map[String, Long] = {
    install()
    spark.conf.set(ApproxDistinctRewrite.EnabledKey, "false")
    grouped().collect().map(r => (r.getString(0), r.getLong(1))).toMap
  }

  test("disabled by default: the exact expanded-distinct plan, exact counts") {
    install()
    spark.conf.set(ApproxDistinctRewrite.EnabledKey, "false")
    val df = grouped()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("approx_count_distinct"),
      s"no sketch may appear without the opt-in:\n$plan")
    // independent ground truth
    val truth = ops.table(spark, sfDir, "events")
      .select("event_type", "user_id").distinct()
      .groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(exactGrouped == truth)
  }

  test("enabled: HLL++ plan; estimates inside 3×rsd; count(x) stays exact") {
    install()
    spark.conf.set(ApproxDistinctRewrite.EnabledKey, "true")
    try {
      val df = grouped()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("approx_count_distinct"),
        s"opt-in must produce the sketch plan:\n$plan")
      assert(!plan.contains("count(distinct"),
        s"the expanded exact distinct must be gone:\n$plan")
      val got = df.collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got.keySet == exactGrouped.keySet)
      val exactRows = ops.table(spark, sfDir, "events")
        .groupBy("event_type").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      got.foreach { case (t, (est, n)) =>
        val exact = exactGrouped(t)
        // the q_agg_approx_distinct bound: 3× the default 5% rsd
        assert(math.abs(est - exact) <= math.max(3, 0.15 * exact),
          s"$t: estimate $est vs exact $exact")
        // the plain count(*) in the SAME aggregate is untouched and exact
        assert(n == exactRows(t), s"$t: count(*) must stay exact")
      }
      // global (no grouping) path rewrites too
      val g = global()
      assert(g.queryExecution.executedPlan.toString
        .contains("approx_count_distinct"))
      val gu = g.collect().head.getLong(0)
      val gx = ops.table(spark, sfDir, "events")
        .select("user_id").distinct().count()
      assert(math.abs(gu - gx) <= math.max(3, 0.15 * gx))
    } finally spark.conf.set(ApproxDistinctRewrite.EnabledKey, "false")
  }

  test("tighter rsd dial narrows the sketch error bound") {
    install()
    spark.conf.set(ApproxDistinctRewrite.EnabledKey, "true")
    spark.conf.set(ApproxDistinctRewrite.RsdKey, "0.01")
    try {
      val got = grouped().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      got.foreach { case (t, est) =>
        val exact = exactGrouped(t)
        assert(math.abs(est - exact) <= math.max(3, 0.03 * exact),
          s"$t at rsd 0.01: estimate $est vs exact $exact")
      }
    } finally {
      spark.conf.set(ApproxDistinctRewrite.EnabledKey, "false")
      spark.conf.unset(ApproxDistinctRewrite.RsdKey)
    }
  }
}
