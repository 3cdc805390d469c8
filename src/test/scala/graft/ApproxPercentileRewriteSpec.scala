package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.ApproxPercentileRewrite

/** The opt-in percentile → GK-sketch rewrite: off means the exact
  * buffering aggregate untouched; on means the bounded sketch plan with
  * the documented rank-error dial — the ApproxDistinctRewrite
  * opt-in/exact-contract discipline for the order-statistic aggregate. */
class ApproxPercentileRewriteSpec extends SparkTestBase {

  private def install(): Unit = Pipelines.installApproxPercentile(spark)

  private def grouped(): DataFrame =
    ops.table(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5D)").as("p50"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  private lazy val exact: Map[String, Double] = {
    install()
    spark.conf.set(ApproxPercentileRewrite.EnabledKey, "false")
    grouped().collect().map(r => (r.getString(0), r.getDouble(1))).toMap
  }

  test("disabled by default: the exact percentile plan and values") {
    install()
    spark.conf.set(ApproxPercentileRewrite.EnabledKey, "false")
    val df = grouped()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("percentile_approx"),
      s"no sketch may appear without the opt-in:\n$plan")
    // independent ground truth: interpolated median over collected values
    ops.table(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0)).foreach { case (flag, rows) =>
        val v = rows.map(_.getDouble(1)).sorted
        val pos = 0.5 * (v.length - 1)
        val lo = v(pos.toInt)
        val hi = v(math.min(pos.toInt + 1, v.length - 1))
        val want = lo + (pos - pos.toInt) * (hi - lo)
        assert(math.abs(exact(flag) - want) < 1e-6, s"group $flag")
      }
  }

  test("enabled: GK plan, estimate within rank epsilon; schema type preserved") {
    install()
    spark.conf.set(ApproxPercentileRewrite.EnabledKey, "true")
    try {
      val df = grouped()
      // the Cast wrap keeps the output type the exact aggregate had
      assert(df.schema("p50").dataType ==
        org.apache.spark.sql.types.DoubleType)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("percentile_approx"),
        s"opt-in must produce the sketch plan:\n$plan")
      val got = df.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val li = ops.table(spark, sfDir, "lineitem")
        .select("l_returnflag", "l_extendedprice").cache()
      try got.foreach { case (flag, est) =>
        val grp = li.where(col("l_returnflag") === flag)
        val n = grp.count().toDouble
        val lt = grp.where(col("l_extendedprice") < est).count()
        val le = grp.where(col("l_extendedprice") <= est).count()
        // default accuracy 10000 → rank ε = 1e-4; allow 10× slack for
        // the small fixture's discreteness
        assert(lt <= n * 0.501 && le >= n * 0.499,
          s"group $flag: est=$est rank [$lt,$le] of n=$n")
      } finally li.unpersist()
    } finally spark.conf.set(ApproxPercentileRewrite.EnabledKey, "false")
  }

  test("weighted percentile and DISTINCT stay exact (scope guard)") {
    install()
    spark.conf.set(ApproxPercentileRewrite.EnabledKey, "true")
    try {
      val w = ops.table(spark, sfDir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.5D, CAST(l_quantity AS INT))").as("wp"))
      assert(!w.queryExecution.executedPlan.toString.contains("percentile_approx"),
        "weighted percentile must not rewrite")
    } finally spark.conf.set(ApproxPercentileRewrite.EnabledKey, "false")
  }
}
