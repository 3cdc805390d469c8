package graft

/** Runs [[PlanAudit]] over the full declared inventory at sf0.01 — the
  * mechanical version of the per-round "read 127 explain outputs" review.
  * The round-4 simhash_neardup pairing regression and the round-6
  * count-window-over-hot-key nits are the class of shape this catches. */
class PlanAuditSpec extends SparkTestBase {

  test("all declared query plans pass the mechanical scale audit") {
    val violations = PlanAudit.auditAll(spark, "/root/testdata/sf0.01")
    assert(violations.isEmpty,
      violations.mkString("plan audit violations:\n  ", "\n  ", ""))
  }

  // The audit must be able to FIRE — each rule proven on a deliberately
  // bad plan, so a future refactor that silently blinds a check fails here.

  private def planOf(df: org.apache.spark.sql.DataFrame) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("audit flags a single-partition shuffle over an unbounded scan") {
    val bad = planOf(ops.table(spark, sfDir, "lineitem").repartition(1))
    assert(PlanAudit.auditPlan("bad_repart", bad)
      .exists(_.contains("SinglePartition")))
    // ...but not when the input is aggregated first
    val ok = planOf(ops.table(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").count().repartition(1))
    assert(PlanAudit.auditPlan("ok_repart", ok).isEmpty)
  }

  test("audit flags a cartesian product") {
    val li = ops.table(spark, sfDir, "lineitem")
    val bad = planOf(li.as("a").crossJoin(li.as("b")))
    assert(PlanAudit.auditPlan("bad_cartesian", bad).nonEmpty)
  }

  test("audit flags a hash exchange carrying raw text (digest discipline)") {
    import org.apache.spark.sql.functions._
    val docs = ops.table(spark, sfDir, "documents")
    // the pre-round-8 q_llm_dataset_diff shape: full-outer join carrying
    // raw text through the corpus-keyed exchange
    val bad = planOf(docs.select(col("doc_id"), col("text").as("text1"))
      .join(docs.select(col("doc_id"), col("text").as("text2")),
        Seq("doc_id"), "full_outer"))
    assert(PlanAudit.auditPlan("bad_textjoin", bad)
      .exists(_.contains("raw text")))
    // ...digest payloads pass
    val ok = planOf(docs.select(col("doc_id"), sha2(col("text"), 256).as("d1"))
      .join(docs.select(col("doc_id"), sha2(col("text"), 256).as("d2")),
        Seq("doc_id"), "full_outer"))
    assert(PlanAudit.auditPlan("ok_digestjoin", ok).isEmpty)
  }

  test("audit does NOT blanket-exempt corpus-sized RDD leaves (row-count probe)") {
    // a localCheckpoint'd corpus-sized frame under a single-partition
    // shuffle must still flag — pre-round-8 the RDD leaf was blanket-bounded
    val big = ops.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber").localCheckpoint(true)
    assert(PlanAudit.auditPlan("bad_rdd_repart", planOf(big.repartition(1)))
      .exists(_.contains("SinglePartition")))
    // ...a genuinely tiny materialized leaf stays exempt
    val tiny = ops.table(spark, sfDir, "region").localCheckpoint(true)
    assert(PlanAudit.auditPlan("ok_rdd_repart", planOf(tiny.repartition(1)))
      .isEmpty)
  }

  test("audit flags a corpus-scaled window over a low-cardinality key (rule 6, r13)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    // the banned mktsegment/returnflag funnel: a rank window over corpus
    // rows partitioned by a 3-value key — grows 10x with the corpus
    def bad(dir: String) = planOf(ops.table(spark, dir, "lineitem")
      .withColumn("rn", row_number().over(
        W.partitionBy("l_returnflag").orderBy("l_extendedprice"))))
    assert(PlanAudit.auditWindowScaling("bad_lowcard_window",
        bad("/root/testdata/sf0.01"), () => bad(sfDir))
      .exists(_.contains("corpus-scaled window")),
      "rule 6 must fire on the returnflag rank window")
    // ...the SAME window over a time-span-bounded input passes with no
    // exemption: the hourly grid has identical rows at both scales
    def ok(dir: String) = planOf(
      SparkEntry.queries("q_ts_bollinger")(spark, dir))
    assert(PlanAudit.auditWindowScaling("ok_grid_window",
      ok("/root/testdata/sf0.01"), () => ok(sfDir)).isEmpty,
      "span-bounded grid windows must auto-pass the growth test")
    // ...and an aggregated (bounded) child skips the probe entirely
    def okAgg(dir: String) = planOf(ops.table(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus").count()
      .withColumn("rn", row_number().over(
        W.partitionBy("l_returnflag").orderBy("count"))))
    assert(PlanAudit.auditWindowScaling("ok_agg_window",
      okAgg("/root/testdata/sf0.01"), () => okAgg(sfDir)).isEmpty)
  }

  test("audit flags a corpus-scaled buffering aggregate over few keys (rule 7, r14)") {
    import org.apache.spark.sql.functions._
    // the r5 percentile/collect_list trap: a whole-group buffer over
    // corpus rows under a 3-value key — grows 10x with the corpus
    def bad(dir: String) = planOf(ops.table(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5D)").as("p50"),
        collect_list(col("l_orderkey")).as("keys")))
    assert(PlanAudit.auditAggBuffers("bad_buffer_agg",
        bad("/root/testdata/sf0.01"), () => bad(sfDir))
      .exists(_.contains("buffer")),
      "rule 7 must fire on the returnflag percentile/collect_list")
    // ...a global (no grouping) buffering aggregate is the same trap
    def badGlobal(dir: String) = planOf(ops.table(spark, dir, "lineitem")
      .agg(collect_set(col("l_partkey")).as("parts")))
    assert(PlanAudit.auditAggBuffers("bad_global_collect",
        badGlobal("/root/testdata/sf0.01"), () => badGlobal(sfDir))
      .nonEmpty, "rule 7 must fire on an ungrouped corpus collect_set")
    // ...the SAME collect over a high-cardinality key passes (per-group
    // buffers bounded by group size, no single-task funnel)
    def okKeys(dir: String) = planOf(ops.table(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(collect_list(col("l_linenumber")).as("lines")))
    assert(PlanAudit.auditAggBuffers("ok_highcard_collect",
      okKeys("/root/testdata/sf0.01"), () => okKeys(sfDir)).isEmpty)
    // ...and a span-bounded declared consumer (hurst's per-type window
    // collect over the hourly grid) auto-passes the growth probe
    def okGrid(dir: String) = planOf(
      SparkEntry.queries("q_ts_hurst")(spark, dir))
    assert(PlanAudit.auditAggBuffers("ok_grid_collect",
      okGrid("/root/testdata/sf0.01"), () => okGrid(sfDir)).isEmpty)
  }

  test("audit flags a corpus-quadratic pairwise fan (rule 8, r15)") {
    import org.apache.spark.sql.functions._
    // the granger/coint declared-domain worry made concrete: a self-join
    // on a 5-value category whose CARRIER table scales with the corpus —
    // output grows ~100x between scales where the corpus grows ~10x
    def bad(dir: String) = planOf {
      val c = ops.table(spark, dir, "customer")
        .select("c_custkey", "c_mktsegment")
      c.as("a").join(c.as("b"), "c_mktsegment")
    }
    assert(PlanAudit.auditPairFans("bad_pair_fan",
        bad("/root/testdata/sf0.01"), () => bad(sfDir))
      .exists(_.contains("fans quadratically")),
      "rule 8 must fire on the corpus-correlated category self-join")
    // ...the declared pairwise-grid family passes: the hourly grid's
    // type domain is fixed, so the fan is span-bounded (~1x growth)
    def okGrid(dir: String) = planOf(
      SparkEntry.queries("q_ts_coint")(spark, dir))
    assert(PlanAudit.auditPairFans("ok_grid_fan",
      okGrid("/root/testdata/sf0.01"), () => okGrid(sfDir)).isEmpty,
      "span-bounded pairwise grids must auto-pass the growth test")
    // ...and a linear (corpus-keyed lookup) join never suspects: output
    // rows cannot exceed the fact side
    def okLinear(dir: String) = planOf(ops.table(spark, dir, "lineitem")
      .join(ops.table(spark, dir, "orders"),
        expr("l_orderkey = o_orderkey")))
    assert(PlanAudit.auditPairFans("ok_linear_join",
      okLinear("/root/testdata/sf0.01"), () => okLinear(sfDir)).isEmpty)
  }

  test("audit flags a shuffled join with a constant-bounded tiny side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bad = planOf(ops.table(spark, sfDir, "lineitem")
        .join(ops.table(spark, sfDir, "nation")
          .withColumnRenamed("n_nationkey", "l_suppkey"), "l_suppkey"))
      assert(PlanAudit.auditJoinSides("bad_smj", bad)
        .exists(_.contains("broadcast it")))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
