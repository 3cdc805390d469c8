package graft

/** Every declared SURVEY §2B query runs on sf0.001, returns rows, and keeps
  * a stable schema; every oracled key has an oracle and vice versa.
  * (Value-level correctness is the driver's DuckDB gate, replayed locally by
  * scripts/check.py — this suite is the cheap in-build regression net.)
  */
class OpsSpec extends SparkTestBase {

  test("queries and oracleSql keys are consistent") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert(q.forall(_.startsWith("q_")))
    assert(q.size >= 95, s"inventory shrank: ${q.size}")
    assert(o.size >= 82, s"oracled set shrank: ${o.size}")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs non-empty on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("partitioned sink lays out one directory per lang and prunes on read") {
    import org.apache.spark.sql.functions.col
    // the query itself writes the layout on first use
    SparkEntry.queries("q_sink_partitioned")(spark, sfDir).count()
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft-sink-part-${graft.ops.SourceSinkOps.fixtureKey(sfDir, "documents.parquet")}")
    val langDirs = path.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(langDirs.forall(_.startsWith("lang=")), langDirs.mkString(","))
    val pruned = spark.read.parquet(path.toString).where(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      "expected the lang predicate to prune partitions at the scan")
    val full = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(pruned.count() ==
      full.where(col("lang") === "en").count())
  }

  test("FP-sensitive aggregates are run-to-run deterministic") {
    for (name <- Seq("q_agg_basic", "q_join_multiway", "q_udaf_weighted", "q_win_moving")) {
      val a = SparkEntry.queries(name)(spark, sfDir).collect().toSeq
      val b = SparkEntry.queries(name)(spark, sfDir).collect().toSeq
      assert(a == b, s"$name not deterministic")
    }
  }
}
