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
    assert(q.size >= 60, s"inventory shrank: ${q.size}")
    assert(o.size >= 50, s"oracled set shrank: ${o.size}")
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

  test("FP-sensitive aggregates are run-to-run deterministic") {
    for (name <- Seq("q_agg_basic", "q_join_multiway", "q_udaf_weighted", "q_win_moving")) {
      val a = SparkEntry.queries(name)(spark, sfDir).collect().toSeq
      val b = SparkEntry.queries(name)(spark, sfDir).collect().toSeq
      assert(a == b, s"$name not deterministic")
    }
  }
}
