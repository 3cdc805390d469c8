package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-string entry point. The engine is DataFrame-DSL first, but a user
  * migrating warehouse workloads wants to hand it a SQL STRING: `run`
  * registers every fixture table as a bare-named temp view (through
  * [[graft.ops.table]], so the nanosecond-events / TIMESTAMP_NTZ read
  * discipline holds) and executes the text with Spark's ANSI parser —
  * after which Catalyst plans it exactly like the DSL queries (same
  * pushdown, same broadcast decisions, same AQE).
  *
  * Views are (re-)registered on EVERY `run` call with that call's fixture
  * dir: registration is idempotent and repointing is what keeps
  * interleaved multi-fixture sessions (bench ×10 probes) correct. Internal
  * operators never read these bare names — every internal temp view is
  * prefixed (`rollup_cust`, `gs_lineitem`, `sub_customer`), so the two
  * namespaces cannot collide.
  */
object GraftSql {

  /** The fixture catalog (TESTDATA.md). */
  val FixtureTables: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** (Re-)register every fixture table under `dir` as a bare-named temp
    * view in `spark`'s session catalog. */
  def register(spark: SparkSession, dir: String): Unit =
    FixtureTables.foreach { t =>
      ops.table(spark, dir, t).createOrReplaceTempView(t)
    }

  /** Register `dir`'s fixture views, then execute `sql`. */
  def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    register(spark, dir)
    spark.sql(sql)
  }
}
