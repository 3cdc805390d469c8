package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared inventory (SURVEY §2B) is assembled from the per-family
  * modules under graft.ops; each oracled key has a DuckDB-runnable ANSI-SQL
  * twin in [[oracleSql]] with identical column names, total ORDER BY, and
  * the §7.4 FP/typing discipline.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    SourceSinkOps, RelationalOps, JoinOps, AggOps, WindowOps,
    ScalarFnOps, StreamAnalogOps, UdxOps, LlmOps, TextOps, CurationOps, VocabOps,
    AnalyticsOps, MixOps, ProfileOps, TsOps, GraphOps, GraphPathOps, SqlOps, AnnOps,
    graft.multimodal.MultimodalOps)

  /** Flagship query (SURVEY §7.2): the full reference-pipeline analog
    * (dedup → frame → batchify → windowed delivery stats) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    StreamAnalogOps.deliveryReport(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
