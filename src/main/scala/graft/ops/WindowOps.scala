package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic window family (SURVEY §2B "Window functions"). Partition keys
  * (mktsegment / user_id / custkey) keep the state per-group — at 100 TB
  * these shuffle once on the partition key and stream within each group,
  * with no global ordering anywhere.
  */
object WindowOps extends QueryModule {

  def queries: Seq[(String, Q)] = Seq(
    "q_win_rank" -> ((s: SparkSession, dir: String) => {
      val wUniq = Window.partitionBy("c_mktsegment")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
      val wTies = Window.partitionBy("c_mktsegment").orderBy(desc("c_acctbal"))
      table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          asLong(row_number().over(wUniq)).as("rn"),
          asLong(rank().over(wTies)).as("rk"),
          asLong(dense_rank().over(wTies)).as("drk"),
          asLong(ntile(4).over(wUniq)).as("quartile"))
        .orderBy("c_mktsegment", "rn")
    }),

    "q_win_lag" -> ((s: SparkSession, dir: String) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      table(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"),
          (col("us") - lag(col("us"), 1).over(w)).as("gap_us"),
          (lead(col("us"), 1).over(w) - col("us")).as("next_gap_us"))
        .orderBy("user_id", "event_id")
    }),

    "q_win_running" -> ((s: SparkSession, dir: String) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          ntzMillis(col("o_orderdate")).as("order_ms"),
          sum(col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double")
            .as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q_win_moving" -> ((s: SparkSession, dir: String) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
      table(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          (sum(col("value").cast("decimal(18,4)")).over(w).cast("double")
            / count(lit(1)).over(w)).as("moving_avg"))
        .orderBy("user_id", "event_id")
    }),

    // Quantile bucketing: ntile over a unique ordering (both engines give
    // the first (n mod k) buckets the extra row, so ids match exactly).
    "q_win_ntile" -> ((s: SparkSession, dir: String) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
      table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).cast("long").as("balance_quartile"),
          asLong(row_number().over(w)).as("seg_rank"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // Distribution functions: percent_rank/cume_dist over unique ordering
    // ((rank-1)/(n-1) and rank/n of identical longs → identical doubles on
    // both engines), plus nth_value over an explicit frame.
    "q_win_dist" -> ((s: SparkSession, dir: String) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
      val wf = Window.partitionBy("c_mktsegment")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          nth_value(col("c_custkey"), 3).over(wf).as("third_key"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // RANGE frame over a numeric ordering key: trailing 30-day window.
    "q_win_range" -> ((s: SparkSession, dir: String) => {
      val w = Window.partitionBy("o_custkey").orderBy("order_ms")
        .rangeBetween(-2592000000L, 0L) // 30 days in ms
      table(s, dir, "orders")
        .withColumn("order_ms", ntzMillis(col("o_orderdate")))
        .select(col("o_custkey"), col("o_orderkey"), col("order_ms"),
          sum(col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double")
            .as("trailing_30d_total"),
          asLong(count(lit(1)).over(w)).as("trailing_30d_orders"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // first/last event per user as ONE hash aggregate (min_by/max_by over a
    // lexicographic (ts, event_id) struct) — map-side partials, no per-group
    // window sort, no distinct; replaces the unbounded-frame window + distinct
    // formulation, same result.
    "q_win_firstlast" -> ((s: SparkSession, dir: String) => {
      val ordKey = struct(col("ts"), col("event_id"))
      table(s, dir, "events")
        .groupBy("user_id")
        .agg(min_by(col("event_type"), ordKey).as("first_type"),
          max_by(col("event_type"), ordKey).as("last_type"))
        .orderBy("user_id")
    })
  )

  def oracle: Seq[(String, String)] = Seq(
    "q_win_rank" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |       CAST(row_number() OVER wu AS BIGINT) AS rn,
        |       CAST(rank() OVER wt AS BIGINT) AS rk,
        |       CAST(dense_rank() OVER wt AS BIGINT) AS drk,
        |       CAST(ntile(4) OVER wu AS BIGINT) AS quartile
        |FROM customer
        |WINDOW wu AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC),
        |       wt AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "q_win_lag" ->
      """SELECT user_id, event_id,
        |       epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
        |       lead(epoch_us(ts), 1) OVER w - epoch_us(ts) AS next_gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_win_running" ->
      """SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS order_ms,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_moving" ->
      """SELECT user_id, event_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |         / count(*) OVER w AS moving_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_win_ntile" ->
      """SELECT c_custkey, c_mktsegment,
        |       CAST(ntile(4) OVER w AS BIGINT) AS balance_quartile,
        |       CAST(row_number() OVER w AS BIGINT) AS seg_rank
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "q_win_dist" ->
      """SELECT c_custkey, c_mktsegment,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume,
        |       nth_value(c_custkey, 3) OVER wf AS third_key
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC),
        |       wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "q_win_range" ->
      """WITH o AS (SELECT *, epoch_ms(o_orderdate) AS order_ms FROM orders)
        |SELECT o_custkey, o_orderkey, order_ms,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |         AS trailing_30d_total,
        |       CAST(count(*) OVER w AS BIGINT) AS trailing_30d_orders
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY order_ms
        |             RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_win_firstlast" ->
      """SELECT DISTINCT user_id,
        |       first_value(event_type) OVER w AS first_type,
        |       last_value(event_type) OVER w AS last_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id""".stripMargin
  )
}
