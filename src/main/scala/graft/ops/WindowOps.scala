package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic window family (SURVEY §2B "Window functions"). Partition keys
  * (mktsegment / user_id / custkey) keep the state per-group — at 100 TB
  * these shuffle once on the partition key and stream within each group,
  * with no global ordering anywhere. The mktsegment family (5-value key —
  * the low-cardinality-window scale-killer) ranks through the two-level
  * bucketed shape ([[segRanks]]) instead of per-segment single-task sorts.
  */
object WindowOps extends QueryModule {

  /** Segment-partitioned analytic ranks WITHOUT a per-segment single-task
    * sort. `Window.partitionBy(c_mktsegment)` funnels N/5 of the table
    * through one sort task — the round-3 q_stream_late scale-killer, which
    * this family previously still exhibited. Two-level shape (the
    * `ops.globalRowNumber` generalization to partitioned windows): rows
    * bucket by the exact scaled balance (2-dec money → `round(×100)` is an
    * exact long; negated so descending balance maps to ascending buckets),
    * local row_number/rank/dense_rank run per (segment, bucket), and
    * cross-bucket offsets (row count, distinct-value count) come from a
    * window over the per-(segment, bucket) summary — rows = #occupied
    * buckets, bounded by the VALUE RANGE / 4096 per segment, independent of
    * table size, hence always broadcastable. A tie group (equal balance)
    * maps to one bucket by construction, so local rank + count offset and
    * local dense_rank + distinct offset are exact.
    *
    * Returns the input columns plus `rn` (unique order: balance desc,
    * custkey asc), `rk`/`drk` (ties on balance), `n_seg` (segment size).
    */
  private def segRanks(customer: DataFrame): DataFrame = {
    val bucketSize = 4096L
    val withB = customer
      .withColumn("_sr_key", round(-col("c_acctbal") * 100).cast("long"))
      .withColumn("_sr_bucket", expr(s"_sr_key div $bucketSize"))
    val wLocalU = Window.partitionBy("c_mktsegment", "_sr_bucket")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    val wLocalT = Window.partitionBy("c_mktsegment", "_sr_bucket")
      .orderBy(desc("c_acctbal"))
    val wOff = Window.partitionBy("c_mktsegment").orderBy("_sr_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wSeg = Window.partitionBy("c_mktsegment")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = withB.groupBy("c_mktsegment", "_sr_bucket")
      .agg(count(lit(1)).as("_sr_cnt"), count_distinct(col("_sr_key")).as("_sr_dcnt"))
      .withColumn("_sr_off", coalesce(sum("_sr_cnt").over(wOff), lit(0L)))
      .withColumn("_sr_doff", coalesce(sum("_sr_dcnt").over(wOff), lit(0L)))
      .withColumn("_sr_n", sum("_sr_cnt").over(wSeg))
      .select("c_mktsegment", "_sr_bucket", "_sr_off", "_sr_doff", "_sr_n")
    withB
      .withColumn("_sr_rn", row_number().over(wLocalU))
      .withColumn("_sr_rk", rank().over(wLocalT))
      .withColumn("_sr_drk", dense_rank().over(wLocalT))
      .join(broadcast(offs), Seq("c_mktsegment", "_sr_bucket"))
      .withColumn("rn", (col("_sr_rn") + col("_sr_off")).cast("long"))
      .withColumn("rk", (col("_sr_rk") + col("_sr_off")).cast("long"))
      .withColumn("drk", (col("_sr_drk") + col("_sr_doff")).cast("long"))
      .withColumn("n_seg", col("_sr_n").cast("long"))
      .drop("_sr_key", "_sr_bucket", "_sr_rn", "_sr_rk", "_sr_drk",
        "_sr_off", "_sr_doff", "_sr_n")
  }

  /** ntile(k) from a unique 1-based rank column and the partition-size
    * column — the standard definition both engines share: the first
    * (n mod k) tiles get one extra row. Pure integer arithmetic (`div`),
    * bit-identical across engines. */
  private def ntileSql(rn: String, n: String, k: Int): Column = expr(
    s"""CAST(CASE WHEN $rn <= ($n % $k) * ($n div $k + 1)
       |     THEN ($rn - 1) div ($n div $k + 1) + 1
       |     ELSE ($n % $k) + ($rn - ($n % $k) * ($n div $k + 1) - 1) div ($n div $k) + 1
       |     END AS BIGINT)""".stripMargin)

  def queries: Seq[(String, Q)] = Seq(
    "q_win_rank" -> ((s: SparkSession, dir: String) =>
      segRanks(table(s, dir, "customer"))
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          col("rn"), col("rk"), col("drk"),
          ntileSql("rn", "n_seg", 4).as("quartile"))
        .orderBy("c_mktsegment", "rn")),

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

    // Quantile bucketing: ntile + row_number over a unique ordering, via
    // the bucketed two-level rank (no per-segment single-task sort; both
    // engines give the first (n mod k) tiles the extra row, and the rank is
    // unique, so tile ids match the window formulation exactly).
    "q_win_ntile" -> ((s: SparkSession, dir: String) =>
      segRanks(table(s, dir, "customer"))
        .select(col("c_custkey"), col("c_mktsegment"),
          ntileSql("rn", "n_seg", 4).as("balance_quartile"),
          col("rn").as("seg_rank"))
        .orderBy("c_mktsegment", "c_custkey")),

    // Distribution functions from the bucketed rank: the ordering is unique
    // (custkey tie-break), so rank == row_number and percent_rank/cume_dist
    // are the exact rationals (rn-1)/(n-1) and rn/n — single IEEE divisions
    // of exact longs, identical on both engines. nth_value over the
    // unbounded frame is the rank-3 custkey broadcast back per segment.
    "q_win_dist" -> ((s: SparkSession, dir: String) => {
      val ranked = segRanks(table(s, dir, "customer"))
      val third = ranked.where(col("rn") === 3)
        .select(col("c_mktsegment"), col("c_custkey").as("third_key"))
      ranked.join(broadcast(third), Seq("c_mktsegment"), "left")
        .select(col("c_custkey"), col("c_mktsegment"),
          when(col("n_seg") === 1, lit(0.0))
            .otherwise((col("rn") - 1).cast("double") / (col("n_seg") - 1))
            .as("pct_rank"),
          (col("rn").cast("double") / col("n_seg")).as("cume"),
          col("third_key"))
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
