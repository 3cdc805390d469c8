package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-string queries (SURVEY §2B, round 10) — the [[graft.GraftSql]]
  * entry point exercised as declared inventory. Each key here holds ONE
  * ANSI SQL string that is executed VERBATIM by both engines: the engine
  * side runs it through `GraftSql.run` (temp views + Spark's parser), and
  * [[oracle]] returns the very same string to DuckDB — so the declared
  * contract is "identical SQL text, identical results, two engines", the
  * strongest possible form of the oracle discipline (the twins CANNOT
  * drift because there is only one string).
  *
  * Dialect constraints that make verbatim sharing possible: ANSI joins,
  * `DATE '…'` literals compared through `CAST(ts AS DATE)` (both engines
  * cast TIMESTAMP→DATE by dropping time-of-day), the repo's §7.4 money
  * discipline (`CAST(sum(CAST(expr AS DECIMAL(18,4))) AS DOUBLE)`), and a
  * total ORDER BY with a unique tie-break.
  *
  * Scale shape: these are Catalyst plans like any DSL query — the
  * region/nation dimensions broadcast (parquet stats are known), the
  * fact-fact joins shuffle on their keys, filters reach the scans. The
  * SQL surface adds zero execution machinery.
  */
object SqlOps extends QueryModule {

  /** TPC-H Q3 analog ("shipping priority"): unshipped-revenue top-10 for
    * one market segment at a cut date mid-span of the fixture's 1995–2001
    * order window. customer⋈orders⋈lineitem with both date filters pushed
    * to the scans; revenue per the exact-DECIMAL-surfaced-as-DOUBLE rule. */
  private val shippingPrioritySql =
    """SELECT l_orderkey,
      |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND CAST(o_orderdate AS DATE) < DATE '1998-06-01'
      |  AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
      |GROUP BY l_orderkey, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5 analog ("local-supplier volume"): revenue by nation for one
    * region-year where customer and supplier share the nation — the
    * 6-way join exercising the planner's dimension-broadcast + fact-fact
    * shuffle decisions from SQL text. */
  private val revenueByNationSql =
    """SELECT n_name,
      |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q4 analog ("order priority checking", r11): correlated EXISTS
    * from SQL text — orders in one fixture year having at least one
    * RETURNED lineitem (the fixture has no commit/receipt dates, so the
    * Q4 lateness predicate becomes a returnflag test). Spark plans the
    * EXISTS as a left-semi hash join on l_orderkey (shuffle-keyed, no
    * per-row subquery execution) — the subquery machinery the round-10
    * entry point never exercised. */
  private val orderPrioritySql =
    """SELECT o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** CTE + window analog (r11): each customer's single top-revenue order
    * (row_number over the HIGH-cardinality o_custkey partition — the
    * bucketed-rank rule is about low-cardinality partitions; per-customer
    * groups are bounded by that customer's order count), rolled up by
    * priority. Money stays DECIMAL through BOTH aggregation levels (an
    * outer sum over DOUBLE partials would be FP-order-dependent — §7.4)
    * and surfaces as DOUBLE only in the final projection. */
  private val topOrderPerCustomerSql =
    """WITH order_rev AS (
      |  SELECT o_custkey, o_orderkey, o_orderpriority,
      |         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS revenue
      |  FROM orders
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  GROUP BY o_custkey, o_orderkey, o_orderpriority),
      |ranked AS (
      |  SELECT o_custkey, o_orderpriority, revenue,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY revenue DESC, o_orderkey) AS rk
      |  FROM order_rev)
      |SELECT o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n_customers,
      |       CAST(sum(revenue) AS DOUBLE) AS top_order_revenue
      |FROM ranked
      |WHERE rk = 1
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  def queries: Seq[(String, Q)] = Seq(
    "q_sql_shipping_priority" -> ((s: SparkSession, dir: String) =>
      graft.GraftSql.run(s, dir, shippingPrioritySql)),

    "q_sql_revenue_by_nation" -> ((s: SparkSession, dir: String) =>
      graft.GraftSql.run(s, dir, revenueByNationSql)),

    "q_sql_order_priority" -> ((s: SparkSession, dir: String) =>
      graft.GraftSql.run(s, dir, orderPrioritySql)),

    "q_sql_top_order_per_cust" -> ((s: SparkSession, dir: String) =>
      graft.GraftSql.run(s, dir, topOrderPerCustomerSql))
  )

  def oracle: Seq[(String, String)] = Seq(
    "q_sql_shipping_priority" -> shippingPrioritySql,
    "q_sql_revenue_by_nation" -> revenueByNationSql,
    "q_sql_order_priority" -> orderPrioritySql,
    "q_sql_top_order_per_cust" -> topOrderPerCustomerSql
  )
}
