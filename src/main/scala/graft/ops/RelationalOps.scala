package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Projection, filtering, sorting, top-k and set operations
  * (SURVEY §2B "Projection / filter", "Sort / limit / top-k", "Set ops").
  * All pure narrow/exchange Catalyst plans; filters and projections push
  * into the parquet scan (verified via explain in BenchSpec).
  */
object RelationalOps extends QueryModule {

  def queries: Seq[(String, Q)] = Seq(
    "q_project" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        // 2-dec × (1 ± 2-dec) products are exact 4-decimals → round(·,4) is
        // exact and engine-independent (§7.4).
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
        round(col("l_extendedprice") * (lit(1) + col("l_tax")), 4).as("charged"),
        (col("l_quantity") * lit(100)).as("qty_pct"))
        // non-unique (okey, lineno): total the order over the payload
        // (the q_fn_math x10 tie lesson, r15)
        .orderBy("l_orderkey", "l_linenumber", "revenue", "charged",
          "qty_pct")),

    "q_filter_pred" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "orders")
        .where(col("o_totalprice").between(1000, 150000)
          && col("o_orderstatus").isin("F", "O")
          && col("o_orderpriority").like("%URGENT%")
          && col("o_custkey").isNotNull
          && !(col("o_orderkey") % 10 === 3))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")),

    "q_sort_multi" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(asc("o_orderpriority"), desc("o_totalprice"), asc("o_orderkey"))
        .limit(1000)),

    "q_topk" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100)),

    "q_topk_group" -> ((s: SparkSession, dir: String) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      table(s, dir, "orders")
        .withColumn("rk", asLong(row_number().over(w)))
        .where(col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rk")
    }),

    // Correlated scalar subquery (Catalyst decorrelates to an agg+join).
    "q_sub_scalar" -> ((s: SparkSession, dir: String) => {
      table(s, dir, "customer").createOrReplaceTempView("sub_customer")
      s.sql(
        """SELECT c_custkey, c_acctbal
          |FROM sub_customer c
          |WHERE c_acctbal > (
          |  SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
          |  FROM sub_customer c2
          |  WHERE c2.c_nationkey = c.c_nationkey)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Explicit nulls-ordering semantics (fixtures are null-free, so nulls
    // are minted with nullif; Spark's ASC default is NULLS FIRST, DuckDB's
    // is NULLS LAST — both sides pin NULLS FIRST explicitly).
    "q_sort_nulls" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "orders")
        .select(col("o_orderkey"),
          nullif(col("o_orderpriority"), lit("1-URGENT")).as("pri_n"))
        .orderBy(asc_nulls_first("pri_n"), asc("o_orderkey"))
        .limit(500)),

    "q_set_union" -> ((s: SparkSession, dir: String) => {
      val a = table(s, dir, "customer").where(col("c_acctbal") > 0)
        .select(col("c_custkey").as("k"))
      val b = table(s, dir, "orders").where(col("o_totalprice") > 100000)
        .select(col("o_custkey").as("k"))
      a.union(b).distinct().orderBy("k")
    }),

    "q_set_intersect" -> ((s: SparkSession, dir: String) => {
      val a = table(s, dir, "customer").where(col("c_acctbal") > 1000)
        .select(col("c_custkey").as("k"))
      val b = table(s, dir, "orders").select(col("o_custkey").as("k"))
      a.intersect(b).orderBy("k")
    }),

    "q_set_except" -> ((s: SparkSession, dir: String) => {
      val a = table(s, dir, "customer").select(col("c_custkey").as("k"))
      val b = table(s, dir, "orders").where(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("k"))
      a.except(b).orderBy("k")
    }),

    // BAG-semantics set ops (r12): INTERSECT ALL keeps min(multA, multB)
    // copies, EXCEPT ALL keeps multA − multB — the multiset semantics the
    // DISTINCT trio above cannot express (a customer with 5 qualifying
    // orders on both sides survives 5×, not once). Spark plans both as a
    // single hash aggregation over (row, side-counts) — one shuffle, no
    // join; ties in the presentation sort are between identical rows.
    "q_set_intersect_all" -> ((s: SparkSession, dir: String) => {
      val a = table(s, dir, "orders").where(col("o_totalprice") > 100000)
        .select(col("o_custkey").as("k"))
      val b = table(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("k"))
      a.intersectAll(b).orderBy("k")
    }),

    "q_set_except_all" -> ((s: SparkSession, dir: String) => {
      val a = table(s, dir, "orders").select(col("o_custkey").as("k"))
      val b = table(s, dir, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k"))
      a.exceptAll(b).orderBy("k")
    })
  )

  def oracle: Seq[(String, String)] = Seq(
    "q_project" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(l_extendedprice * (1 - l_discount), 4) AS revenue,
        |       round(l_extendedprice * (1 + l_tax), 4) AS charged,
        |       l_quantity * 100 AS qty_pct
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, charged,
        |  qty_pct""".stripMargin,

    "q_filter_pred" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_totalprice BETWEEN 1000 AND 150000
        |  AND o_orderstatus IN ('F', 'O')
        |  AND o_orderpriority LIKE '%URGENT%'
        |  AND o_custkey IS NOT NULL
        |  AND NOT (o_orderkey % 10 = 3)
        |ORDER BY o_orderkey""".stripMargin,

    "q_sort_multi" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice
        |FROM orders
        |ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
        |LIMIT 1000""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q_topk_group" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders)
        |SELECT o_custkey, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice
        |FROM r WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q_sub_scalar" ->
      """SELECT c_custkey, c_acctbal
        |FROM customer c
        |WHERE c_acctbal > (
        |  SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
        |  FROM customer c2
        |  WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_sort_nulls" ->
      """SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS pri_n
        |FROM orders
        |ORDER BY pri_n ASC NULLS FIRST, o_orderkey ASC
        |LIMIT 500""".stripMargin,

    "q_set_union" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
        |UNION
        |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
        |ORDER BY k""".stripMargin,

    "q_set_intersect" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 1000
        |INTERSECT
        |SELECT o_custkey AS k FROM orders
        |ORDER BY k""".stripMargin,

    "q_set_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
        |ORDER BY k""".stripMargin,

    "q_set_intersect_all" ->
      """SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
        |INTERSECT ALL
        |SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY k""".stripMargin,

    "q_set_except_all" ->
      """SELECT o_custkey AS k FROM orders
        |EXCEPT ALL
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY k""".stripMargin
  )
}
