package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY §2B "Scalar functions"). All built-in
  * codegen'd expressions — no UDFs in this module (the serializer path on
  * the reference, `Serializer.scala:24-34`, maps to the string/encode family
  * here; the UDF variant lives in UdxOps for contrast).
  */
object ScalarFnOps extends QueryModule {

  def queries: Seq[(String, Q)] = Seq(
    "q_fn_string" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        substring(col("c_name"), 1, 8).as("sub"),
        asLong(length(col("c_name"))).as("len"),
        regexp_replace(col("c_name"), "#", "-").as("repl"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        asLong(size(split(col("c_name"), "#"))).as("n_parts"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("pad"),
        trim(concat(lit("  "), col("c_name"), lit("  "))).as("trimmed"))
        .orderBy("c_custkey")),

    "q_fn_date" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "orders").select(
        col("o_orderkey"),
        asLong(year(col("o_orderdate"))).as("yr"),
        asLong(month(col("o_orderdate"))).as("mo"),
        asLong(dayofmonth(col("o_orderdate"))).as("dy"),
        ntzMillis(date_trunc("month", col("o_orderdate"))).as("month_start_ms"),
        asLong(datediff(col("o_orderdate"), lit("1995-01-01"))).as("days_since"),
        ntzMillis(col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_ms"),
        unix_seconds(col("o_orderdate").cast("timestamp")).as("epoch_s"))
        .orderBy("o_orderkey")),

    "q_fn_math" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_quantity") - 25.0), 4).as("abs_dev"),
        asLong(ceil(col("l_extendedprice") / 100.0)).as("ceil_c"),
        asLong(floor(col("l_extendedprice") / 100.0)).as("floor_c"),
        round(pow(col("l_discount") + 1.0, 2), 6).as("pow_d"),
        round(log(col("l_extendedprice")), 4).as("ln_p"),
        round(sqrt(col("l_quantity")), 4).as("sqrt_q"),
        asLong(col("l_orderkey") % 7).as("mod7"),
        asLong(signum(col("l_quantity") - 25.0)).as("sgn"))
        // (l_orderkey, l_linenumber) is NOT unique on this fixture (the
        // r14 approx_percentile note) — extend the sort over the payload
        // columns so the order is total up to fully-identical rows (the
        // x10 one-off gate caught the tie order diverging, r15)
        .orderBy("l_orderkey", "l_linenumber", "abs_dev", "ceil_c",
          "pow_d", "sgn")),

    "q_fn_case" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high").as("band"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_c"),
        col("o_orderkey").cast("string").as("key_str"),
        asLong(floor(col("o_totalprice"))).as("price_floor"))
        .orderBy("o_orderkey")),

    "q_fn_array" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "embeddings").select(
        col("vec_id"),
        asLong(size(col("embedding"))).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_v"),
        element_at(col("embedding"), 64).cast("double").as("last_v"),
        element_at(sort_array(col("embedding")), 1).cast("double").as("min_v"),
        element_at(sort_array(col("embedding")), 64).cast("double").as("max_v"),
        asLong(size(slice(col("embedding"), 5, 10))).as("slice_n"))
        .orderBy("vec_id")),

    // Map construction / inspection. The MAP itself never leaves the query
    // (key order is engine-specific) — the declared output is scalar
    // projections of it, which ARE oracle-able (round 4): n_types is the
    // key count, purchases/clicks are lookups with a 0 default.
    "q_fn_map" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n")))))
          .as("type_counts"))
        .select(col("user_id"),
          asLong(size(map_keys(col("type_counts")))).as("n_types"),
          coalesce(element_at(col("type_counts"), "purchase"), lit(0L)).as("purchases"),
          coalesce(element_at(col("type_counts"), "click"), lit(0L)).as("clicks"))
        .orderBy("user_id")),

    // Null-safe equality (<=> ≙ IS NOT DISTINCT FROM).
    // ANSI-safe try_* family (r12): Spark 4 runs ANSI mode ON, so raw
    // division-by-zero / bad casts / integer overflow THROW — try_divide,
    // try_cast and try_add are the NULL-on-error escape hatches a
    // migrated workload reaches for first. The report counts the
    // non-NULL survivors per type (counts only — no FP surface):
    // deterministic zero-denominators via user_id % 3, an alphabetic
    // string that can never cast, an id→string→id roundtrip that always
    // does, and a Long.MaxValue + {0,1} probe whose odd arm overflows.
    // The oracle replays the SEMANTICS (DuckDB TRY_CAST + CASE arms) —
    // its arithmetic never faults, the NULL contract is what's pinned.
    "q_fn_try" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "events")
        .select(col("event_type"),
          expr("try_divide(value, CAST(user_id % 3 AS DOUBLE))").as("d"),
          expr("try_cast(event_type AS BIGINT)").as("c"),
          expr("try_cast(CAST(event_id AS STRING) AS BIGINT)").as("rt"),
          expr("try_add(9223372036854775807, CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)")
            .as("a"))
        .groupBy("event_type")
        .agg(asLong(count(lit(1))).as("n"),
          asLong(count(col("d"))).as("n_div_ok"),
          asLong(count(col("c"))).as("n_cast_ok"),
          asLong(count(col("rt"))).as("n_roundtrip_ok"),
          asLong(count(col("a"))).as("n_add_ok"))
        .orderBy("event_type")),

    "q_fn_nullsafe" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "orders")
        .withColumn("pri_n", nullif(col("o_orderpriority"), lit("1-URGENT")))
        .select(col("o_orderkey"),
          col("pri_n").eqNullSafe(lit("5-LOW")).as("is_low_ns"),
          col("pri_n").eqNullSafe(lit(null).cast("string")).as("is_null_ns"),
          (col("pri_n") === lit("5-LOW")).as("is_low_plain"))
        .orderBy("o_orderkey")),

    // Struct build + field re-extraction (nested type round trip; the
    // oracle projects the equivalent flat values directly).
    "q_fn_struct" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "events")
        .withColumn("evt", struct(col("event_type").as("t"), col("value").as("v")))
        .withColumn("tagged", struct(col("evt"), col("user_id").as("uid")))
        .select(col("event_id"),
          col("tagged.evt.t").as("t"),
          col("tagged.evt.v").as("v"),
          col("tagged.uid").as("uid"))
        .orderBy("event_id")),

    "q_fn_bitwise" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "orders").select(
        col("o_orderkey"),
        (col("o_orderkey").bitwiseAND(lit(255L))).as("b_and"),
        (col("o_orderkey").bitwiseOR(lit(4096L))).as("b_or"),
        (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("b_xor"),
        shiftleft(col("o_orderkey"), 2).as("b_shl"),
        shiftright(col("o_orderkey"), 3).as("b_shr"))
        .orderBy("o_orderkey")),

    "q_fn_json" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // Regex family: extract / count / match. Patterns are kept to the
    // Java-regex ∩ RE2 common subset (literal words, [a-z]+ classes) so the
    // two engines' regex dialects agree; both count non-overlapping matches.
    "q_fn_regex" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
        regexp_count(col("text"), lit("table")).cast("long").as("n_table"),
        col("text").rlike("window").cast("long").as("has_window"))
        .orderBy("doc_id"))
  )

  def oracle: Seq[(String, String)] = Seq(
    "q_fn_map" ->
      """SELECT user_id,
        |       count(DISTINCT event_type) AS n_types,
        |       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchases,
        |       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS clicks
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_fn_string" ->
      """SELECT c_custkey,
        |       upper(c_name) AS up,
        |       lower(c_mktsegment) AS lo,
        |       substring(c_name, 1, 8) AS sub,
        |       CAST(length(c_name) AS BIGINT) AS len,
        |       replace(c_name, '#', '-') AS repl,
        |       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |       CAST(len(string_split(c_name, '#')) AS BIGINT) AS n_parts,
        |       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS pad,
        |       trim('  ' || c_name || '  ') AS trimmed
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_fn_date" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       CAST(day(o_orderdate) AS BIGINT) AS dy,
        |       epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
        |       CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
        |       epoch_ms(o_orderdate + INTERVAL 30 DAY) AS due_ms,
        |       epoch_ms(o_orderdate) // 1000 AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(abs(l_quantity - 25.0), 4) AS abs_dev,
        |       CAST(ceil(l_extendedprice / 100.0) AS BIGINT) AS ceil_c,
        |       CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS floor_c,
        |       round(power(l_discount + 1.0, 2), 6) AS pow_d,
        |       round(ln(l_extendedprice), 4) AS ln_p,
        |       round(sqrt(l_quantity), 4) AS sqrt_q,
        |       CAST(l_orderkey % 7 AS BIGINT) AS mod7,
        |       CAST(sign(l_quantity - 25.0) AS BIGINT) AS sgn
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, abs_dev, ceil_c,
        |  pow_d, sgn""".stripMargin,

    "q_fn_case" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice < 50000 THEN 'low'
        |            WHEN o_totalprice < 150000 THEN 'mid'
        |            ELSE 'high' END AS band,
        |       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_c,
        |       CAST(o_orderkey AS VARCHAR) AS key_str,
        |       CAST(floor(o_totalprice) AS BIGINT) AS price_floor
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_fn_array" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS BIGINT) AS dim,
        |       CAST(embedding[1] AS DOUBLE) AS first_v,
        |       CAST(embedding[64] AS DOUBLE) AS last_v,
        |       CAST(list_sort(embedding)[1] AS DOUBLE) AS min_v,
        |       CAST(list_sort(embedding)[64] AS DOUBLE) AS max_v,
        |       CAST(len(list_slice(embedding, 5, 14)) AS BIGINT) AS slice_n
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    // semantic replay: DuckDB TRY_CAST for the cast arms, CASE for the
    // division/overflow NULL contracts (its own arithmetic never faults)
    "q_fn_try" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN user_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_div_ok,
        |       CAST(count(TRY_CAST(event_type AS BIGINT)) AS BIGINT) AS n_cast_ok,
        |       CAST(count(TRY_CAST(CAST(event_id AS VARCHAR) AS BIGINT)) AS BIGINT) AS n_roundtrip_ok,
        |       CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_add_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_fn_nullsafe" ->
      """WITH t AS (
        |  SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS pri_n
        |  FROM orders)
        |SELECT o_orderkey,
        |       pri_n IS NOT DISTINCT FROM '5-LOW' AS is_low_ns,
        |       pri_n IS NOT DISTINCT FROM NULL AS is_null_ns,
        |       pri_n = '5-LOW' AS is_low_plain
        |FROM t ORDER BY o_orderkey""".stripMargin,

    "q_fn_struct" ->
      """WITH t AS (
        |  SELECT event_id, user_id,
        |         struct_pack(evt := struct_pack(t := event_type, v := value),
        |                     uid := user_id) AS tagged
        |  FROM events)
        |SELECT event_id,
        |       tagged.evt.t AS t, tagged.evt.v AS v, tagged.uid AS uid
        |FROM t ORDER BY event_id""".stripMargin,

    "q_fn_bitwise" ->
      """SELECT o_orderkey,
        |       o_orderkey & 255 AS b_and,
        |       o_orderkey | 4096 AS b_or,
        |       xor(o_orderkey, o_custkey) AS b_xor,
        |       o_orderkey << 2 AS b_shl,
        |       o_orderkey >> 3 AS b_shr
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_fn_json" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_fn_regex" ->
      """SELECT doc_id,
        |       regexp_extract(text, '([a-z]+)', 1) AS first_word,
        |       CAST(len(regexp_extract_all(text, 'table')) AS BIGINT) AS n_table,
        |       CAST(regexp_matches(text, 'window') AS BIGINT) AS has_window
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
