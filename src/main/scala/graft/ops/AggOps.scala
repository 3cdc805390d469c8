package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation family (SURVEY §2B "Aggregations"). Catalyst plans all of
  * these as partial (map-side) + final hash aggregates; no custom shuffle
  * management needed. Exact-decimal accumulation per §7.4.
  */
object AggOps extends QueryModule {

  def queries: Seq[(String, Q)] = Seq(
    // TPC-H Q1 shape.
    "q_agg_basic" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          // scale-6 sum: surfaced via the floor/frac split — a plain
          // DECIMAL→DOUBLE cast stops replaying once the unscaled sum
          // passes 2^53 (DuckDB converts the int128 limbs separately;
          // caught by the r15 ×10-content gate). floor + 10^6·frac are
          // each exact doubles; the recombination is the same staged
          // IEEE ops in both engines.
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).cast("decimal(18,6)")).as("chs"),
          round(dsum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty"),
          round(dsum(col("l_discount")) / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .withColumn("sum_charge",
          expr("CAST(CAST(floor(chs) AS BIGINT) AS DOUBLE)" +
            " + CAST(CAST((chs % 1) * 1000000 AS BIGINT) AS DOUBLE)" +
            " / CAST(1000000 AS DOUBLE)"))
        .select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
          "sum_disc_price", "sum_charge", "avg_qty", "avg_disc",
          "count_order")
        .orderBy("l_returnflag", "l_linestatus")),

    "q_agg_distinct" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count_distinct(col("l_suppkey")).as("n_supp"),
          count_distinct(col("l_partkey")).as("n_part"),
          sum_distinct(col("l_quantity").cast("decimal(18,4)")).cast("double")
            .as("sum_dist_qty"))
        .orderBy("l_returnflag")),

    "q_agg_rollup" -> ((s: SparkSession, dir: String) => {
      // Spark's ambiguous-self-join check trips on DataFrame-API rollup over
      // joined grouping columns; express the rollup in SQL over a temp view.
      table(s, dir, "customer")
        .join(broadcast(table(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name", "c_acctbal")
        .createOrReplaceTempView("rollup_cust")
      s.sql(
        """SELECT coalesce(r_name, '(all)') AS grp_region,
          |       coalesce(n_name, '(all)') AS grp_nation,
          |       count(*) AS n_cust,
          |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
          |FROM rollup_cust
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY grp_region, grp_nation""".stripMargin)
    }),

    "q_agg_cube" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("grp_flag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("grp_status"),
          col("n"), col("sum_qty"))
        .orderBy("grp_flag", "grp_status")),

    "q_agg_gsets" -> ((s: SparkSession, dir: String) => {
      table(s, dir, "lineitem").createOrReplaceTempView("gs_lineitem")
      s.sql(
        """SELECT coalesce(l_returnflag, '(all)') AS grp_flag,
          |       coalesce(l_linestatus, '(all)') AS grp_status,
          |       count(*) AS n,
          |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
          |FROM gs_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY grp_flag, grp_status""".stripMargin)
    }),

    "q_agg_having" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .where(col("n_orders") >= 12 && col("total") > 100000)
        .orderBy("o_custkey")),

    // Approximate distinct parts per returnflag — HASH-GATED since r13
    // (the r12 verdict item): the sketch is the deterministic KMV
    // bottom-k (the salt-14 family — same KmvSketch Aggregator as
    // q_agg_kmv_distinct, applied to l_partkey), whose mod-prime affine
    // member is a bijection on [0, P) ⇒ the bottom-64 set is
    // collision-free and the "approximate" estimate replays EXACTLY in
    // DuckDB (the countmin rule). The HLL++ surface stays covered by
    // plans.ApproxDistinctRewrite + its spec (opt-in rewrite of exact
    // count(DISTINCT) — ApproxDistinctRewriteSpec pins the 3·rsd bound
    // there). within_3rsd carries the KMV bound (rsd ≈ 1/√(k−2) = 12.7%
    // at k=64, 3σ = 38.1%) into the dumped artifact, computed from the
    // NAMED estimate column so neither engine re-derives the estimator
    // (the staged-formula discipline).
    "q_agg_approx_distinct" -> ((s: SparkSession, dir: String) => {
      val P = graft.functions.ReplayableHash.P
      val (a, b) = graft.functions.ReplayableHash.KmvParams.head
      val kmv = udaf(DiagOps.KmvSketch)
      table(s, dir, "lineitem")
        .select(col("l_returnflag"),
          expr(s"($a * (l_partkey % $P) + $b) % $P").as("hv"),
          col("l_partkey"))
        .groupBy("l_returnflag")
        .agg(kmv(col("hv")).as("sk"),
          count_distinct(col("l_partkey")).as("nd"))
        .select(col("l_returnflag"),
          asLong(col("nd")).as("exact_parts"),
          col("sk._1").as("sketch_size"),
          col("sk._2").as("kth_hash"),
          col("sk._3").as("approx_parts"))
        .withColumn("within_3rsd",
          abs(col("approx_parts") - col("exact_parts").cast("double"))
            <= expr("CAST(0.381 AS DOUBLE)") * col("exact_parts").cast("double"))
        .orderBy("l_returnflag")
    }),

    // Equi-width histogram: bucket o_totalprice into fixed 25k-wide bins by
    // pure integer math (exact 2-dec money → scaled long), count + exact
    // sum per bin. The standard profiling aggregate; one hash agg, fully
    // map-side-combinable at any scale.
    "q_agg_hist" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "orders")
        .withColumn("bin",
          expr("CAST(CAST(round(o_totalprice * 100) AS BIGINT) div 2500000 AS BIGINT)"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("bin_total"))
        .orderBy("bin")),

    // Unpivot (melt): wide measure columns to (measure, value) rows via the
    // native Dataset.unpivot (Catalyst Expand — one pass, no union of
    // scans), then a per-measure aggregate. Inverse surface of q_agg_pivot.
    "q_agg_unpivot" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"))
        .unpivot(Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .groupBy("measure")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("measure")),

    // Pivot: one count column per event type (fixed value list so the
    // output schema is static — required for a 100 TB plan anyway).
    "q_agg_pivot" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")),

    // Per-group exact mode (most frequent event_type per user, ties to the
    // lexicographically smallest type): two hash aggregates — counts, then a
    // min_by over the lexicographic (-count, type) struct. No window, no
    // per-group sort; both stages partial-aggregate map-side.
    "q_agg_mode" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(min_by(col("event_type"), struct(-col("c"), col("event_type")))
            .as("mode_type"),
          max(col("c")).as("mode_n"))
        .orderBy("user_id")),

    // Ordered list aggregation (deterministic: sorted before joining).
    "q_agg_listagg" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(concat_ws(",", sort_array(collect_list(col("c_name")))).as("members"),
          count(lit(1)).as("n_members"))
        .orderBy("c_nationkey")),

    // Approximate percentile via a DETERMINISTIC bottom-k sample (r14 —
    // replaces the GK built-in, which is partition-order-dependent and
    // therefore oracle-less): priority = salt-17 affine hash of the
    // composite row key, the typed BottomKSample aggregator keeps the
    // 512 lexicographically smallest (priority, key, cents) triples per
    // group — bounded O(k) state, map-side combinable, a pure function
    // of the DATA (not the partitioning), so like KMV/count-min the
    // "approximate" sketch gets an EXACT DuckDB oracle. approx_p50 is
    // the lower median of the sample (sorted-rank (n+1)/2), surfaced as
    // the k/100.0 replayable division. (l_orderkey, l_linenumber) is
    // NOT unique on this fixture — cents ride in the sort key so tied
    // boundary triples are interchangeable by value. The GK built-in
    // remains available behind the opt-in ApproxPercentileRewrite
    // (the ApproxDistinctRewrite pattern); the exact-percentile
    // OPERATOR is q_agg_percentile via the bucketed valueAtRanks.
    "q_agg_approx_percentile" -> ((s: SparkSession, dir: String) => {
      val P = graft.functions.ReplayableHash.P
      val (a, b) = graft.functions.ReplayableHash.SamplePctlParams.head
      val samp = udaf(DiagOps.BottomKSample)
      table(s, dir, "lineitem")
        .select(col("l_returnflag"),
          expr("l_orderkey * 8 + l_linenumber").as("uk"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
        .withColumn("pri", expr(s"($a * (uk % $P) + $b) % $P"))
        .groupBy("l_returnflag")
        .agg(samp(col("pri"), col("uk"), col("cents")).as("sk"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
          col("sk._1").as("n_sample"),
          (col("sk._2").cast("double") / lit(100)).as("approx_p50"))
        .orderBy("l_returnflag")
    }),

    "q_agg_bool" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(bool_and(col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
          .as("all_shipped_before_99"),
          bool_or(col("l_quantity") > 45).as("any_high_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Statistical moments from exact decimal sums: Σx, Σx², Σxy are exact
    // (2-dec inputs → products ≤4-dec), so variance/stddev/corr computed
    // from them as final double arithmetic are bit-identical across
    // engines — unlike streaming variance built-ins, whose accumulation
    // order differs.
    "q_agg_stats" -> ((s: SparkSession, dir: String) => {
      val n = count(lit(1))
      val sq = sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
      val sq2 = sum((col("l_quantity") * col("l_quantity")).cast("decimal(24,4)")).cast("double")
      val sp = sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
      val sp2 = sum((col("l_extendedprice") * col("l_extendedprice")).cast("decimal(24,4)")).cast("double")
      val sqp = sum((col("l_quantity") * col("l_extendedprice")).cast("decimal(24,4)")).cast("double")
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(n.as("n"), sq.as("sum_q"), sq2.as("sum_q2"), sp.as("sum_p"),
          sp2.as("sum_p2"), sqp.as("sum_qp"))
        .select(col("l_returnflag"), col("n"),
          round((col("sum_q2") - col("sum_q") * col("sum_q") / col("n")) / (col("n") - 1), 4)
            .as("var_qty"),
          round(sqrt((col("sum_q2") - col("sum_q") * col("sum_q") / col("n")) / (col("n") - 1)), 4)
            .as("stddev_qty"),
          round((col("sum_qp") - col("sum_q") * col("sum_p") / col("n")) /
            (sqrt(col("sum_q2") - col("sum_q") * col("sum_q") / col("n")) *
              sqrt(col("sum_p2") - col("sum_p") * col("sum_p") / col("n"))), 6)
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // Exact interpolated percentiles (R-7, same definition as quantile_cont).
    // Exact interpolated quantiles per group — NOT Spark's `percentile`
    // aggregate (a TypedImperativeAggregate that buffers EVERY group value
    // in one task's memory: with a 3-value group key that is N/3 values per
    // buffer — the same low-cardinality trap as a per-group sort window,
    // fatal at 100 TB). Re-expressed round 6 over the bucketed
    // order-statistic selection (DiagOps.valueAtRanks): the quantile_cont
    // position q·(n−1) splits into exact integer lo-rank/frac (q = a/b ⇒
    // lo = a(n−1) div b, frac = (a(n−1) mod b)/b — dyadic, bit-exact), the
    // two bracketing order statistics come from the histogram selection,
    // and one interpolation per quantile reproduces the previous
    // formulation bit-for-bit (same DuckDB oracle, unchanged).
    //
    // Cost shape (measured, round 7): the round-6 formulation rebuilt the
    // key/bucket histograms per invocation (~2.7 s at sf0.1, stage-latency-
    // bound); memoizing them per corpus digest (DiagOps.rankHistCache, the
    // candidateIndexFor pattern) leaves one bounded per-call job —
    // ~1.1 s cold-subset, sub-second steady-state. At cluster scale the
    // build is one linear pass and every window stays bounded (#buckets,
    // then ≤4096 keys). The GK sketch (q_agg_approx_percentile) remains
    // the cheap path when exactness isn't required.
    "q_agg_percentile" -> ((s: SparkSession, dir: String) => {
      val grp = "l_returnflag"
      // one unpivoted frame covers BOTH measure columns, so the whole query
      // is a single selection pipeline over a composite (group, measure)
      // key: one histogram pass + one targeted-rank pass, regardless of how
      // many quantiles are requested
      val longv = table(s, dir, "lineitem")
        .select(col(grp), expr(
          "stack(2, 'qty', l_quantity, 'price', l_extendedprice) AS (vcol, value)"))
        .withColumn("g", concat_ws("|", col(grp), col("vcol")))
      // quantile q = a/b at 0-based position q(n-1): exact integer lo-rank
      // and the two bracketing 1-based ranks (hi clamped to n). The count
      // relation arrives from valueAtRanks' own key histogram (no second
      // input pass). ONE pass over it builds every (which, rank) target —
      // the quantile spec lives in a literal array filtered per measure
      // column (the previous 4-way union re-aggregated the count relation
      // once per quantile) — and n rides THROUGH the selection (the
      // valueAtRanks extras channel), so the final interpolation needs no
      // re-join against the count relation: one fewer broadcast job per
      // call, measured round 8.
      def mkRanks(nRel: DataFrame): DataFrame =
        nRel
          .select(col("g"), col("n"), explode(expr(
            """filter(array(
              |  named_struct('tag', 'q25', 'a', 1, 'b', 4, 'vc', 'qty'),
              |  named_struct('tag', 'q50', 'a', 1, 'b', 2, 'vc', 'qty'),
              |  named_struct('tag', 'q75', 'a', 3, 'b', 4, 'vc', 'qty'),
              |  named_struct('tag', 'q50', 'a', 1, 'b', 2, 'vc', 'price')),
              | s -> endswith(g, concat('|', s.vc)))""".stripMargin))
            .as("spec"))
          .select(col("g"), col("n"), explode(array(
            struct(concat(col("spec.tag"), lit("_lo")).as("which"),
              expr("(spec.a * (n - 1)) div spec.b + 1").as("rank")),
            struct(concat(col("spec.tag"), lit("_hi")).as("which"),
              expr("least((spec.a * (n - 1)) div spec.b + 2, n)").as("rank"))))
            .as("t"))
          .select(col("g"), col("t.which").as("which"),
            col("t.rank").as("rank"), col("n"))
      def at(which: String, vcol: String) =
        min(when(col("which") === which && col("g").endsWith(s"|$vcol"),
          col("value")))
      val (sel, _) = DiagOps.valueAtRanks(longv, "g", "value", mkRanks,
        Some("pctl-lineitem|" +
          SourceSinkOps.fixtureKey(dir, "lineitem.parquet")))
      // qty and price rows of one flag share n (one stack row each per
      // lineitem row, no nulls in either measure), so max() just reads it
      val vals = sel
        .withColumn(grp, expr("split(g, '\\\\|')[0]"))
        .groupBy(grp).agg(
          at("q25_lo", "qty").as("q25_lo"), at("q25_hi", "qty").as("q25_hi"),
          at("q50_lo", "qty").as("q50_lo"), at("q50_hi", "qty").as("q50_hi"),
          at("q75_lo", "qty").as("q75_lo"), at("q75_hi", "qty").as("q75_hi"),
          at("q50_lo", "price").as("p50_lo"), at("q50_hi", "price").as("p50_hi"),
          max(col("n")).as("n"))
      def interp(lo: String, hi: String, a: Int, b: Int) =
        col(lo) + expr(s"(($a * (n - 1)) % $b) / CAST($b AS DOUBLE)") *
          (col(hi) - col(lo))
      vals
        .select(col(grp),
          round(interp("q25_lo", "q25_hi", 1, 4), 4).as("p25_qty"),
          round(interp("q50_lo", "q50_hi", 1, 2), 4).as("p50_qty"),
          round(interp("q75_lo", "q75_hi", 3, 4), 4).as("p75_qty"),
          round(interp("p50_lo", "p50_hi", 1, 2), 4).as("p50_price"))
        .orderBy(grp)
    }),

    // Bitmap audience overlap (r12): the roaring-bitmap pattern in BIGINT
    // blocks. Audience per type = users STRICTLY ABOVE the type's median
    // per-user event count (every user fires every type on this fixture —
    // the raw any-activity overlap is degenerately 1.0; the heavy-user
    // cut yields a real ~half split). The median is selected BY VALUE
    // from the bounded (type, count) histogram via one cumulative window
    // — never a window over corpus-scaled user rows (the mktsegment
    // trap). Audience users then compress to one bit in a 63-bit mask
    // per (type, user_id div 63) block (63, not 64: bit 63 would make
    // the mask negative in Spark and OVERFLOW DuckDB's checked shift);
    // pairwise intersections are bit_count(maskA & maskB) summed over
    // the block equi-join (per-key density = #types, bounded) — the
    // shape set-intersection runs at 10⁹ users, vs a user-level
    // self-join's full shuffle. Jaccard is one division of exact
    // BIGINTs; the ≤ #types totals/median relations broadcast explicit.
    "q_agg_bitmap_overlap" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.expressions.Window
      // r15 (optimization): cnt is read by BOTH the median chain and the
      // bitmap build, and bm by the totals and both self-join sides —
      // unmaterialized, each reference re-ran the events scan + agg
      // (measured plan: 16 scans / 31 exchanges). Both relations are
      // aggregated (cnt: per-(type,user); bm: ≤ #types·#blocks rows), so
      // the checkpoints are the r11 tf-aggregated-index class, not raw
      // occurrence rows. One events scan total.
      val cnt = table(s, dir, "events")
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val hist = cnt.groupBy("event_type", "n").agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy("event_type").orderBy("n")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = hist
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("tot", sum(col("c")).over(Window.partitionBy("event_type")))
        .where(col("cum") >= expr("(tot + 1) div 2"))
        .groupBy("event_type").agg(min("n").as("med_n"))
      val bm = cnt.join(broadcast(med), "event_type")
        .where(col("n") > col("med_n"))
        .select(col("event_type"), expr("user_id div 63").as("blk"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
            .as("bit"))
        .groupBy("event_type", "blk")
        .agg(expr("bit_or(bit)").as("mask"))
        .localCheckpoint(true)
      val tot = bm.groupBy("event_type")
        .agg(asLong(sum(expr("bit_count(mask)"))).as("n_users"))
      val pr = bm.as("x").join(bm.as("y"),
          col("x.blk") === col("y.blk") &&
            col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("type_a"),
          col("y.event_type").as("type_b"))
        .agg(asLong(sum(expr("bit_count(x.mask & y.mask)"))).as("n_common"))
      pr.join(broadcast(tot.select(col("event_type").as("type_a"),
          col("n_users").as("n_a"))), "type_a")
        .join(broadcast(tot.select(col("event_type").as("type_b"),
          col("n_users").as("n_b"))), "type_b")
        .selectExpr("type_a", "type_b", "n_a", "n_b", "n_common",
          "CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard")
        .orderBy("type_a", "type_b")
    })
  )

  def oracle: Seq[(String, String)] = Seq(
    // Deterministic bottom-k sample replay (salt 17): the oracle
    // re-derives the 512 lexicographically smallest (pri, uk, cents)
    // triples per group with a window (single-node DuckDB may sort; the
    // ENGINE's aggregator never does) and reads the sample's lower
    // median by value — the same rank-(n+1)/2 selection as the Scala
    // finish(). cents/100.0 is the replayable k/100.0 division.
    "q_agg_approx_percentile" -> {
      val P = graft.functions.ReplayableHash.P
      val (a, b) = graft.functions.ReplayableHash.SamplePctlParams.head
      val k = DiagOps.SampleK
      s"""WITH pri AS (
         |  SELECT l_returnflag,
         |         l_orderkey * 8 + l_linenumber AS uk,
         |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         |         ($a * ((l_orderkey * 8 + l_linenumber) % $P) + $b) % $P AS pri
         |  FROM lineitem),
         |bot AS (
         |  SELECT l_returnflag, cents FROM (
         |    SELECT l_returnflag, cents,
         |           row_number() OVER (PARTITION BY l_returnflag
         |                              ORDER BY pri, uk, cents) AS rk
         |    FROM pri)
         |  WHERE rk <= $k),
         |med AS (
         |  SELECT l_returnflag, cents,
         |         row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS vr,
         |         count(*) OVER (PARTITION BY l_returnflag) AS ns
         |  FROM bot),
         |n AS (
         |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT n.l_returnflag, n.n_rows,
         |       CAST(med.ns AS BIGINT) AS n_sample,
         |       CAST(med.cents AS DOUBLE) / CAST(100 AS DOUBLE) AS approx_p50
         |FROM med JOIN n ON med.l_returnflag = n.l_returnflag
         |WHERE med.vr = (med.ns + 1) // 2
         |ORDER BY n.l_returnflag""".stripMargin
    },

    // KMV bottom-k replay (the q_agg_kmv_distinct shape on lineitem
    // partkeys): the affine member is a bijection so DISTINCT hv counts
    // equal DISTINCT partkey counts, the bottom-64 set is collision-free,
    // and the (k−1)·P/h_(k) estimator is the same two double ops in both
    // engines. approx_parts is NAMED in a subquery so the within_3rsd
    // flag reads the estimate, never re-derives it.
    "q_agg_approx_distinct" -> {
      val P = graft.functions.ReplayableHash.P
      val (a, b) = graft.functions.ReplayableHash.KmvParams.head
      val k = DiagOps.KmvK
      s"""WITH h AS (
         |  SELECT DISTINCT l_returnflag, ($a * (l_partkey % $P) + $b) % $P AS hv
         |  FROM lineitem),
         |r AS (
         |  SELECT l_returnflag, hv,
         |         row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rk,
         |         count(*) OVER (PARTITION BY l_returnflag) AS ndh
         |  FROM h),
         |kk AS (
         |  SELECT l_returnflag, min(ndh) AS ndh,
         |         max(CASE WHEN rk = least(ndh, $k) THEN hv END) AS kth_hash
         |  FROM r WHERE rk <= $k GROUP BY l_returnflag),
         |e AS (
         |  SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts
         |  FROM lineitem GROUP BY l_returnflag),
         |est AS (
         |  SELECT kk.l_returnflag, e.exact_parts,
         |         CAST(least(kk.ndh, $k) AS BIGINT) AS sketch_size,
         |         CAST(kk.kth_hash AS BIGINT) AS kth_hash,
         |         CASE WHEN kk.ndh < $k THEN CAST(kk.ndh AS DOUBLE)
         |              ELSE CAST(${k - 1} AS DOUBLE) * CAST($P AS DOUBLE) / CAST(kk.kth_hash AS DOUBLE)
         |         END AS approx_parts
         |  FROM kk JOIN e ON kk.l_returnflag = e.l_returnflag)
         |SELECT l_returnflag, exact_parts, sketch_size, kth_hash, approx_parts,
         |       abs(approx_parts - CAST(exact_parts AS DOUBLE))
         |         <= CAST(0.381 AS DOUBLE) * CAST(exact_parts AS DOUBLE) AS within_3rsd
         |FROM est ORDER BY l_returnflag""".stripMargin
    },

    "q_agg_bitmap_overlap" ->
      """WITH cnt AS (
        |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY event_type, user_id),
        |hist AS (
        |  SELECT event_type, n, CAST(count(*) AS BIGINT) AS c
        |  FROM cnt GROUP BY event_type, n),
        |med AS (
        |  SELECT event_type, min(n) AS med_n FROM (
        |    SELECT event_type, n,
        |           sum(c) OVER (PARTITION BY event_type ORDER BY n
        |                        ROWS UNBOUNDED PRECEDING) AS cum,
        |           sum(c) OVER (PARTITION BY event_type) AS tot
        |    FROM hist)
        |  WHERE cum >= (tot + 1) // 2 GROUP BY event_type),
        |bm AS (
        |  SELECT cnt.event_type, user_id // 63 AS blk,
        |         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS mask
        |  FROM cnt JOIN med USING (event_type)
        |  WHERE cnt.n > med.med_n
        |  GROUP BY cnt.event_type, blk),
        |tot AS (
        |  SELECT event_type, CAST(sum(bit_count(mask)) AS BIGINT) AS n_users
        |  FROM bm GROUP BY event_type),
        |pr AS (
        |  SELECT x.event_type AS type_a, y.event_type AS type_b,
        |         CAST(sum(bit_count(x.mask & y.mask)) AS BIGINT) AS n_common
        |  FROM bm x JOIN bm y ON x.blk = y.blk
        |                     AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT pr.type_a, pr.type_b, ta.n_users AS n_a, tb.n_users AS n_b,
        |       pr.n_common,
        |       CAST(pr.n_common AS DOUBLE) / (ta.n_users + tb.n_users - pr.n_common) AS jaccard
        |FROM pr JOIN tot ta ON ta.event_type = pr.type_a
        |        JOIN tot tb ON tb.event_type = pr.type_b
        |ORDER BY type_a, type_b""".stripMargin,

    "q_agg_hist" ->
      """SELECT CAST(CAST(round(o_totalprice * 100) AS BIGINT) // 2500000 AS BIGINT) AS bin,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS bin_total
        |FROM orders GROUP BY bin ORDER BY bin""".stripMargin,

    "q_agg_unpivot" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT measure, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM u GROUP BY measure ORDER BY measure""".stripMargin,

    "q_agg_basic" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |       CAST(CAST(floor(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6)))) AS BIGINT) AS DOUBLE)
        |         + CAST(CAST((sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) % 1) * 1000000 AS BIGINT) AS DOUBLE)
        |           / CAST(1000000 AS DOUBLE) AS sum_charge,
        |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
        |       round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_suppkey) AS n_supp,
        |       count(DISTINCT l_partkey) AS n_part,
        |       CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_dist_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_rollup" ->
      """SELECT coalesce(r_name, '(all)') AS grp_region,
        |       coalesce(n_name, '(all)') AS grp_nation,
        |       count(*) AS n_cust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY grp_region, grp_nation""".stripMargin,

    "q_agg_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS grp_flag,
        |       coalesce(l_linestatus, '(all)') AS grp_status,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY grp_flag, grp_status""".stripMargin,

    "q_agg_gsets" ->
      """SELECT coalesce(l_returnflag, '(all)') AS grp_flag,
        |       coalesce(l_linestatus, '(all)') AS grp_status,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY grp_flag, grp_status""".stripMargin,

    "q_agg_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) >= 12
        |   AND CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) > 100000
        |ORDER BY o_custkey""".stripMargin,

    "q_agg_pivot" ->
      """SELECT user_id,
        |       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |       count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |       count(CASE WHEN event_type = 'view' THEN 1 END) AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_agg_mode" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY user_id, event_type),
        |r AS (
        |  SELECT user_id, event_type, c,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY c DESC, event_type ASC) AS rn
        |  FROM c)
        |SELECT user_id, event_type AS mode_type, c AS mode_n
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_agg_listagg" ->
      """SELECT c_nationkey,
        |       string_agg(c_name, ',' ORDER BY c_name) AS members,
        |       count(*) AS n_members
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_agg_bool" ->
      """SELECT l_returnflag,
        |       bool_and(l_shipdate < TIMESTAMP '1999-01-01 00:00:00') AS all_shipped_before_99,
        |       bool_or(l_quantity > 45) AS any_high_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_q,
        |         CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS sum_q2,
        |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_p,
        |         CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sum_p2,
        |         CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sum_qp
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |       round((sum_q2 - sum_q * sum_q / n) / (n - 1), 4) AS var_qty,
        |       round(sqrt((sum_q2 - sum_q * sum_q / n) / (n - 1)), 4) AS stddev_qty,
        |       round((sum_qp - sum_q * sum_p / n) /
        |             (sqrt(sum_q2 - sum_q * sum_q / n) * sqrt(sum_p2 - sum_p * sum_p / n)), 6)
        |         AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty,
        |       round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |       round(quantile_cont(l_quantity, 0.75), 4) AS p75_qty,
        |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
