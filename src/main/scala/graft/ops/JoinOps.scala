package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join family (SURVEY §2B "Joins").
  *
  * Scale strategy: dimension tables (region/nation/customer at these shapes)
  * are broadcast explicitly so the fact-side scan never shuffles for them;
  * the multiway star join keeps lineitem as the streamed side throughout.
  * The as-of and interval joins carry an equi key (user/cust) so Catalyst
  * plans a shuffled equi-join with the range predicate as a post-filter —
  * the per-key group sizes, not the table sizes, bound the blow-up.
  */
object JoinOps extends QueryModule {

  /** q_join_skew_salted: dim-side replication factor — a hot fact key's
    * rows scatter across this many shuffle partitions. */
  private[graft] val SaltFactor = 8

  /** q_join_band: the symmetric band half-width (and bucket width) in µs. */
  private[graft] val BandUs = 60000000L

  /** q_join_asof_tolerance: max backward gap for a match (30 min, µs) —
    * pandas merge_asof's `tolerance`. */
  private[graft] val AsofTolUs = 1800000000L

  /** q_join_bloom_prefilter width (bits): 2^16 cells — the set-bit
    * relation stays domain-bounded and broadcast-legal at any dim size
    * (the simhash 2^16 rule). */
  private val BloomBits = 65536L

  /** Shared merge-scan as-of implementation (both directions), salted by a
    * coarse time bucket so no single hot key ever sorts its whole timeline
    * in one task.
    *
    * Events and orders are unioned onto one per-user timeline (order dates
    * cast NTZ→timestamp; the session TZ is UTC on both engines, so the
    * ordering is exactly the one the range predicate `o_orderdate <= ts`
    * implies). `kind` breaks time ties so that the qualifying same-instant
    * orders fall INSIDE each event's window frame: backward (`<=`) sorts
    * orders before events, forward (`>=`) sorts events before orders. A
    * running lexicographic max/min of struct(date, key) over the frame then
    * reproduces the (date, key) tie-break of the join formulation exactly.
    *
    * Two-level structure (the `ops.globalRowNumber` shape): the running
    * best is computed WITHIN each (user, hour-of-time) bucket, and a
    * per-(user, bucket) summary relation — rows = #occupied buckets, never
    * #records — carries the running best across PRECEDING (resp. following)
    * buckets via a window over that tiny relation; an equi-join on
    * (user_id, bucket) merges the two. Same t ⇒ same bucket, so the
    * tie-break stays in the local level and the cross-bucket level only
    * sees strictly earlier/later times — semantics are bucket-width-
    * independent (the DuckDB oracle is unchanged). A hot key's sort cost
    * drops from its full timeline to its densest bucket; the probe at 750×
    * single-key skew stays flat (SCALING.md).
    *
    * The trailing groupBy(event_id, user_id) collapses duplicate event rows
    * the same way the join+aggregate formulation did (its group key), and
    * costs one hash agg over #events rows.
    */
  private def asofMerge(s: SparkSession, dir: String, forward: Boolean): org.apache.spark.sql.DataFrame = {
    val bucketUs = 3600L * 1000000L // 1 hour
    val oRows = table(s, dir, "orders")
      .select(col("o_custkey").as("user_id"),
        col("o_orderdate").cast("timestamp").as("t"),
        lit(if (forward) 1 else 0).as("kind"),
        struct(col("o_orderdate"), col("o_orderkey")).as("ord"))
    val eRows = table(s, dir, "events")
      .select(col("user_id"), col("ts").as("t"),
        lit(if (forward) 0 else 1).as("kind"), col("event_id"))
    val timeline = oRows.unionByName(eRows, allowMissingColumns = true)
      .withColumn("tb", expr(s"unix_micros(t) div $bucketUs"))
    // level 1: running best within the (user, bucket) sort group
    val wLocal = {
      val base = Window.partitionBy("user_id", "tb").orderBy(col("t"), col("kind"))
      if (forward) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    val localBest = if (forward) min(col("ord")).over(wLocal) else max(col("ord")).over(wLocal)
    // level 2: best order per occupied bucket (max/min ignore the null ord
    // of event rows, and every event bucket is present by construction),
    // then the running best over strictly earlier/later buckets
    val wCross = {
      val base = Window.partitionBy("user_id").orderBy("tb")
      if (forward) base.rowsBetween(1, Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, -1)
    }
    val bucketBest = if (forward) min(col("ord")) else max(col("ord"))
    val crossBest = if (forward) min(col("bucket_best")).over(wCross)
      else max(col("bucket_best")).over(wCross)
    val summary = timeline.groupBy("user_id", "tb")
      .agg(bucketBest.as("bucket_best"))
      .withColumn("cross_best", crossBest)
      .select("user_id", "tb", "cross_best")
    // greatest/least skip nulls (a bucket with no preceding orders has a
    // null cross_best), matching the running-max-over-nullable semantics
    val merged = if (forward) least(col("local_best"), col("cross_best"))
      else greatest(col("local_best"), col("cross_best"))
    val perEventBest = if (forward) min(col("run_best")) else max(col("run_best"))
    timeline
      .withColumn("local_best", localBest)
      .where(col("event_id").isNotNull)
      .join(summary, Seq("user_id", "tb"))
      .withColumn("run_best", merged)
      .groupBy("event_id", "user_id")
      .agg(perEventBest.as("best"))
      .select(col("event_id"), col("user_id"),
        col("best.o_orderkey").as("o_orderkey"),
        ntzMillis(col("best.o_orderdate")).as("order_date_ms"))
      .orderBy("event_id")
  }

  def queries: Seq[(String, Q)] = Seq(
    "q_join_inner" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "orders")
        .join(broadcast(table(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"), "inner")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
        .orderBy("o_orderkey")),

    // TPC-H Q5-shaped star join: fact side streams, all dims broadcast.
    "q_join_multiway" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "lineitem")
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(table(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")),

    // Full outer with unmatched rows on both sides.
    "q_join_outer" -> ((s: SparkSession, dir: String) => {
      val cust = table(s, dir, "customer").where(col("c_custkey") < 1000)
      val ords = table(s, dir, "orders").where(col("o_custkey") >= 500)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      cust.join(ords, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("k"),
          col("c_name"), col("n_orders"))
        .orderBy("k")
    }),

    "q_join_semi" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "customer")
        .join(table(s, dir, "orders").where(col("o_totalprice") > 250000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")),

    "q_join_anti" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "customer")
        .join(table(s, dir, "orders").where(col("o_totalprice") > 250000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")),

    // Explicit cross join (dims only — a deliberate cartesian of two tiny
    // tables; fact-side cross joins stay forbidden by design).
    "q_join_cross" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "region").crossJoin(table(s, dir, "nation"))
        .select(col("r_name"), col("n_name"),
          (col("r_regionkey") === col("n_regionkey")).cast("long").as("is_home"))
        .orderBy("r_name", "n_name")),

    // arg-max aggregation: the key of the lexicographically best (price,
    // orderkey) pair per customer — unique tie-break keeps both engines
    // deterministic.
    // arg-max via lexicographic struct ordering — no packed-integer tricks,
    // so no overflow at any orderkey scale; the oracle uses the equivalent
    // window formulation because DuckDB's arg_max can't order by structs.
    "q_agg_argmax" -> ((s: SparkSession, dir: String) => {
      val ordKey = struct(col("o_totalprice"), col("o_orderkey"))
      table(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(max_by(col("o_orderkey"), ordKey).as("best_order"),
          min_by(col("o_orderkey"), ordKey).as("worst_order"),
          max(col("o_totalprice")).as("best_price"))
        .orderBy("o_custkey")
    }),

    // Salted skewed join (r11b) — the manual skew-mitigation shape for a
    // shuffled fact↔dim join whose key distribution is hot: the dim side
    // replicates ×[[SaltFactor]] (one row per salt value via a literal
    // sequence explode), the fact side draws a DETERMINISTIC salt from
    // unrelated unique columns (l_orderkey + l_linenumber — no RNG,
    // replays exactly; l_linenumber ALONE only takes values 1..7, which
    // would leave salt 0 dead and inherit linenumber skew — r11 ADVICE),
    // and the join key becomes (partkey, salt), so a hot partkey's rows
    // scatter across [[SaltFactor]] shuffle partitions instead of
    // funneling one task. Results are IDENTICAL to the unsalted join by
    // construction (every fact row meets exactly one replica); the oracle
    // is the PLAIN join — the salt is pure execution shape, asserted
    // plan-level in JoinSpec (salt column present in the shuffle keys).
    // AQE's skew-join handles sort-merge cases adaptively; the salt is
    // the static-plan insurance a 100 TB pipeline writes for its known
    // hot keys (the CLAUDE.md count-over-hot-key discipline, join form).
    "q_join_skew_salted" -> ((s: SparkSession, dir: String) => {
      val fact = table(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"),
          pmod(col("l_orderkey") + col("l_linenumber"), lit(SaltFactor)).as("salt"))
      val dim = table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"),
          explode(expr(s"sequence(0, ${SaltFactor - 1})")).as("salt"))
      fact.join(dim,
          col("l_partkey") === col("p_partkey") && fact("salt") === dim("salt"))
        .groupBy("p_brand")
        .agg(asLong(count(lit(1))).as("n_lines"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
        .orderBy("p_brand")
    }),

    // Bloom-prefilter semi-join study (r12) — the "ship a filter, not the
    // dim table" scale technique: a deterministic Bloom filter
    // (ReplayableHash salt-13 rows, k=4, 2^16 bits) built over the
    // selective dim subset prefilters the fact side, and the report
    // quantifies what a 100 TB pipeline actually cares about — rows
    // passing vs true members vs false positives, with NO false
    // negatives (the Bloom guarantee, spec-pinned). Deterministic hash
    // rows make this "approximate" structure EXACTLY oracled (the
    // q_agg_countmin rule). Scale: the set-bit relation is bounded by
    // the 2^16 bit domain (broadcast-legal, the simhash rule); the fact
    // side collapses to per-key counts FIRST (O(#keys), the countmin
    // shape); the membership join is a shuffled key join (O(#dim) —
    // never broadcast, the dup_clusters rule).
    "q_join_bloom_prefilter" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val RH = graft.functions.ReplayableHash
      val P = RH.P
      val prel = RH.BloomParams.zipWithIndex
        .map { case ((a, b), k) => (k.toLong, a, b) }.toDF("r", "a", "b")
      val dim = table(s, dir, "part").where(col("p_size") > 40)
        .select("p_partkey")
      val positions = dim.crossJoin(broadcast(prel))
        .select(expr(s"((a * (p_partkey % $P) + b) % $P) % $BloomBits").as("pos"))
        .distinct()
      val freq = table(s, dir, "lineitem")
        .groupBy("l_partkey").agg(count(lit(1)).as("c"))
      val hits = freq.crossJoin(broadcast(prel))
        .withColumn("pos", expr(s"((a * (l_partkey % $P) + b) % $P) % $BloomBits"))
        .join(broadcast(positions), "pos")
        .groupBy("l_partkey").agg(count(lit(1)).as("nhit"))
      freq
        .join(hits, Seq("l_partkey"), "left")
        .join(dim.select(col("p_partkey").as("l_partkey"))
          .withColumn("truth", lit(true)), Seq("l_partkey"), "left")
        .select(col("c"),
          (coalesce(col("nhit"), lit(0L)) === 4).as("pass"),
          coalesce(col("truth"), lit(false)).as("is_member"))
        .agg(
          asLong(sum(col("c"))).as("n_fact_rows"),
          asLong(sum(when(col("pass"), col("c")).otherwise(0L)))
            .as("n_pass_rows"),
          asLong(sum(when(col("is_member"), col("c")).otherwise(0L)))
            .as("n_member_rows"),
          asLong(sum(when(col("pass") && !col("is_member"), col("c"))
            .otherwise(0L))).as("n_false_pos_rows"))
        .select(col("n_fact_rows"), col("n_pass_rows"), col("n_member_rows"),
          col("n_false_pos_rows"),
          when(col("n_fact_rows") - col("n_member_rows") > 0,
            col("n_false_pos_rows").cast("double")
              / (col("n_fact_rows") - col("n_member_rows"))).as("fp_rate"))
    }),

    // Banded self-join: equi on p_size bounds the pair blow-up per band.
    "q_join_theta" -> ((s: SparkSession, dir: String) => {
      val p1 = table(s, dir, "part").select(
        col("p_size"), col("p_partkey").as("k1"), col("p_retailprice").as("price1"))
      val p2 = table(s, dir, "part").select(
        col("p_size").as("p_size2"), col("p_partkey").as("k2"), col("p_retailprice").as("price2"))
      p1.join(p2, col("p_size") === col("p_size2") && col("price1") < col("price2"))
        .groupBy("p_size")
        .agg(count(lit(1)).as("n_pairs"), dsum(col("price2") - col("price1")).as("sum_gap"))
        .orderBy("p_size")
    }),

    // As-of: latest order at/before each event's timestamp for that user.
    // Merge-scan formulation (round 4): union events and orders onto one
    // per-user timeline, running max(struct(date, key)) over the sorted
    // stream gives every event its answer directly — ZERO pair expansion.
    // Round 5 salts that window by a 1-hour time bucket (two-level merge,
    // see asofMerge) so even a single hot key never sorts its whole
    // timeline in one task — flat at 750× single-key skew (SCALING.md).
    "q_join_asof" -> ((s: SparkSession, dir: String) =>
      asofMerge(s, dir, forward = false)),

    // Forward as-of: EARLIEST order at/after each event's timestamp for
    // that user — the mirror image: running min(struct) over the frame
    // [current row, unbounded following], events sorted before same-time
    // orders so `>=` ties are included. Same merge-scan shape.
    "q_join_asof_fwd" -> ((s: SparkSession, dir: String) =>
      asofMerge(s, dir, forward = true)),

    // Nearest as-of WITHIN a stream: per purchase, the same user's click
    // closest in time in EITHER direction — the bidirectional neighbor
    // lookup the directional as-ofs can't express (and, unlike an
    // events-vs-orders pairing, one the fixture genuinely exercises both
    // ways: clicks scatter around purchases). Two struct-extremum windows
    // ride ONE per-user sort (the sessionize discipline — user_id is the
    // high-cardinality key); equal-instant clicks sort before the
    // purchase (kind order) and land in the backward frame at distance 0
    // (documented inclusive-backward tie); µs distances compare in exact
    // integers, ties resolve backward.
    "q_join_asof_nearest" -> ((s: SparkSession, dir: String) => {
      val tl = table(s, dir, "events")
        .where(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
          col("event_id"),
          when(col("event_type") === "click", 0).otherwise(1).as("kind"))
      val base = Window.partitionBy("user_id")
        .orderBy(col("t"), col("kind"), col("event_id"))
      val wB = base.rowsBetween(Window.unboundedPreceding, -1)
      val wF = base.rowsBetween(1, Window.unboundedFollowing)
      val clickStruct = when(col("kind") === 0,
        struct(col("t").as("ct"), col("event_id").as("cid")))
      val pickBwd = col("bb").isNotNull &&
        (col("fb").isNull || col("t") - col("bb.ct") <= col("fb.ct") - col("t"))
      tl.withColumn("bb", max(clickStruct).over(wB))
        .withColumn("fb", min(clickStruct).over(wF))
        .where(col("kind") === 1)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          when(pickBwd, col("bb.cid")).otherwise(col("fb.cid")).as("click_id"),
          when(col("bb").isNull && col("fb").isNull, lit(null).cast("long"))
            .when(pickBwd, col("t") - col("bb.ct"))
            .otherwise(col("fb.ct") - col("t")).as("dt_us"),
          when(col("bb").isNull && col("fb").isNull, lit(null).cast("string"))
            .when(pickBwd, lit("backward")).otherwise(lit("forward"))
            .as("direction"))
        .orderBy("purchase_id")
    }),

    // Tolerance-bounded backward as-of (r13): per purchase, the same
    // user's nearest PRIOR click, but a match only counts when the gap
    // is within AsofTolUs (30 min) — pandas merge_asof's `tolerance`
    // semantics, the missing dial between the unbounded as-of and the
    // interval join. Same one-sort merge-scan shape as
    // q_join_asof_nearest (the backward struct-extremum arm alone);
    // unmatched purchases keep a NULL click with matched=false (left
    // semantics preserved — the audit needs the misses). Equal-instant
    // clicks sort before the purchase (kind order) and match at gap 0.
    "q_join_asof_tolerance" -> ((s: SparkSession, dir: String) => {
      val tl = table(s, dir, "events")
        .where(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
          col("event_id"),
          when(col("event_type") === "click", 0).otherwise(1).as("kind"))
      val wB = Window.partitionBy("user_id")
        .orderBy(col("t"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val clickStruct = when(col("kind") === 0,
        struct(col("t").as("ct"), col("event_id").as("cid")))
      val matched = col("bb").isNotNull &&
        col("t") - col("bb.ct") <= lit(AsofTolUs)
      tl.withColumn("bb", max(clickStruct).over(wB))
        .where(col("kind") === 1)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          when(matched, col("bb.cid")).as("click_id"),
          when(matched, col("t") - col("bb.ct")).as("gap_us"),
          matched.as("matched"))
        .orderBy("purchase_id")
    }),

    // Interval overlap: same-user event pairs within a 5-minute horizon.
    // Time-bucketed blocking: joining on user_id alone makes pair
    // generation quadratic in per-user event density (measured 36 s at a
    // 10× blow-up, ScaleProbe/SCALING.md); adding a 5-min bucket to the
    // equi key — left side exploded to its two candidate buckets — bounds
    // the quadratic work per (user, bucket). Same result set, the range
    // predicate still decides membership.
    "q_join_interval" -> ((s: SparkSession, dir: String) => {
      val bucketUs = 300000000L // 5 min in µs
      val e1 = table(s, dir, "events")
        .select(col("user_id").as("u1"), col("event_id").as("id1"), col("ts").as("ts1"),
          expr(s"unix_micros(ts) div $bucketUs").as("b1"))
        .withColumn("jb", explode(array(col("b1"), col("b1") + 1)))
      val e2 = table(s, dir, "events")
        .select(col("user_id").as("u2"), col("event_id").as("id2"), col("ts").as("ts2"),
          expr(s"unix_micros(ts) div $bucketUs").as("b2"))
      e1.join(e2, col("u1") === col("u2") && col("jb") === col("b2")
          && col("id1") < col("id2")
          && col("ts2") >= col("ts1")
          && col("ts2") <= col("ts1") + expr("INTERVAL 5 MINUTES"))
        .groupBy(col("u1").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),

    // Symmetric BAND join (r12c3): click↔purchase pairs within ±60 s per
    // user — the two-sided complement to q_join_interval's forward
    // window (a band predicate |t₂−t₁| ≤ w has no ≤-direction a range
    // join could order on). Buckets of exactly the band width make the
    // adjacent-probe fan COMPLETE (a qualifying pair spans at most one
    // bucket boundary) and DUPLICATE-FREE (the left row's three probe
    // buckets are distinct and the right row carries ONE bucket — the
    // LshJoinRewrite multi-probe argument); the shuffle key (user,
    // bucket) carries the pairing equi bound the self-join rule
    // requires. Per-user pair summary with signed gap extremes; exact
    // integers throughout.
    "q_join_band" -> ((s: SparkSession, dir: String) => {
      val ev = table(s, dir, "events")
        .selectExpr("user_id", "event_type", "unix_micros(ts) AS t_us")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("t_us").as("tc"),
          explode(expr(s"array(t_us div $BandUs - 1, t_us div $BandUs," +
            s" t_us div $BandUs + 1)")).as("bk"))
      val purch = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("t_us").as("tp"),
          expr(s"t_us div $BandUs").as("bk"))
      clicks.join(purch, Seq("user_id", "bk"))
        .where(abs(col("tp") - col("tc")) <= BandUs)
        .groupBy("user_id")
        .agg(asLong(count(lit(1))).as("n_pairs"),
          asLong(min(expr("tp - tc"))).as("min_gap_us"),
          asLong(max(expr("tp - tc"))).as("max_gap_us"))
        .orderBy(desc("n_pairs"), asc("user_id")).limit(200)
    }),

    // Dynamic-partition-pruning study (r12): the star-schema scan
    // optimization a 100 TB layout lives on — the fact side is written
    // ONCE as an external parquet table partitioned by the join key
    // (tmpdir path keyed by fixture digest, the q_sink_bucketed
    // convention), and the region-filtered nation dim broadcast inserts
    // a runtime `dynamicpruning` subquery into the fact scan's
    // PartitionFilters, so only the qualifying nations' directories are
    // read at all (JoinDppSpec asserts the plan literally). The
    // partition layout is pure execution shape — the oracle is the
    // PLAIN three-way join (the q_join_skew_salted precedent).
    "q_join_dpp" -> ((s: SparkSession, dir: String) => {
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft-sink-custpart-" + SourceSinkOps
          .fixtureKey(dir, "customer.parquet")
          .replaceAll("[^0-9a-fA-F]", "").toLowerCase).getAbsolutePath
      val marker = new java.io.File(path, "_SUCCESS")
      if (!marker.exists())
        table(s, dir, "customer")
          .write.mode("overwrite").partitionBy("c_nationkey").parquet(path)
      val cust = s.read.parquet(path)
      val dim = table(s, dir, "nation")
        .join(table(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .select(col("n_nationkey"), col("n_name"))
      cust.join(dim, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(asLong(count(lit(1))).as("n_customers"),
          dsum(col("c_acctbal")).as("total_acctbal"))
        .orderBy("n_name")
    })
  )

  def oracle: Seq[(String, String)] = Seq(
    // the salt is pure execution shape (every fact row meets exactly one
    // dim replica), so the twin is the PLAIN join
    "q_join_skew_salted" ->
      """SELECT p_brand,
        |       CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // the partition layout is pure execution shape — plain star join
    "q_join_dpp" ->
      """SELECT n_name,
        |       CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_join_inner" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    // Deterministic Bloom rows replay exactly (the countmin rule): both
    // engines build the identical set-bit relation and probe counts.
    "q_join_bloom_prefilter" -> {
      val RH = graft.functions.ReplayableHash
      s"""WITH pr AS ${RH.paramsSql(RH.BloomParams, 4, "v")},
         |dim AS MATERIALIZED (SELECT p_partkey FROM part WHERE p_size > 40),
         |pos AS (
         |  SELECT DISTINCT ((pr.a * (p_partkey % ${RH.P}) + pr.b) % ${RH.P}) % $BloomBits AS pos
         |  FROM dim CROSS JOIN pr),
         |freq AS MATERIALIZED (
         |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
         |  FROM lineitem GROUP BY l_partkey),
         |hits AS (
         |  SELECT f.l_partkey, count(*) AS nhit
         |  FROM freq f CROSS JOIN pr
         |  JOIN pos ON pos.pos = ((pr.a * (f.l_partkey % ${RH.P}) + pr.b) % ${RH.P}) % $BloomBits
         |  GROUP BY f.l_partkey),
         |px AS (
         |  SELECT f.c,
         |         COALESCE(h.nhit, 0) = 4 AS pass,
         |         d.p_partkey IS NOT NULL AS is_member
         |  FROM freq f
         |  LEFT JOIN hits h ON h.l_partkey = f.l_partkey
         |  LEFT JOIN dim d ON d.p_partkey = f.l_partkey),
         |ag AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS n_fact_rows,
         |         CAST(sum(CASE WHEN pass THEN c ELSE 0 END) AS BIGINT) AS n_pass_rows,
         |         CAST(sum(CASE WHEN is_member THEN c ELSE 0 END) AS BIGINT) AS n_member_rows,
         |         CAST(sum(CASE WHEN pass AND NOT is_member THEN c ELSE 0 END) AS BIGINT) AS n_false_pos_rows
         |  FROM px)
         |SELECT n_fact_rows, n_pass_rows, n_member_rows, n_false_pos_rows,
         |       CASE WHEN n_fact_rows - n_member_rows > 0
         |            THEN CAST(n_false_pos_rows AS DOUBLE) / (n_fact_rows - n_member_rows)
         |       END AS fp_rate
         |FROM ag""".stripMargin
    },

    "q_join_multiway" ->
      """SELECT r_name, n_name,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q_join_outer" ->
      """WITH cust AS (SELECT * FROM customer WHERE c_custkey < 1000),
        |     ords AS (SELECT o_custkey, count(*) AS n_orders FROM orders
        |              WHERE o_custkey >= 500 GROUP BY o_custkey)
        |SELECT coalesce(c_custkey, o_custkey) AS k, c_name, n_orders
        |FROM cust FULL OUTER JOIN ords ON c_custkey = o_custkey
        |ORDER BY k""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_cross" ->
      """SELECT r_name, n_name,
        |       CAST(r_regionkey = n_regionkey AS BIGINT) AS is_home
        |FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q_agg_argmax" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_best,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_worst
        |  FROM orders)
        |SELECT o_custkey,
        |       max(CASE WHEN rn_best = 1 THEN o_orderkey END) AS best_order,
        |       max(CASE WHEN rn_worst = 1 THEN o_orderkey END) AS worst_order,
        |       max(o_totalprice) AS best_price
        |FROM r GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_join_theta" ->
      """SELECT p1.p_size, count(*) AS n_pairs,
        |       CAST(sum(CAST(p2.p_retailprice - p1.p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_gap
        |FROM part p1 JOIN part p2
        |  ON p1.p_size = p2.p_size AND p1.p_retailprice < p2.p_retailprice
        |GROUP BY p1.p_size ORDER BY p1.p_size""".stripMargin,

    "q_join_asof" ->
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |         row_number() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |SELECT event_id, user_id, o_orderkey, epoch_ms(o_orderdate) AS order_date_ms
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q_join_asof_fwd" ->
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |         row_number() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts)
        |SELECT event_id, user_id, o_orderkey, epoch_ms(o_orderdate) AS order_date_ms
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q_join_asof_nearest" ->
      """WITH tl AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id,
        |         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT *,
        |         max(CASE WHEN kind = 0
        |                  THEN {'ct': t, 'cid': event_id} END) OVER (
        |           PARTITION BY user_id ORDER BY t, kind, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bb,
        |         min(CASE WHEN kind = 0
        |                  THEN {'ct': t, 'cid': event_id} END) OVER (
        |           PARTITION BY user_id ORDER BY t, kind, event_id
        |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fb
        |  FROM tl),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id, t, bb, fb,
        |         (bb IS NOT NULL AND (fb IS NULL
        |            OR t - bb.ct <= fb.ct - t)) AS pick_bwd
        |  FROM w WHERE kind = 1)
        |SELECT purchase_id, user_id,
        |       CASE WHEN pick_bwd THEN bb.cid ELSE fb.cid END AS click_id,
        |       CAST(CASE WHEN bb IS NULL AND fb IS NULL THEN NULL
        |                 WHEN pick_bwd THEN t - bb.ct
        |                 ELSE fb.ct - t END AS BIGINT) AS dt_us,
        |       CASE WHEN bb IS NULL AND fb IS NULL THEN NULL
        |            WHEN pick_bwd THEN 'backward' ELSE 'forward' END AS direction
        |FROM p ORDER BY purchase_id""".stripMargin,

    "q_join_asof_tolerance" ->
      s"""WITH tl AS (
         |  SELECT user_id, epoch_us(ts) AS t, event_id,
         |         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
         |  FROM events WHERE event_type IN ('click', 'purchase')),
         |w AS (
         |  SELECT *,
         |         max(CASE WHEN kind = 0
         |                  THEN {'ct': t, 'cid': event_id} END) OVER (
         |           PARTITION BY user_id ORDER BY t, kind, event_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bb
         |  FROM tl),
         |p AS (
         |  SELECT event_id AS purchase_id, user_id, t, bb,
         |         (bb IS NOT NULL AND t - bb.ct <= $AsofTolUs) AS matched
         |  FROM w WHERE kind = 1)
         |SELECT purchase_id, user_id,
         |       CAST(CASE WHEN matched THEN bb.cid END AS BIGINT) AS click_id,
         |       CAST(CASE WHEN matched THEN t - bb.ct END AS BIGINT) AS gap_us,
         |       matched
         |FROM p ORDER BY purchase_id""".stripMargin,

    "q_join_interval" ->
      """SELECT e1.user_id, count(*) AS n_pairs
        |FROM events e1 JOIN events e2
        |  ON e2.user_id = e1.user_id AND e2.event_id > e1.event_id
        | AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
        |GROUP BY e1.user_id ORDER BY e1.user_id""".stripMargin,

    // the plain band predicate — bucketing is pure execution shape (the
    // q_join_skew_salted precedent)
    "q_join_band" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events),
         |ck AS (SELECT user_id, t_us AS tc FROM ev WHERE event_type = 'click'),
         |pu AS (SELECT user_id, t_us AS tp FROM ev WHERE event_type = 'purchase'),
         |j AS (
         |  SELECT ck.user_id, ck.tc, pu.tp
         |  FROM ck JOIN pu ON pu.user_id = ck.user_id
         |  WHERE abs(pu.tp - ck.tc) <= $BandUs)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(min(tp - tc) AS BIGINT) AS min_gap_us,
         |       CAST(max(tp - tc) AS BIGINT) AS max_gap_us
         |FROM j GROUP BY user_id
         |ORDER BY n_pairs DESC, user_id LIMIT 200""".stripMargin
  )
}
