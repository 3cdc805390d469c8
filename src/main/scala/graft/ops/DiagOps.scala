package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ReplayableHash

/** Dataset-diagnostics operators (SURVEY §2B "LLM-pipeline extensions",
  * round 6): column profiling, heavy-hitter / skew analysis, robust-stats
  * outlier flagging, exact distributed winsorization, and time-series
  * gap-fill — the "understand and repair the data before training on it"
  * toolkit.
  *
  * Scale design (100 TB):
  *   - profiling is ONE pass: a Catalyst `stack` expand (4 rows per input
  *     row, column-pruned to the profiled columns) into a hash agg keyed by
  *     column name — never one job per column;
  *   - heavy hitters aggregate to #distinct-keys rows, take the top-k with
  *     TakeOrderedAndProject, and only the k survivors cross the one
  *     single-partition window (k rows, constant);
  *   - z-scores come from a broadcast per-group stats relation (exact
  *     DECIMAL moments surfaced as DOUBLE once — the §7.4 discipline);
  *   - winsorization needs per-group ORDER STATISTICS — the classic
  *     per-group-sort trap for a 5-value group key — and computes them with
  *     a value-bucketed histogram: cumulative counts over the per-bucket
  *     summary (rows = #occupied buckets) locate the target bucket, a local
  *     rank WITHIN that one bucket extracts the exact quantile value, and
  *     the per-group cut points broadcast back. No group ever sorts in one
  *     task (the segRanks/globalRowNumber shape, specialized to selection);
  *   - gap-fill generates the dense (group × hour) grid from a broadcast
  *     1-row range relation — grid size = #groups × #hours, independent of
  *     event count — and left-joins the per-bucket aggregates.
  */
object DiagOps extends QueryModule {

  /** Scaled-value bucket width for the winsorize histogram. */
  private val WinsorBucket = 4096L

  /** Micros per hour (gap-fill bucket). */
  private[graft] val HourUs = 3600000000L

  /** hi/lo split base for the 3rd/4th scaled-moment sums: each partial sum
    * stays below 2^53 at the oracle scales, so BOTH engines' (decimal →
    * double) conversions are EXACT — a single decimal sum above 2^64 is
    * NOT replayable (DuckDB converts the two int128 limbs separately,
    * off-by-ulps vs Spark's correctly-rounded BigDecimal path; found by
    * the round-6 hash gate). */
  private[graft] val MomentSplit = 1073741824L // 2^30

  /** q_profile_corr variable list: (short name, source column) over
    * lineitem's four measures, cents-quantized to exact BIGINTs. Sorted
    * by short name so the generated pair rows carry a total order. */
  private val corrVars: Seq[(String, String)] = Seq(
    "di" -> "l_discount", "ep" -> "l_extendedprice",
    "qt" -> "l_quantity", "tx" -> "l_tax")

  /** Unordered (a, b) pairs INCLUDING a=a — the self pairs are the
    * variance moments the r denominator reads. */
  private val corrSelfAndCross: Seq[(String, String)] =
    for (i <- corrVars.indices; j <- i until corrVars.length)
      yield (corrVars(i)._1, corrVars(j)._1)

  /** q_ts_forecast_naive shared projections over (n_scored, sae, se) —
    * MAE and signed bias back in value units, one IEEE division chain
    * each over exact BIGINT cent sums. private[graft]: the streaming twin
    * (StreamingForecastNaive.latestReport) evaluates the SAME strings so
    * the two reports cannot drift. */
  private[graft] val forecastFormulas: Seq[String] = Seq(
    "CAST(sae AS DOUBLE) / n_scored / 100 AS mae",
    "CAST(se AS DOUBLE) / n_scored / 100 AS bias")

  private def corrMoment(a: String, b: String): String =
    s"(m_${a}_${b}_hi * $MomentSplit.0 + m_${a}_${b}_lo)"

  /** Pearson r over the exact moments — ONE generated formula string per
    * pair, evaluated identically by both engines (numerator, then two
    * sqrt divisions, fixed order). */
  private def corrFormula(a: String, b: String): String =
    s"(n * ${corrMoment(a, b)} - s_$a * s_$b)" +
      s" / sqrt(n * ${corrMoment(a, a)} - s_$a * s_$a)" +
      s" / sqrt(n * ${corrMoment(b, b)} - s_$b * s_$b)"

  /** q_ts_acf: max lag of the correlogram. */
  private val AcfMaxLag = 5L

  /** q_ts_ewma: truncated-window length K — the smoother reads the K most
    * recent grid hours with geometric weights 2^(K-1-lag) (α = 1/2). */
  private val EwmaLags = 8L

  /** q_agg_countmin: sketch depth (rows — one [[ReplayableHash]] affine
    * hash each, salt 11) and width (columns per row). Shared with the
    * streaming twin (streaming.StreamingCountMin). */
  private[graft] val CmDepth = 4
  private[graft] val CmWidth = 512L

  /** q_agg_kmv_distinct: sketch capacity k — the estimator reads the k-th
    * smallest distinct hash value; 64 puts the fixture's 150-users-per-type
    * sf0.01 corpus in the ESTIMATOR branch (rsd ≈ 1/√62 ≈ 13 %) while
    * sf0.001's 15 users exercise the exact under-capacity branch. */
  private[graft] val KmvK = 64

  /** Shared seasonal-profile projections over (n, nt, svd, svtd) — ONE
    * formula set evaluated by both engines: per-(type, hour-of-day) event
    * share, mean value, and deviation from the type's overall mean.
    * svd/svtd are exact-DECIMAL sums surfaced as DOUBLE once (< 2^64
    * scaled — the replay rule); everything after is IEEE-exact division
    * and subtraction in a fixed order. */
  private val seasonalFormulas = Seq(
    "CAST(n AS DOUBLE) / nt AS share",
    "svd / n AS mean_v",
    "svd / n - svtd / nt AS dev_from_mean")

  /** Shared diversity projections over (n, sc2) — HHI concentration,
    * Gini impurity, and effective category count, each a fixed IEEE
    * division chain over exact BIGINTs. */
  private val diversityFormulas: Seq[String] = Seq(
    "CAST(sc2 AS DOUBLE) / n / n AS hhi",
    "CAST(1 AS DOUBLE) - CAST(sc2 AS DOUBLE) / n / n AS gini",
    "CAST(1 AS DOUBLE) / (CAST(sc2 AS DOUBLE) / n / n) AS effective_langs")

  /** Shared per-bucket chi-square term over (c1, c2, n1, n2) — the
    * two-sample homogeneity statistic's bucket contribution in the
    * algebraic form (c1·n2 − c2·n1)²/((c1+c2)·n1·n2). The BIGINT
    * difference stays < 2^53 (exact DOUBLE cast); the square and the
    * three divisions are IEEE-exact in a fixed order. Integer bound:
    * c·n < 2^63 up to ~3·10⁹ rows per half — beyond that pre-divide the
    * counts (the collocations scale rule). */
  private val driftTermExpr =
    "CAST(c1 * n2 - c2 * n1 AS DOUBLE) * CAST(c1 * n2 - c2 * n1 AS DOUBLE)" +
      " / CAST(c1 + c2 AS DOUBLE) / n1 / n2"

  /** Shared OLS-trend projections over (n, sxd, syd, sxxd, sxyd, syyhi,
    * syylo) — slope/intercept/r² of the hourly cent series against the
    * 0-based hour index. Every raw sum is an exact BIGINT < 2^53 (x ≤
    * #hours, x·k ≤ #hours · per-hour cents) surfaced as DOUBLE once —
    * EXCEPT Σk², which is hi/lo-split (div/% 2^30) like the acf second
    * moments; products like n·Σxy then happen in doubles (deterministic
    * IEEE, fixed order). Slope/intercept reported in dollars (/100). */
  private val trendFormulas: Seq[String] = {
    val syy = s"(syyhi * $MomentSplit.0 + syylo)"
    val num = "(n * sxyd - sxd * syd)"
    val den = "(n * sxxd - sxd * sxd)"
    val slope = s"$num / $den"
    Seq(
      s"$slope / 100.0 AS slope_per_hour",
      s"((syd - $slope * sxd) / n) / 100.0 AS intercept",
      s"CASE WHEN (n * $syy - syd * syd) > 0" +
        s" THEN $num * $num / ($den * (n * $syy - syd * syd)) END AS r2")
  }

  /** Shared changepoint projections over (s1d, n1, sd, n) — ONE formula
    * set: the between-segment sum-of-squares gain of splitting the hourly
    * cent series after a candidate hour (S1²/n1 + S2²/n2 − S²/n, the
    * two-segment least-squares criterion), plus the two segment means in
    * dollars. Cent sums stay < 2^53 ⇒ the DOUBLE casts are exact and the
    * multiply/divide chain is IEEE-exact in a fixed order. */
  private val cpGainExpr =
    "s1d * s1d / n1 + (sd - s1d) * (sd - s1d) / (n - n1) - sd * sd / n"
  private val changepointMeans: Seq[String] = Seq(
    "s1d / n1 / 100.0 AS mean_left",
    "(sd - s1d) / (n - n1) / 100.0 AS mean_right")

  /** Shared EWMA projection over (num, den) — ONE formula string evaluated
    * by both engines. num ≤ 255 × per-hour cent sum stays < 2^53 at any
    * recorded fixture scale, so the BIGINT→DOUBLE casts are exact; /100.0
    * restores dollars from cents. */
  private val ewmaFormula = "CAST(num AS DOUBLE) / den / 100.0 AS ewma"

  /** Shared ACF projection over (n, sx, sy, s{xx,yy,xy}{hi,lo}) — ONE
    * formula string evaluated by both engines (the momentFormulas
    * discipline), recombining the hi/lo-split second moments in doubles.
    * Declared AFTER [[MomentSplit]]: object vals initialize in order, and
    * a forward reference would bake 0 into the formula string. */
  private val acfFormula: Seq[String] = {
    val sxx = s"(sxxhi * $MomentSplit.0 + sxxlo)"
    val syy = s"(syyhi * $MomentSplit.0 + syylo)"
    val sxy = s"(sxyhi * $MomentSplit.0 + sxylo)"
    val den = s"(sqrt($sxx - sx * sx / n) * sqrt($syy - sy * sy / n))"
    Seq(s"CASE WHEN $den > 0 THEN ($sxy - sx * sy / n) / $den END AS acf")
  }

  /** q_ts_crosscorr: the identical Pearson-over-split-moments projection,
    * aliased for the cross-series output column (sharing the string keeps
    * the IEEE op sequence pinned to q_ts_acf's). */
  private val ccfFormula: Seq[String] =
    acfFormula.map(_.replace(" AS acf", " AS ccf"))

  /** The per-lag Pearson correlogram relation (event_type, lag_h, n, acf)
    * — the ONE implementation behind q_ts_acf and q_ts_pacf (r12). */
  private def acfRelOf(s: SparkSession, dir: String): DataFrame = {
    val ev = table(s, dir, "events")
      .withColumn("h", expr(s"unix_micros(ts) div $HourUs"))
    val rng = ev.agg(min("h").as("h0"), max("h").as("h1"))
    val grid = ev.select("event_type").distinct()
      .crossJoin(broadcast(rng))
      .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("h"))
    val actual = ev.groupBy("event_type", "h")
      .agg(dsum(col("value")).as("sv"))
    val g = grid.join(actual, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        expr("CAST(round(coalesce(sv, 0.0) * 100) AS BIGINT)").as("k"))
    // lag fan-out via explode on the bounded grid (5 rows per grid row)
    // — no broadcast-nested-loop join anywhere in the plan
    val pairs = g
      .withColumn("lag_h", explode(expr(
        s"sequence(CAST(1 AS BIGINT), CAST($AcfMaxLag AS BIGINT))")))
      .join(g.select(col("event_type").as("et2"), col("h").as("h2"),
        col("k").as("k2")),
        col("event_type") === col("et2") && col("h2") === col("h") - col("lag_h"))
      .select(col("event_type"), col("lag_h"), col("k").as("x"), col("k2").as("y"))
    val agg = pairs
      .withColumn("pxx", col("x") * col("x"))
      .withColumn("pyy", col("y") * col("y"))
      .withColumn("pxy", col("x") * col("y"))
      .groupBy("event_type", "lag_h")
      .agg(asLong(count(lit(1))).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(expr(s"pxx div $MomentSplit").cast("decimal(38,0)")).cast("double").as("sxxhi"),
        sum(expr(s"pxx % $MomentSplit").cast("decimal(38,0)")).cast("double").as("sxxlo"),
        sum(expr(s"pyy div $MomentSplit").cast("decimal(38,0)")).cast("double").as("syyhi"),
        sum(expr(s"pyy % $MomentSplit").cast("decimal(38,0)")).cast("double").as("syylo"),
        sum(expr(s"pxy div $MomentSplit").cast("decimal(38,0)")).cast("double").as("sxyhi"),
        sum(expr(s"pxy % $MomentSplit").cast("decimal(38,0)")).cast("double").as("sxylo"))
    agg.selectExpr(Seq("event_type", "lag_h", "n") ++ acfFormula: _*)
  }

  /** q_ts_pacf staged Durbin–Levinson projections (lags 1..3) — ONE text
    * per engine per stage; num2/den2 both contain the r1·phi11 product
    * but each engine evaluates the identical double op, so the values
    * coincide (the exact-integer-re-derivation rule's FP analog: same
    * inputs + same single op = same result). Zero denominators read 0. */
  /** The q_ts_acf / q_ts_pacf shared oracle chain — the per-lag Pearson
    * correlogram to `acfrel(event_type, lag_h, n, acf)` (one text, zero
    * drift; `g` reads twice inside → MATERIALIZED). */
  private lazy val acfCte: String =
    s"""e AS (
       |  SELECT event_type, epoch_us(ts) // $HourUs AS h, value FROM events),
       |r AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
       |g0 AS (
       |  SELECT t.event_type, unnest(generate_series(r.h0, r.h1)) AS h
       |  FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN r),
       |a AS (
       |  SELECT event_type, h,
       |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
       |  FROM e GROUP BY event_type, h),
       |g AS MATERIALIZED (
       |  SELECT g0.event_type, g0.h,
       |         CAST(round(COALESCE(a.sv, 0.0) * 100) AS BIGINT) AS k
       |  FROM g0 LEFT JOIN a USING (event_type, h)),
       |l AS (SELECT unnest(generate_series(1, $AcfMaxLag)) AS lag_h),
       |p AS (
       |  SELECT x.event_type, l.lag_h, x.k AS x, y.k AS y
       |  FROM g x CROSS JOIN l
       |  JOIN g y ON y.event_type = x.event_type AND y.h = x.h - l.lag_h),
       |m AS (
       |  SELECT event_type, CAST(lag_h AS BIGINT) AS lag_h,
       |         CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(x) AS DOUBLE) AS sx,
       |         CAST(sum(y) AS DOUBLE) AS sy,
       |         CAST(sum(CAST((x * x) // $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS sxxhi,
       |         CAST(sum(CAST((x * x) % $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS sxxlo,
       |         CAST(sum(CAST((y * y) // $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS syyhi,
       |         CAST(sum(CAST((y * y) % $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS syylo,
       |         CAST(sum(CAST((x * y) // $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS sxyhi,
       |         CAST(sum(CAST((x * y) % $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS sxylo
       |  FROM p GROUP BY event_type, lag_h),
       |acfrel AS (
       |  SELECT event_type, lag_h, n,
       |         ${acfFormula.mkString(",\n         ")}
       |  FROM m)""".stripMargin

  private[graft] val pacfStage1: String = "r1 AS phi11"
  private[graft] val pacfStage2: Seq[String] = Seq(
    "CAST(1 AS DOUBLE) - r1 * phi11 AS den2",
    "r2 - r1 * phi11 AS num2")
  private[graft] val pacfStage3: String =
    "CASE WHEN den2 <> CAST(0 AS DOUBLE) THEN num2 / den2" +
      " ELSE CAST(0 AS DOUBLE) END AS phi22"
  private[graft] val pacfStage4: String =
    "phi11 - phi22 * phi11 AS phi21"
  private[graft] val pacfStage5: Seq[String] = Seq(
    "(r3 - phi21 * r2) - phi22 * r1 AS num3",
    "(CAST(1 AS DOUBLE) - phi21 * r1) - phi22 * r2 AS den3")
  private[graft] val pacfStage6: String =
    "CASE WHEN den3 <> CAST(0 AS DOUBLE) THEN num3 / den3" +
      " ELSE CAST(0 AS DOUBLE) END AS phi33"

  /** q_ts_bollinger rolling window, in hourly grid rows. */
  private[graft] val BollWindow = 24

  /** q_profile_fd column sweep over lineitem: 4 integral keys + 2 enums.
    * (name, engine BIGINT-digest expr, oracle raw expr). No DOUBLE
    * columns — engine digests must be injective on the observed domain
    * and free of cross-engine double→string formatting; enum strings go
    * through text_full_hash (injective on ≤3 fixed values), ints ride
    * raw. The oracle counts distinct RAW values — equal by injectivity. */
  private val FdCols: Seq[(String, String)] = Seq(
    "l_linenumber" -> "CAST(l_linenumber AS BIGINT)",
    "l_linestatus" -> "text_full_hash(l_linestatus)",
    "l_orderkey" -> "l_orderkey",
    "l_partkey" -> "l_partkey",
    "l_returnflag" -> "text_full_hash(l_returnflag)",
    "l_suppkey" -> "l_suppkey")

  private val FdPairs: Seq[(Int, Int)] =
    for (i <- FdCols.indices; j <- i + 1 until FdCols.length) yield (i, j)

  /** q_profile_benford expected shares: log10(1 + 1/d) computed ONCE at
    * code-gen time and embedded as shortest-round-trip double literals —
    * both engines parse the identical text to the identical double (no
    * runtime libm anywhere). */
  private val BenfordShares: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  /** Benford report over a (first_digit, n) count relation — the SINGLE
    * implementation behind q_profile_benford and
    * [[graft.streaming.StreamingBenford]].report (r12 twin discipline:
    * shared body). The count relation is value-domain-bounded (≤9 rows
    * forever), so both broadcasts are legal at any corpus size. */
  private[graft] def benfordReport(digits: DataFrame): DataFrame = {
    val s = digits.sparkSession
    import s.implicits._
    val tot = digits.agg(asLong(sum(col("n"))).as("total"))
    val exp9 = BenfordShares.toDF("first_digit", "benford_share")
    exp9.join(broadcast(digits), Seq("first_digit"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .select(col("first_digit"), asLong(col("n")).as("n"),
        (col("n").cast("double") / col("total")).as("share"),
        col("benford_share"),
        abs(col("n").cast("double") / col("total") - col("benford_share"))
          .as("abs_dev"))
      .orderBy("first_digit")
  }

  /** Scan-side first-digit projection over an o_totalprice-bearing frame
    * (shared by the batch key and the streaming twin's input builder). */
  private[graft] def firstDigitCol: Column = expr(
    "CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING), 1, 1) AS INT)")

  /** Gapfilled hourly cent grid over events — the acf/ewma/crosscorr
    * grid, factored out (r12) so q_ts_bollinger, its streaming twin's
    * parity harness, and future grid consumers share ONE builder:
    * (event_type, h, k) with k = round(Σvalue · 100), zeros for silent
    * hours, one row per (type, hour) across the corpus time span. */
  private[graft] def hourlyCentGrid(s: SparkSession, dir: String): DataFrame = {
    val ev = table(s, dir, "events")
      .withColumn("h", expr(s"unix_micros(ts) div $HourUs"))
    gridOf(ev.groupBy("event_type", "h").agg(dsum(col("value")).as("sv")))
  }

  /** The grid assembly behind [[hourlyCentGrid]], factored (r12c3) over
    * any per-hour relation `(event_type, h, sv DOUBLE)` so the streaming
    * twin's state-table read induces the IDENTICAL zero-filled cent grid
    * (StreamingPeriodogram.report). Same ops, same round, same types. */
  private[graft] def gridOf(hourly: DataFrame): DataFrame = {
    val rng = hourly.agg(min("h").as("h0"), max("h").as("h1"))
    val grid = hourly.select("event_type").distinct()
      .crossJoin(broadcast(rng))
      .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("h"))
    grid.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        expr("CAST(round(coalesce(sv, 0.0) * 100) AS BIGINT)").as("k"))
  }

  /** DuckDB replay of [[hourlyCentGrid]] — the zero-filled hourly cent
    * grid `g(event_type, h, k)` shared by the Bollinger and Mann-Kendall
    * oracles (ONE text, zero drift). `g` is MATERIALIZED: the MK twin
    * reads it three times (both pair sides + the tie histogram). */
  private[graft] val centGridCte: String =
    s"""e AS (
       |  SELECT event_type, epoch_us(ts) // $HourUs AS h, value FROM events),
       |r AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
       |g0 AS (
       |  SELECT t.event_type, unnest(generate_series(r.h0, r.h1)) AS h
       |  FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN r),
       |a AS (
       |  SELECT event_type, h,
       |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
       |  FROM e GROUP BY event_type, h),
       |g AS MATERIALIZED (
       |  SELECT g0.event_type, g0.h,
       |         CAST(round(COALESCE(a.sv, 0.0) * 100) AS BIGINT) AS k
       |  FROM g0 LEFT JOIN a USING (event_type, h))""".stripMargin

  /** q_ts_anova: the 24-term SSB sum as an EXPLICIT left-associated
    * addition chain over pivoted per-hour columns — an ordered
    * cumulative WINDOW does not replay here (DuckDB's windowed sum is
    * segment-tree pairwise, not sequential; measured last-ulp drift at
    * sf0.1), so the fixed order is pinned the bm25 way: conditional-max
    * pivot + one shared formula string. coalesce-to-+0.0 is
    * addition-neutral (terms are ≥ 0). */
  private val anovaSumTerm: String =
    (0 until 24).map(h => s"coalesce(t$h, CAST(0 AS DOUBLE))")
      .mkString(" + ")

  /** Shared Mann-Kendall projections: the normalized Z over (s, vnum)
    * and the verdict over z — STAGED as named columns (the abtest
    * discipline: no subexpression is re-derived), every op an IEEE
    * +,−,×,/ or sqrt in a fixed order; the 1.96 critical value is an
    * e0-exponent literal so BOTH engines parse it as DOUBLE via strtod
    * (a bare decimal literal takes the limb-wise decimal→double path —
    * the q_profile_benford rule). */
  private[graft] val mkZFormula: String =
    "CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1) / sqrt(CAST(vnum AS DOUBLE) / CAST(18 AS DOUBLE))" +
      " WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1) / sqrt(CAST(vnum AS DOUBLE) / CAST(18 AS DOUBLE))" +
      " ELSE CAST(0 AS DOUBLE) END AS z"
  private[graft] val mkTrendFormula: String =
    "CASE WHEN z > 1.96e0 THEN 'increasing'" +
      " WHEN z < -1.96e0 THEN 'decreasing' ELSE 'none' END AS trend"

  /** Shared Wald–Wolfowitz runs-test projections over
    * (n, n_above, n_below, n_runs) — STAGED named columns, one formula
    * text per engine (the mkZFormula discipline). The `2·n_above·n_below`
    * factor appears twice TEXTUALLY but is exact BIGINT arithmetic, so
    * re-derivation is safe (the no-re-derive rule is about FP
    * subexpressions); every FP op is an IEEE +,−,×,/ or sqrt in a fixed
    * left-associated order. */
  private[graft] val runsEFormula: String =
    "CAST(1 AS DOUBLE) + CAST(2 * n_above * n_below AS DOUBLE) / CAST(n AS DOUBLE) AS e_runs"
  private[graft] val runsVFormula: String =
    "CAST(2 * n_above * n_below AS DOUBLE) * CAST(2 * n_above * n_below - n AS DOUBLE)" +
      " / CAST(n AS DOUBLE) / CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS var_runs"
  private[graft] val runsZFormula: String =
    "CASE WHEN var_runs > CAST(0 AS DOUBLE)" +
      " THEN (CAST(n_runs AS DOUBLE) - e_runs) / sqrt(var_runs)" +
      " ELSE CAST(0 AS DOUBLE) END AS z"
  private[graft] val runsVerdictFormula: String =
    "CASE WHEN z < -1.96e0 THEN 'clustered'" +
      " WHEN z > 1.96e0 THEN 'oscillating' ELSE 'random' END AS verdict"

  /** q_ts_ljung_box: the portmanteau Q statistic over the shared
    * correlogram — Q = N(N+2)·Σ_{k≤5} ρ_k²/(N−k), with N−k exactly the
    * pair count n_k acfRelOf already carries and N = n_1 + 1. The 5-term
    * sum is an EXPLICIT left-associated chain (the anova pivot rule — an
    * unordered sum of doubles does not replay), each term two ops on a
    * column read once. The 0.05 critical value for df=5 enters as an
    * e0-exponent literal (the benford strtod rule). */
  private[graft] val lbQFormula: String =
    "CAST(n_obs AS DOUBLE) * CAST(n_obs + 2 AS DOUBLE) * (" +
      (1 to 5).map(k => s"r$k * r$k / CAST(n$k AS DOUBLE)")
        .mkString(" + ") + ") AS q_stat"
  private[graft] val lbVerdictFormula: String =
    "q_stat > 11.0705e0 AS white_noise_rejected"

  /** q_ts_periodogram: integer-quantized DFT tables. For each probed
    * period p and residue r ∈ [0, p): cr = round(cos(2πr/p)·2^16),
    * sr = round(sin(2πr/p)·2^16) — BIGINT literals GENERATED from this one
    * constant set into both engines (the ReplayableHash discipline), so
    * neither engine calls libm and no strtod surface exists at query time.
    * Quantization error ~2^-16 relative on the spectral estimate — a
    * declared trade, same spirit as the ilog2 quanta entropy. */
  private[graft] val DftQ = 65536L
  private[graft] val DftPeriods = Seq(24, 168)
  private[graft] val dftTable: Seq[(Int, Int, Long, Long)] =
    DftPeriods.flatMap { p =>
      (0 until p).map { r =>
        val th = 2.0 * math.Pi * r / p
        (p, r, math.round(math.cos(th) * DftQ), math.round(math.sin(th) * DftQ))
      }
    }
  private[graft] val dftTableSql: String =
    dftTable.map { case (p, r, c, sn) => s"($p, $r, $c, $sn)" }.mkString(", ")

  /** Staged periodogram readout over (asum, bsum, n_hours) — ONE formula
    * text per engine, each op a single IEEE division / multiply in fixed
    * left-associated order. asum/bsum are exact integers (|Σ cr·d| ≤
    * 2^16 · Σ|d| with d = n·s_r − cnt_r·T; ~1.1e17 at sf0.1 — below 2^53
    * is NOT required: BIGINT→DOUBLE casts are correctly rounded in both
    * engines, and the oracle funnels its HUGEINT sum through CAST(… AS
    * BIGINT), which ERRORS loudly past 2^63 — documented bound,
    * hi/lo-split (the q_agg_skew rule) if a corpus ever approaches it). */
  /** q_ts_perm_entropy: ordinal-pattern id of the hour-ordered triple
    * (a, b, c) = (lag2, lag1, current) under the (value, position)
    * lexicographic total order (ties rank the EARLIER hour lower — the
    * standard stable treatment, so the id is always one of the 6 valid
    * permutations). rank(x) = #elements strictly before x in that order;
    * id = ra·9 + rb·3 + rc — pure integer CASE sums, ONE formula text in
    * both engines. */
  private[graft] val permPatternFormula: String =
    "(CASE WHEN b < a THEN 1 ELSE 0 END + CASE WHEN c < a THEN 1 ELSE 0 END) * 9" +
      " + (CASE WHEN a <= b THEN 1 ELSE 0 END + CASE WHEN c < b THEN 1 ELSE 0 END) * 3" +
      " + (CASE WHEN a <= c THEN 1 ELSE 0 END + CASE WHEN b <= c THEN 1 ELSE 0 END)" +
      " AS pid"

  /** The six valid (pattern name, id) pairs under [[permPatternFormula]]'s
    * ra·9+rb·3+rc encoding — 012 means a<b<c (ascending). */
  private[graft] val permPatterns: Seq[(String, Int)] = Seq(
    "012" -> 5, "021" -> 7, "102" -> 11, "120" -> 15, "201" -> 19, "210" -> 21)

  private[graft] val dftAFormula: String =
    s"CAST(asum AS DOUBLE) / CAST($DftQ AS DOUBLE) / CAST(n_hours AS DOUBLE) AS a_dft"
  private[graft] val dftBFormula: String =
    s"CAST(bsum AS DOUBLE) / CAST($DftQ AS DOUBLE) / CAST(n_hours AS DOUBLE) AS b_dft"
  private[graft] val dftPowerFormula: String =
    "a_dft * a_dft + b_dft * b_dft AS power"

  /** The q_ts_periodogram body over any zero-filled cent grid
    * `(event_type, h, k)` — factored (r12c3) so the batch key and the
    * streaming twin's state-table read share ONE implementation
    * (StreamingPeriodogram.report; the forecastFormulas twin-body
    * rule). */
  private[graft] def periodogramOf(grid: DataFrame): DataFrame = {
    val s = grid.sparkSession
    import s.implicits._
    val g = grid.localCheckpoint(true)
    val st = g.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"), sum("k").as("t"))
    val res = g
      .select(col("event_type"), col("h"), col("k"),
        explode(array(DftPeriods.map(p => lit(p)): _*)).as("period"))
      .groupBy(col("event_type"), col("period"),
        expr("h % period").as("r"))
      .agg(sum("k").as("sk"), count(lit(1)).as("cnt"))
    val tab = dftTable.toDF("period", "r", "cr", "sr")
    res.join(broadcast(st), "event_type")
      .withColumn("d", expr("n_hours * sk - cnt * t"))
      // r13 (advisor note): Σ cr·d runs in BIGINT on the engine side
      // while the DuckDB twin funnels HUGEINT through a final BIGINT
      // cast — an overflow regime must fail loudly in BOTH engines, not
      // only the oracle. |Σ cr·d| ≤ period·2^16·max|d|, so the per-row
      // bound below keeps every partial sum in range; ANSI already
      // throws on the n·sk product itself. If a corpus ever trips this,
      // hi/lo-split the basis sums (the q_agg_skew rule).
      .where(coalesce(assert_true(
        expr(s"abs(d) <= ${Long.MaxValue}L div (65536L * ${DftPeriods.max})"),
        lit("periodogram guard: demeaned residue sum too large — " +
          "Σ cr·d could exceed 2^63; hi/lo-split the basis sums")),
        lit(true)))
      .join(broadcast(tab), Seq("period", "r"))
      .groupBy("event_type", "period")
      .agg(asLong(max("n_hours")).as("n_hours"),
        sum(expr("cr * d")).as("asum"),
        sum(expr("sr * d")).as("bsum"))
      .selectExpr("event_type", "CAST(period AS BIGINT) AS period",
        "n_hours", "asum", "bsum")
      .selectExpr("event_type", "period", "n_hours", dftAFormula,
        dftBFormula)
      .selectExpr("event_type", "period", "n_hours", "a_dft", "b_dft",
        dftPowerFormula)
      .orderBy("event_type", "period")
  }

  /** Shared Bollinger projections over (k, n, s1, s2hi, s2lo) — ONE
    * formula set in both engines: window mean/σ from exact hi/lo-split
    * BIGINT moments (the q_agg_skew split), sample variance clamped at 0
    * (an all-equal window's exact-zero variance can land a few ulps
    * negative in DOUBLE — without the clamp sqrt would emit NaN), bands
    * at ±2σ, breakout as the band comparison on the cent scale. Every
    * op is an IEEE +,−,×,/ or sqrt in a fixed order; /100 surfaces cents
    * as value units last. */
  private[graft] val bollFormulas: Seq[String] = {
    val s2d = s"(CAST(s2hi AS DOUBLE) * $MomentSplit.0 + CAST(s2lo AS DOUBLE))"
    val mean = "(CAST(s1 AS DOUBLE) / n)"
    val varc = s"(($s2d - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1))"
    val sd = s"(sqrt(greatest($varc, CAST(0 AS DOUBLE))))"
    Seq(
      "CAST(k AS DOUBLE) / 100 AS value",
      s"$mean / 100 AS mean_val",
      s"$sd / 100 AS sd_val",
      s"($mean + 2 * $sd) / 100 AS upper_band",
      s"($mean - 2 * $sd) / 100 AS lower_band",
      s"(k > $mean + 2 * $sd OR k < $mean - 2 * $sd) AS breakout")
  }

  /** Shared skew/kurtosis projections over (n, s1d, s2d, s3hid, s3lod,
    * s4aad, s4abd, s4bbd) — ONE formula string evaluated by both engines
    * (Spark selectExpr and the DuckDB oracle), so the IEEE op sequence
    * cannot drift between them. The 4th moment is never computed as a
    * single k2² product (k2 ≤ ~3.2e9 at sf0.1 ⇒ k2² > 2^63, an ERROR in
    * DuckDB and a silent wrap in Spark): k2 = a·2^16 + b splits it into
    * three in-range partial sums recombined in doubles. */
  private val momentFormulas: Seq[String] = {
    val s3d = s"(s3hid * $MomentSplit.0 + s3lod)"
    val s4d = "(s4aad * 4294967296.0 + s4abd * 65536.0 + s4bbd)"
    val m = "(s1d / n)"
    val m2 = s"(s2d / n - $m * $m)"
    val m3 = s"($s3d / n - 3.0 * $m * (s2d / n) + 2.0 * $m * $m * $m)"
    val m4 = s"($s4d / n - 4.0 * $m * ($s3d / n) + 6.0 * $m * $m * (s2d / n)" +
      s" - 3.0 * $m * $m * $m * $m)"
    Seq(
      s"$m3 / ($m2 * sqrt($m2)) AS skewness",
      s"$m4 / ($m2 * $m2) - 3.0 AS excess_kurtosis")
  }

  /** Per-(event_type) exact p05/p95 cut points via bucketed rank selection.
    * Both engines agree exactly: the k-th order statistic of `value` equals
    * the k-th order statistic of the exact scaled long `round(value*100)`
    * (2-dec money fixture), and ties inside a bucket cannot change the
    * selected VALUE. Rank targets are ceil(p·n) in pure integer math. */
  private def winsorCuts(ev: DataFrame,
      cacheKey: Option[String] = None): DataFrame =
    valueAtRanks(ev, "event_type", "value", nRel =>
      nRel.select(col("event_type"), explode(array(
        struct(lit("p05").as("which"), expr("(n + 19) div 20").as("rank")),
        struct(lit("p95").as("which"), expr("(19 * n + 19) div 20").as("rank"))))
        .as("t"))
        .select(col("event_type"), col("t.which").as("which"),
          col("t.rank").as("rank")), cacheKey)._1
      .groupBy("event_type")
      .agg(min(when(col("which") === "p05", col("value"))).as("p05"),
        min(when(col("which") === "p95", col("value"))).as("p95"))

  /** Generalized bucketed ORDER-STATISTIC selection: for each (group,
    * named 1-based rank) row in `ranks`, return the rank-th smallest
    * `valueCol` of that group. The value must be exact at 2 decimals
    * (`round(v*100)` is an exact long key — the fixture money/quantity
    * discipline). TWO histogram levels, NO row-level window anywhere:
    * a per-(group, 4096-wide bucket) histogram (rows = #occupied buckets)
    * locates each target bucket via cumulative counts, then a per-EXACT-KEY
    * histogram WITHIN the target buckets (≤ 4096 keys per bucket — a
    * second bounded window) locates the key whose cumulative count crosses
    * the local rank. Ties share a key, so key-level counts determine the
    * order statistic exactly — a row-level rank would sort a whole bucket
    * in one task, which for a DENSE value domain (l_quantity's 50 distinct
    * values all land in one bucket) means sorting nearly the whole group.
    * Returns (selection (grpCol, which, value), count relation (grpCol, n))
    * — the count leaf rides along so callers' rank formulas and final
    * interpolation joins never re-aggregate (see [[valueAtRanks]]). */
  /** Session-lifetime memo of the (key histogram, per-group counts) pair
    * per corpus content digest — the same index-reuse rationale as
    * LlmOps.candidateIndexFor / CurationOps.dupClustersFor: the key
    * histogram is the only full-input pass of the selection, is reused by
    * every rank lookup over the same (fixture, group, value) spec, and at
    * toy scale its build dominated the query (the round-6 2.2 s
    * q_agg_percentile was mostly this one job repeated per invocation). */
  private val rankHistCache = new java.util.concurrent.ConcurrentHashMap[
    String, (DataFrame, DataFrame, DataFrame)]()

  private[graft] def clearIndexCache(): Unit = {
    rankHistCache.clear()
    dblRankCache.clear()
  }

  private[graft] def valueAtRanks(df: DataFrame, grpCol: String,
      valueCol: String, mkRanks: DataFrame => DataFrame,
      cacheKey: Option[String] = None): (DataFrame, DataFrame) = {
    // ONE pass over the data: the key-level histogram (rows = #distinct
    // (group, value) pairs, value-domain-bounded) is the only full-input
    // aggregation. The bucket histogram (with its cumulative offsets) is
    // its own compact checkpoint — it is scanned by every consumer job,
    // and re-aggregating it from the (much larger) kh leaf per call
    // measured 2× slower warm (round 8). The per-group count relation is
    // the one LAZY derivation: a #groups-row aggregation of the tiny h
    // leaf, cheaper to recompute inside consumers than the fixed job
    // latency its own localCheckpoint paid on every cold build (3
    // sequential materialize jobs → 2, measured round 8). `value` is
    // functionally determined by the key (min() is just the projection).
    // The memoized index serves every rank lookup over the same (fixture,
    // group, value) spec with ONE remaining per-call job (targets join +
    // in-bucket selection).
    def build(): (DataFrame, DataFrame, DataFrame) = {
      val kh = df
        .withColumn("_vr_key", round(col(valueCol) * 100).cast("long"))
        .groupBy(col(grpCol), col("_vr_key"))
        .agg(count(lit(1)).as("_vr_kcnt"), min(col(valueCol)).as("value"))
        .withColumn("_vr_bucket", expr(s"_vr_key div $WinsorBucket"))
        .localCheckpoint(true)
      val wOff = Window.partitionBy(grpCol).orderBy("_vr_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val h = kh.groupBy(grpCol, "_vr_bucket")
        .agg(sum("_vr_kcnt").as("_vr_cnt"))
        .withColumn("_vr_prev", coalesce(sum("_vr_cnt").over(wOff), lit(0L)))
        .localCheckpoint(true)
      val n = h.groupBy(grpCol).agg(sum("_vr_cnt").as("n"))
      (kh, h, n)
    }
    val (keyHist, hist, nRel) = cacheKey match {
      case Some(k) =>
        val full = System.identityHashCode(
          df.sparkSession.sparkContext).toString + "|" + k
        rankHistCache.computeIfAbsent(full, _ => build())
      case None => build()
    }
    // hist aggregates an RDD leaf (unknown stats propagate up): without
    // the hint this tiny join plans as a sort-merge with exchanges over
    // two index-sized frames. Any extra columns mkRanks attaches beyond
    // (grp, which, rank) ride through to the selection output — callers
    // carry their per-group counts along instead of re-joining them after
    // (one fewer broadcast job per call).
    val ranks = mkRanks(nRel)
    val extras = ranks.columns.toSeq
      .filterNot(Set(grpCol, "which", "rank"))
    val targets = ranks.join(broadcast(hist), grpCol)
      .where(col("_vr_prev") < col("rank")
        && col("_vr_prev") + col("_vr_cnt") >= col("rank"))
      .select(col(grpCol) +: col("_vr_bucket") +: col("which") +:
        (col("rank") - col("_vr_prev")).as("_vr_local") +:
        extras.map(col): _*)
    val wKey = Window.partitionBy(grpCol, "_vr_bucket", "which")
      .orderBy("_vr_key").rowsBetween(Window.unboundedPreceding, -1)
    val sel = keyHist.join(broadcast(targets), Seq(grpCol, "_vr_bucket"))
      .withColumn("_vr_kprev", coalesce(sum("_vr_kcnt").over(wKey), lit(0L)))
      .where(col("_vr_kprev") < col("_vr_local")
        && col("_vr_kprev") + col("_vr_kcnt") >= col("_vr_local"))
      .select(col(grpCol) +: col("which") +: col("value") +:
        extras.map(col): _*)
    (sel, nRel)
  }

  /** [[valueAtRanks]] for ARBITRARY doubles — order statistics over the
    * order-preserving IEEE bit key (`double_order_key`,
    * [[graft.functions.NumericKeys.orderKey]]). valueAtRanks needs a
    * value that is exact at 2 decimals (its bucket key is
    * `round(v*100)`); a derived double (a slope, a ratio) has no such
    * grid, and bucketing it by any fixed-width numeric interval leaves
    * the in-bucket distinct-value count unbounded. The bit key fixes
    * both: it is INJECTIVE on doubles and its four 16-bit digits are
    * each DOMAIN-bounded (≤ 65536 values), which makes a distributed
    * GLOBAL PREFIX COUNT computable with every window bounded: gprev(k)
    * = #elements with key < k telescopes over the radix tree as
    * prev₁(d₁) + prev₂(d₁,d₂) + prev₃(d₁..d₃) + prev₄(d₁..d₄), where
    * each prevᵢ is a cumulative count over the DISTINCT values of digit
    * dᵢ within one prefix cell — ≤ 65536 rows per window partition at
    * ANY data size, keys uniform (never the 5-partition row-level sort
    * this replaced). The augmented histogram (one row per distinct
    * (group, value) with gprev attached) is built ONCE (memoized per
    * corpus digest when `cacheKey` is given — the valueAtRanks
    * rankHistCache pattern), and then ANY rank lookup is a single
    * broadcast-join filter over the leaf: gprev < rank ≤ gprev + cnt
    * selects the rank-th smallest VALUE exactly (ties share a bit key).
    * Same contract as [[valueAtRanks]]: `mkRanks(nRel)` returns (grp,
    * which, rank [, extras]) rows with 1-based ranks, extras ride
    * through; returns (selection, count relation). */
  private val dblRankCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private[graft] def doubleValueAtRanks(df: DataFrame, grpCol: String,
      valueCol: String, mkRanks: DataFrame => DataFrame,
      cacheKey: Option[String] = None): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    def build(): DataFrame = {
      // digits: d1 is the SIGNED top 16 bits (arithmetic shift keeps the
      // long order), d2..d4 are unsigned 16-bit slices — each monotone
      // within its prefix, together a lossless radix decomposition
      val kh = df
        .withColumn("_dv_key", call_function("double_order_key", col(valueCol)))
        .groupBy(col(grpCol), col("_dv_key"))
        .agg(count(lit(1)).as("_dv_cnt"), min(col(valueCol)).as("value"))
        .withColumn("_dv_d1", expr("shiftright(_dv_key, 48)"))
        .withColumn("_dv_d2", expr("shiftright(_dv_key, 32) & 65535"))
        .withColumn("_dv_d3", expr("shiftright(_dv_key, 16) & 65535"))
        .withColumn("_dv_d4", expr("_dv_key & 65535"))
      def prevOver(h: DataFrame, part: Seq[String], digit: String,
          cnt: String, out: String): DataFrame =
        h.withColumn(out, coalesce(
          sum(cnt).over(Window.partitionBy(part.map(col): _*)
            .orderBy(digit).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      // per-level digit histograms: aggregation BEFORE each window caps
      // the partition at the 16-bit digit domain (a window straight over
      // kh partitioned by a prefix would be unbounded when values
      // concentrate in one cell — the degenerate-corpus axis)
      val h1 = prevOver(
        kh.groupBy(col(grpCol), col("_dv_d1")).agg(sum("_dv_cnt").as("_c1")),
        Seq(grpCol), "_dv_d1", "_c1", "_p1")
      val h2 = prevOver(
        kh.groupBy(col(grpCol), col("_dv_d1"), col("_dv_d2"))
          .agg(sum("_dv_cnt").as("_c2")),
        Seq(grpCol, "_dv_d1"), "_dv_d2", "_c2", "_p2")
      val h3 = prevOver(
        kh.groupBy(col(grpCol), col("_dv_d1"), col("_dv_d2"), col("_dv_d3"))
          .agg(sum("_dv_cnt").as("_c3")),
        Seq(grpCol, "_dv_d1", "_dv_d2"), "_dv_d3", "_c3", "_p3")
      // p4 lives on kh itself: keys are distinct, so within a (grp, 48-bit
      // prefix) cell the d4 values are distinct — ≤ 65536 rows/partition
      val k4 = prevOver(kh, Seq(grpCol, "_dv_d1", "_dv_d2", "_dv_d3"),
        "_dv_d4", "_dv_cnt", "_p4")
      // h1 is domain-bounded (≤ 65536 digits per group — the simhash 2^16
      // broadcast rule); h2/h3 are prefix-cell histograms, unbounded in
      // the worst case, so they join SHUFFLED on uniform digest-prefix
      // keys (never broadcast — the dup_clusters rule)
      k4.join(broadcast(h1.drop("_c1")), Seq(grpCol, "_dv_d1"))
        .join(h2.drop("_c2"), Seq(grpCol, "_dv_d1", "_dv_d2"))
        .join(h3.drop("_c3"), Seq(grpCol, "_dv_d1", "_dv_d2", "_dv_d3"))
        .select(col(grpCol), col("value"), col("_dv_cnt"),
          (col("_p1") + col("_p2") + col("_p3") + col("_p4")).as("_dv_gprev"))
        .localCheckpoint(true)
    }
    val akh = cacheKey match {
      case Some(k) =>
        val full = System.identityHashCode(
          df.sparkSession.sparkContext).toString + "|" + k
        dblRankCache.computeIfAbsent(full, _ => build())
      case None => build()
    }
    val nRel = akh.groupBy(grpCol).agg(sum("_dv_cnt").as("n"))
    val ranks = mkRanks(nRel)
    val extras = ranks.columns.toSeq.filterNot(Set(grpCol, "which", "rank"))
    val sel = akh.join(broadcast(ranks), grpCol)
      .where(col("_dv_gprev") < col("rank")
        && col("_dv_gprev") + col("_dv_cnt") >= col("rank"))
      .select(col(grpCol) +: col("which") +: col("value") +:
        extras.map(col): _*)
    (sel, nRel)
  }

  /** Winsorized copy of an (event_id, event_type, value) frame — the
    * q_win_winsorize primitive, exposed for [[graft.Pipelines]]. Pass a
    * corpus-content `cacheKey` to memoize the cut-point histogram across
    * invocations (fixture-backed callers); ad-hoc frames leave it None. */
  private[graft] def winsorize(ev: DataFrame,
      cacheKey: Option[String] = None): DataFrame =
    ev.join(broadcast(winsorCuts(ev, cacheKey)), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        least(greatest(col("value"), col("p05")), col("p95")).as("value_w"))

  def queries: Seq[(String, Q)] = Seq(
    // Column profiling of `orders` in ONE scan: a stack-expand to
    // (col_name, value) rows feeding a single hash agg — row count, null
    // count, distinct count, min/max per column. Numeric and date columns
    // project onto DOUBLE (all values < 2^53, so the projection is exact);
    // a per-column-job formulation would scan the table once per column.
    // Frequent-values profile (r12): the data-profiler staple next to
    // q_profile_table's numeric summary — top-3 values with share for
    // each categorical column, stacked through one scan (stack() fans
    // the row to (col_name, val) pairs map-side, no union of per-column
    // scans). The rank/total windows run over the (column, value)
    // relation, bounded by the VALUE DOMAINS (3 statuses × 5 priorities
    // here), never over corpus rows.
    "q_profile_freq" -> ((s: SparkSession, dir: String) => {
      val st = table(s, dir, "orders")
        .selectExpr("stack(2, 'o_orderstatus', o_orderstatus," +
          " 'o_orderpriority', o_orderpriority) AS (col_name, val)")
        .groupBy("col_name", "val").agg(count(lit(1)).as("n"))
      st.withColumn("tot", sum(col("n")).over(
          Window.partitionBy("col_name")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("col_name").orderBy(desc("n"), asc("val"))))
        .where(col("rk") <= 3)
        .select(col("col_name"), asLong(col("rk")).as("rk"), col("val"),
          asLong(col("n")).as("n"),
          (col("n").cast("double") / col("tot")).as("share"))
        .orderBy("col_name", "rk")
    }),

    "q_profile_table" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "orders")
        .select(expr(
          """stack(4,
            |  'o_orderkey', CAST(o_orderkey AS DOUBLE),
            |  'o_custkey', CAST(o_custkey AS DOUBLE),
            |  'o_totalprice', o_totalprice,
            |  'o_orderdate_ms', CAST(unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS DOUBLE)
            |) AS (col_name, v)""".stripMargin))
        .groupBy("col_name")
        .agg(asLong(count(lit(1))).as("n_rows"),
          asLong(sum(when(col("v").isNull, 1L).otherwise(0L))).as("n_nulls"),
          asLong(count_distinct(col("v"))).as("n_distinct"),
          min("v").as("min_v"), max("v").as("max_v"))
        .orderBy("col_name")),

    // Per-source diversity profile of the document corpus: language-
    // distribution concentration (HHI = Σ(cᵢ/n)², its Gini-impurity
    // complement, and the effective language count 1/HHI) — the balance
    // diagnostic of a training-mix report. Gini/HHI replace Shannon
    // entropy BY DESIGN: ln is libm-dependent and would not replay (the
    // bm25 idf rule); HHI is the standard log-free concentration measure.
    // Two chained hash aggs (source×lang, then source); Σcᵢ² stays
    // < 2^63 up to ~3·10⁹ docs per (source, lang); one IEEE division
    // chain per row via a shared formula set.
    "q_agg_diversity" -> ((s: SparkSession, dir: String) => {
      val cl = table(s, dir, "documents")
        .groupBy("source", "lang").agg(count(lit(1)).as("c"))
      cl.groupBy("source")
        .agg(sum(col("c")).as("n"),
          asLong(count(lit(1))).as("n_langs"),
          sum(col("c") * col("c")).as("sc2"))
        .selectExpr(Seq("source", "CAST(n AS BIGINT) AS n", "n_langs")
          ++ diversityFormulas: _*)
        .orderBy("source")
    }),

    // Referential-integrity audit across the star schema — the
    // expectation-suite pass a pipeline runs before trusting joins: per
    // (child, fk, parent) edge, child rows, orphan rows (no matching
    // parent key), and the orphan rate. Each edge is ONE left-anti join
    // on the fk (shuffle on the key, parent side pre-collapsed to its
    // DISTINCT keys — O(#parent-keys) rows); the four audited edges union
    // to a 4-row report. Orphan counts are exact BIGINTs; the rate is a
    // single IEEE division.
    "q_profile_integrity" -> ((s: SparkSession, dir: String) => {
      val li = table(s, dir, "lineitem")
      integrityEdge(li, "l_orderkey", table(s, dir, "orders"), "o_orderkey",
          "lineitem->orders")
        .union(integrityEdge(li, "l_partkey", table(s, dir, "part"),
          "p_partkey", "lineitem->part"))
        .union(integrityEdge(li, "l_suppkey", table(s, dir, "supplier"),
          "s_suppkey", "lineitem->supplier"))
        .union(integrityEdge(table(s, dir, "orders"), "o_custkey",
          table(s, dir, "customer"), "c_custkey", "orders->customer"))
        .orderBy("fk_edge")
    }),

    // Heavy-hitter / skew diagnosis on lineitem.l_partkey: top-20 keys by
    // frequency with share and cumulative share of the table. The count
    // relation is a hash agg (#distinct keys rows), top-k is
    // TakeOrderedAndProject, and the cumulative sum runs over exactly 20
    // rows — exact BIGINT cumulation, shares as single IEEE divisions.
    "q_agg_heavy_hitters" -> ((s: SparkSession, dir: String) => {
      val li = table(s, dir, "lineitem")
      val tot = li.agg(count(lit(1)).as("n_total"))
      val top = li.groupBy("l_partkey").agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), asc("l_partkey")).limit(20)
      val wCum = Window.orderBy(desc("c"), asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top.crossJoin(broadcast(tot))
        .withColumn("cum_c", sum("c").over(wCum))
        .select(col("l_partkey"), col("c"),
          (col("c").cast("double") / col("n_total")).as("share"),
          asLong(col("cum_c")).as("cum_c"),
          (col("cum_c").cast("double") / col("n_total")).as("cum_share"))
        .orderBy(desc("c"), asc("l_partkey"))
    }),

    // Per-event-type z-score outliers: moments accumulate as exact DECIMAL
    // (value is exact at 2 decimals, its square exact at 8), surface as
    // DOUBLE once, then mean/var/std/z are a fixed sequence of
    // correctly-rounded IEEE ops — identical on both engines. The 5-row
    // stats relation broadcasts back onto the scan; outliers are |z| > 2.5.
    "q_agg_zscore_outlier" -> ((s: SparkSession, dir: String) => {
      val ev = table(s, dir, "events")
      val dec = col("value").cast("decimal(18,4)")
      val stats = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec).cast("double").as("s1d"),
          sum(dec * dec).cast("double").as("s2d"))
        .withColumn("mean", col("s1d") / col("n"))
        .withColumn("std",
          sqrt(col("s2d") / col("n") - (col("s1d") / col("n")) * (col("s1d") / col("n"))))
        .select("event_type", "mean", "std")
      ev.join(broadcast(stats), "event_type")
        .withColumn("z", (col("value") - col("mean")) / col("std"))
        .where(abs(col("z")) > 2.5)
        .select(col("event_id"), col("event_type"), col("value"), col("z"))
        .orderBy("event_id")
    }),

    // Exact distributed winsorization: clamp each event's value into its
    // type's [p05, p95] — cut points from the bucketed-histogram selection
    // in [[winsorCuts]] (no per-group single-task sort), broadcast back.
    "q_win_winsorize" -> ((s: SparkSession, dir: String) =>
      winsorize(table(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value")),
        Some("winsor-events|" +
          SourceSinkOps.fixtureKey(dir, "events.parquet")))
        .orderBy("event_id")),

    // Distribution-shape profiling: exact skewness and excess kurtosis per
    // event_type from integer-scaled moment sums. The scaled value
    // k = round(value·100) is an exact long; Σk and Σk² stay in BIGINT,
    // Σk³ and Σk⁴ accumulate as DECIMAL(38,0) (k³ ≈ 1.2e14 per row
    // overflows BIGINT in aggregate; DuckDB BIGINT overflow is an ERROR —
    // the §7.4 bound). The raw→central-moment expansion and the two
    // dimensionless ratios are ONE shared formula string evaluated by both
    // engines (identical op sequence ⇒ identical doubles; the 100× scale
    // factor cancels algebraically and both engines compute the same
    // residual). Map-side-combinable hash agg — one pass, no window.
    "q_agg_skew" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "events")
        .withColumn("k", round(col("value") * 100).cast("long"))
        .withColumn("k2", col("k") * col("k"))
        .withColumn("k3", col("k2") * col("k")) // ≤ ~1.8e14, exact long
        .withColumn("a", expr("k2 div 65536"))
        .withColumn("b", expr("k2 % 65536"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("double").as("s1d"),
          sum(col("k2")).cast("double").as("s2d"),
          sum(expr(s"k3 div $MomentSplit").cast("decimal(38,0)"))
            .cast("double").as("s3hid"),
          sum(expr(s"k3 % $MomentSplit").cast("decimal(38,0)"))
            .cast("double").as("s3lod"),
          sum((col("a") * col("a")).cast("decimal(38,0)"))
            .cast("double").as("s4aad"),
          sum((lit(2L) * col("a") * col("b")).cast("decimal(38,0)"))
            .cast("double").as("s4abd"),
          sum((col("b") * col("b")).cast("decimal(38,0)"))
            .cast("double").as("s4bbd"))
        .selectExpr(Seq("event_type", "CAST(n AS BIGINT) AS n") ++
          momentFormulas: _*)
        .orderBy("event_type")),

    // Time-series gap-fill: dense per-(event_type, hour) activity over the
    // corpus' full hour range — absent buckets surface as explicit zero
    // rows (the resample step before any windowed time-series model). The
    // hour range is a broadcast 1-row relation; the grid explodes to
    // #types × #hours rows regardless of event count.
    "q_ts_gapfill" -> ((s: SparkSession, dir: String) => {
      val ev = table(s, dir, "events")
        .withColumn("h", expr(s"unix_micros(ts) div $HourUs"))
      val rng = ev.agg(min("h").as("h0"), max("h").as("h1"))
      val grid = ev.select("event_type").distinct()
        .crossJoin(broadcast(rng))
        .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("h"))
      val actual = ev.groupBy("event_type", "h")
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sv"))
      grid.join(actual, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h").as("hour_idx"),
          coalesce(col("cnt"), lit(0L)).as("n_events"),
          coalesce(col("sv"), lit(0.0)).as("total_value"))
        .orderBy("event_type", "hour_idx")
    }),

    // Gap INTERPOLATION: the q_ts_gapfill grid with linear interpolation
    // between the bracketing observed hours instead of zero-fill — the
    // resampling step before a time-series feature join. The bracketing
    // lookups are two IGNORE NULLS window passes over the GRID relation,
    // whose row count is time-span × #event-types bounded (NOT corpus-
    // bounded): the per-type window never funnels event rows through one
    // task — the corpus collapsed in the hash agg first. Interpolation
    // arithmetic is an int-ratio double division, one multiply, one add —
    // each IEEE-exact-rounded, composed in the same order in both engines,
    // over exact DECIMAL→DOUBLE hour sums (< 2^53, replayable).
    "q_ts_interpolate" -> ((s: SparkSession, dir: String) => {
      val ev = table(s, dir, "events")
        .withColumn("h", expr(s"unix_micros(ts) div $HourUs"))
      val rng = ev.agg(min("h").as("h0"), max("h").as("h1"))
      val grid = ev.select("event_type").distinct()
        .crossJoin(broadcast(rng))
        .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("h"))
      val actual = ev.groupBy("event_type", "h")
        .agg(dsum(col("value")).as("sv"))
      val wPrev = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(actual, Seq("event_type", "h"), "left")
        .withColumn("prev_v", last(col("sv"), ignoreNulls = true).over(wPrev))
        .withColumn("prev_h",
          last(when(col("sv").isNotNull, col("h")), ignoreNulls = true).over(wPrev))
        .withColumn("next_v", first(col("sv"), ignoreNulls = true).over(wNext))
        .withColumn("next_h",
          first(when(col("sv").isNotNull, col("h")), ignoreNulls = true).over(wNext))
        .select(col("event_type"), col("h").as("hour_idx"),
          col("sv").isNotNull.as("observed"),
          when(col("sv").isNotNull, col("sv"))
            .when(col("prev_v").isNull, col("next_v"))
            .when(col("next_v").isNull, col("prev_v"))
            .otherwise(col("prev_v") + (col("next_v") - col("prev_v"))
              * ((col("h") - col("prev_h")).cast("double")
                / (col("next_h") - col("prev_h"))))
            .as("value_interp"))
        .orderBy("event_type", "hour_idx")
    }),

    // Sample autocorrelation (correlogram) of the hourly value series per
    // event type, lags 1..5 — the seasonality/trend diagnostic read before
    // any time-series feature join. Series = the ZERO-FILLED gapfill grid
    // (lags are ill-defined over missing hours), so every window/join runs
    // over the time-span-bounded grid, never event rows. Replay: hourly
    // sums are exact 2-dec values ⇒ k = round(v·100) is an exact integer;
    // lag pairs come from a grid self-join on (type, h−lag) (identical in
    // both engines — no lag() asymmetry); second moments are hi/lo-split
    // (div/% 2^30) DECIMAL(38,0) partial sums so each surfaces < 2^53
    // (the q_agg_skew replay rule — a single sum would exceed 2^64 and
    // diverge in ulps), recombined in ONE shared formula string evaluated
    // by both engines. Bound: per-hour cent sums must stay < 3.03e9
    // (|x·y| < 2^63) — ~$30M/hour at 2 decimals, 10^4× the ×10 fixture.
    "q_ts_acf" -> ((s: SparkSession, dir: String) =>
      acfRelOf(s, dir).orderBy("event_type", "lag_h")),

    // Partial autocorrelation (r12): Durbin–Levinson unrolled to lag 3
    // over the SAME per-lag Pearson r's as q_ts_acf (acfRelOf is the one
    // implementation) — each recursion level a STAGED named column in a
    // fixed IEEE order (the abtest/pValueStages discipline; the shared
    // pacfStageN strings keep the twins drift-free), zero-denominator
    // guards read 0. The AR-order readout next to acf's raw correlogram:
    // pacf cutting off after lag p is the classic AR(p) signature.
    "q_ts_pacf" -> ((s: SparkSession, dir: String) => {
      val piv = acfRelOf(s, dir).groupBy("event_type")
        .agg(max(when(col("lag_h") === 1, col("acf"))).as("r1"),
          max(when(col("lag_h") === 2, col("acf"))).as("r2"),
          max(when(col("lag_h") === 3, col("acf"))).as("r3"))
      val base = Seq("event_type", "r1", "r2", "r3")
      piv
        .selectExpr(base :+ pacfStage1: _*)
        .selectExpr(base ++ Seq("phi11") ++ pacfStage2: _*)
        .selectExpr(base ++ Seq("phi11", "den2", "num2") :+ pacfStage3: _*)
        .selectExpr(base ++ Seq("phi11", "phi22") :+ pacfStage4: _*)
        .selectExpr(base ++ Seq("phi11", "phi22", "phi21") ++ pacfStage5: _*)
        .selectExpr(base ++ Seq("phi11", "phi22", "num3", "den3")
          :+ pacfStage6: _*)
        .selectExpr(base ++ Seq("phi11 AS pacf1", "phi22 AS pacf2",
          "phi33 AS pacf3"): _*)
        .orderBy("event_type")
    }),

    // Ljung–Box portmanteau test (r12c3): the "is anything left in the
    // residuals" white-noise read over the SAME per-lag Pearson
    // correlogram as q_ts_acf/q_ts_pacf (acfRelOf is the one
    // implementation; the oracle composes the shared acfCte — one text,
    // zero drift). Q = N(N+2)·Σ ρ_k²/(N−k) with N−k the pair counts the
    // correlogram already carries; the 5-term sum is an explicit
    // left-associated chain (lbQFormula) and the df=5 verdict compares
    // against the 11.0705 χ² literal. Everything after the memoized
    // grid aggs is a ≤#types pivot.
    "q_ts_ljung_box" -> ((s: SparkSession, dir: String) => {
      val aggs = (1 to 5).flatMap(k => Seq(
        max(when(col("lag_h") === k, col("acf"))).as(s"r$k"),
        asLong(max(when(col("lag_h") === k, col("n")))).as(s"n$k")))
      val piv = acfRelOf(s, dir).groupBy("event_type")
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("n_obs", expr("n1 + 1"))
      val base = Seq("event_type", "n_obs") ++ (1 to 5).map(k => s"r$k") ++
        (1 to 5).map(k => s"n$k")
      piv
        .selectExpr(base :+ lbQFormula: _*)
        .selectExpr(Seq("event_type", "CAST(n_obs AS BIGINT) AS n_obs",
          "q_stat") :+ lbVerdictFormula: _*)
        .orderBy("event_type")
    }),

    // Benford first-digit audit (r12) — the fraud/synthetic-data
    // profiling read next to q_profile_drift: observed first-digit
    // shares of the cent-quantized order totals vs the Benford
    // expectation, per-digit deviation. Replay: the first digit comes
    // from the INTEGER-string cast of the cent BIGINT (integers format
    // identically across engines — never a double format or a runtime
    // log10; the expected shares are code-gen-time literals). Scale: one
    // map-side-combinable hash agg to ≤9 rows; the share denominator is
    // a window over that digit-bounded relation.
    "q_profile_benford" -> ((s: SparkSession, dir: String) =>
      benfordReport(table(s, dir, "orders")
        .select(firstDigitCol.as("first_digit"))
        .where(col("first_digit").between(1, 9))
        .groupBy("first_digit").agg(count(lit(1)).as("n")))),

    // Functional-dependency + candidate-key discovery (r12) — the
    // profiling sweep next to q_profile_table/corr: for every unordered
    // column pair over lineitem's discrete columns, distinct counts of
    // each side and of the pair, FD verdicts both ways (A→B holds iff
    // |distinct(A)| = |distinct(A,B)| — the TANE/level-1 rule) and
    // candidate-key flags (nd = row count). Scale: TWO exchanges total —
    // a 6-way single-value explode and a 15-way pair explode, both
    // carrying (tag, digest) longs only, each collapsing through
    // distinct→count hash aggs; the assembly joins are over ≤15-row
    // relations (column-count-bounded constants — legal broadcasts).
    "q_profile_fd" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val base = table(s, dir, "lineitem").selectExpr(
        FdCols.map { case (nm, e) => s"$e AS $nm" }: _*)
      val nRel = base.agg(asLong(count(lit(1))).as("n_rows"))
      val singles = base.select(explode(array(FdCols.map { case (nm, _) =>
          struct(lit(nm).as("c"), col(nm).as("v")) }: _*)).as("x"))
        .select("x.c", "x.v").distinct()
        .groupBy("c").agg(asLong(count(lit(1))).as("nd"))
      val pairRel = base.select(explode(array(FdPairs.map { case (i, j) =>
          struct(lit(s"${FdCols(i)._1}|${FdCols(j)._1}").as("p"),
            col(FdCols(i)._1).as("va"), col(FdCols(j)._1).as("vb")) }: _*)).as("x"))
        .select("x.p", "x.va", "x.vb").distinct()
        .groupBy("p").agg(asLong(count(lit(1))).as("nd_ab"))
      val defs = FdPairs.map { case (i, j) =>
        (s"${FdCols(i)._1}|${FdCols(j)._1}", FdCols(i)._1, FdCols(j)._1)
      }.toDF("p", "col_a", "col_b")
      defs.join(broadcast(pairRel), "p")
        .join(broadcast(singles.toDF("col_a", "nd_a")), "col_a")
        .join(broadcast(singles.toDF("col_b", "nd_b")), "col_b")
        .crossJoin(broadcast(nRel))
        .select(col("col_a"), col("col_b"), col("n_rows"),
          col("nd_a"), col("nd_b"), col("nd_ab"),
          (col("nd_ab") === col("nd_a")).as("fd_a_to_b"),
          (col("nd_ab") === col("nd_b")).as("fd_b_to_a"),
          (col("nd_a") === col("n_rows")).as("key_a"),
          (col("nd_b") === col("n_rows")).as("key_b"))
        .orderBy("col_a", "col_b")
    }),

    // Bollinger bands (r12) — the rolling-volatility read next to
    // q_ts_ewma's level smoothing: per (type, hour) the 24-hour rolling
    // mean ± 2σ and a breakout flag, over the SAME gapfilled hourly
    // cent-quantized grid as acf/ewma (zeros for silent hours, so the
    // ROWS-24 frame is a true 24-HOUR window). Exact replay: the frame
    // sums cents and hi/lo-split squared cents as BIGINTs (the
    // q_agg_skew split — each partial < 2^57 even at 2^41-cent hourly
    // sums), then ONE shared formula set evaluates mean/σ/bands in a
    // fixed IEEE order. Scale: the grid is time-span-bounded and the
    // per-type window runs over GRID rows, never events (the ewma/acf
    // axis); only full windows emit (n = 24).
    "q_ts_bollinger" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.expressions.Window
      val g = hourlyCentGrid(s, dir)
      val win = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(-(BollWindow - 1), 0)
      g.withColumn("n", count(lit(1)).over(win))
        .withColumn("s1", sum(col("k")).over(win))
        .withColumn("s2hi", sum(expr(s"(k * k) div $MomentSplit")).over(win))
        .withColumn("s2lo", sum(expr(s"(k * k) % $MomentSplit")).over(win))
        .where(col("n") === BollWindow)
        .selectExpr(Seq("event_type", "h AS hour") ++ bollFormulas: _*)
        .orderBy("event_type", "hour")
    }),

    // Lagged cross-correlation between event-type series (r11) — the
    // lead/lag coupling signal ("do clicks lead purchases?") a metrics
    // pipeline reads off a correlogram. Same hourly cent-quantized grid
    // and hi/lo-split exact moments as q_ts_acf, but pairing DISTINCT
    // series: ccf(a, b, lag) correlates k_a(h) with k_b(h − lag) for lags
    // 0..5 (ordered pairs — ccf is asymmetric). Scale: the grid is
    // time-domain-bounded (#types × #hours, corpus-INDEPENDENT), the
    // pair fan-out is an equi join on the lagged hour over that bounded
    // grid, and the moment agg reduces to ≤ types² × lags rows.
    "q_ts_crosscorr" -> ((s: SparkSession, dir: String) => {
      val ev = table(s, dir, "events")
        .withColumn("h", expr(s"unix_micros(ts) div $HourUs"))
      val rng = ev.agg(min("h").as("h0"), max("h").as("h1"))
      val grid = ev.select("event_type").distinct()
        .crossJoin(broadcast(rng))
        .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("h"))
      val actual = ev.groupBy("event_type", "h")
        .agg(dsum(col("value")).as("sv"))
      val g = grid.join(actual, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          expr("CAST(round(coalesce(sv, 0.0) * 100) AS BIGINT)").as("k"))
      val pairs = g
        .withColumn("lag_h", explode(expr(
          s"sequence(CAST(0 AS BIGINT), CAST($AcfMaxLag AS BIGINT))")))
        .join(g.select(col("event_type").as("et_b"), col("h").as("h2"),
          col("k").as("k2")),
          col("h2") === col("h") - col("lag_h"))
        .where(col("event_type") =!= col("et_b"))
        .select(col("event_type").as("et_a"), col("et_b"), col("lag_h"),
          col("k").as("x"), col("k2").as("y"))
      val agg = pairs
        .withColumn("pxx", col("x") * col("x"))
        .withColumn("pyy", col("y") * col("y"))
        .withColumn("pxy", col("x") * col("y"))
        .groupBy("et_a", "et_b", "lag_h")
        .agg(asLong(count(lit(1))).as("n"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum(expr(s"pxx div $MomentSplit").cast("decimal(38,0)")).cast("double").as("sxxhi"),
          sum(expr(s"pxx % $MomentSplit").cast("decimal(38,0)")).cast("double").as("sxxlo"),
          sum(expr(s"pyy div $MomentSplit").cast("decimal(38,0)")).cast("double").as("syyhi"),
          sum(expr(s"pyy % $MomentSplit").cast("decimal(38,0)")).cast("double").as("syylo"),
          sum(expr(s"pxy div $MomentSplit").cast("decimal(38,0)")).cast("double").as("sxyhi"),
          sum(expr(s"pxy % $MomentSplit").cast("decimal(38,0)")).cast("double").as("sxylo"))
      agg.selectExpr(Seq("et_a", "et_b", "lag_h", "n") ++ ccfFormula: _*)
        .orderBy("et_a", "et_b", "lag_h")
    }),

    // OHLC downsampling bars: per (event_type, hour) the open/high/low/
    // close/volume summary a time-series feature store serves. PURE
    // AGGREGATION — no window, no row shuffle: open/close are min_by/
    // max_by over a packed (epoch_us, event_id) integer order key, so the
    // whole query is one map-side-combinable hash agg whose shuffle
    // carries #groups partial rows, never events. Replay: the pack is
    // epoch_us · 10^19 + event_id (unique — event_id is the PK; 10^19 >
    // any int64, so the sum is injective), DECIMAL(38,0) on Spark ≡
    // HUGEINT in DuckDB (max ~1.7e34, exact in both); high/low compare
    // raw doubles, volume is the exact-DECIMAL dsum.
    "q_ts_ohlc" -> ((s: SparkSession, dir: String) => {
      table(s, dir, "events")
        .withColumn("h", expr(s"unix_micros(ts) div $HourUs"))
        .withColumn("okey", expr(
          "CAST(unix_micros(ts) AS DECIMAL(38,0)) * 10000000000000000000BD" +
            " + CAST(event_id AS DECIMAL(38,0))"))
        .groupBy("event_type", "h")
        .agg(
          asLong(count(lit(1))).as("n_events"),
          expr("min_by(value, okey)").as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          expr("max_by(value, okey)").as("close"),
          dsum(col("value")).as("volume"))
        .select(col("event_type"), asLong(col("h")).as("hour_idx"),
          col("n_events"), col("open"), col("high"), col("low"),
          col("close"), col("volume"))
        .orderBy("event_type", "hour_idx")
    }),

    // Candlestick pattern scan (r12) over the hourly OHLC bars — the
    // rule-based sequential-pattern read next to q_ts_ohlc's raw bars:
    // three-white-soldiers (three consecutive up bars with strictly
    // rising closes) and bullish engulfing (an up bar whose CENT body
    // spans the prior down bar's). All comparisons run on cent BIGINTs
    // (the raw-double bars would hand the flags to FP equality), bars
    // pair by CONSECUTIVE-BAR lag in hour order (declared: empty hours
    // produce no bar and do not break a pattern), and the okey
    // DECIMAL(38) order key is the ohlc precedent (HUGEINT in the twin,
    // never reaches the output schema). Windows run over the
    // span-bounded bar relation; the report is one ≤#types rollup.
    "q_ts_candles" -> ((s: SparkSession, dir: String) => {
      val bars = table(s, dir, "events")
        .withColumn("h", expr(s"unix_micros(ts) div $HourUs"))
        .withColumn("c", expr("CAST(round(value * 100) AS BIGINT)"))
        .withColumn("okey", expr(
          "CAST(unix_micros(ts) AS DECIMAL(38,0)) * 10000000000000000000BD" +
            " + CAST(event_id AS DECIMAL(38,0))"))
        .groupBy("event_type", "h")
        .agg(expr("min_by(c, okey)").as("oc"),
          expr("max_by(c, okey)").as("cc"))
      val w = Window.partitionBy("event_type").orderBy("h")
      bars
        .withColumn("up", col("cc") > col("oc"))
        .withColumn("up1", lag("up", 1).over(w))
        .withColumn("up2", lag("up", 2).over(w))
        .withColumn("cc1", lag("cc", 1).over(w))
        .withColumn("cc2", lag("cc", 2).over(w))
        .withColumn("oc1", lag("oc", 1).over(w))
        .withColumn("tws", col("up") && col("up1") && col("up2") &&
          col("cc") > col("cc1") && col("cc1") > col("cc2"))
        .withColumn("eng", col("up") && !col("up1") &&
          col("oc") <= col("cc1") && col("cc") >= col("oc1"))
        .groupBy("event_type")
        .agg(asLong(count(lit(1))).as("n_bars"),
          asLong(sum(when(col("up"), 1L).otherwise(0L))).as("n_up"),
          asLong(sum(when(col("tws"), 1L).otherwise(0L))).as("n_three_white"),
          asLong(sum(when(col("eng"), 1L).otherwise(0L))).as("n_engulf"),
          asLong(coalesce(max(when(col("tws"), col("h"))), lit(-1L)))
            .as("last_three_white"),
          asLong(coalesce(max(when(col("eng"), col("h"))), lit(-1L)))
            .as("last_engulf"))
        .orderBy("event_type")
    }),

    // Integer-quantized periodogram (r12c3): DFT spectral power of the
    // demeaned zero-filled hourly cent series per event type at the
    // daily (24 h) and weekly (168 h) candidate periods — the
    // seasonality-STRENGTH readout next to q_ts_seasonal's profile and
    // q_ts_acf's correlogram. cos/sin enter as GENERATED 2^16-scaled
    // BIGINT literals (dftTable — no libm, no strtod), and because the
    // basis is residue-periodic the per-hour sum collapses to residue
    // classes: a = Σ_r cr·d_r with d_r = n·s_r − cnt_r·T exactly the
    // n-scaled demeaned class sum — ALL integer until the three staged
    // readout ops. FP addition order never matters (integer sums are
    // order-free — the anova pivot exists because ITS terms are doubles).
    // Scale: one grid pass fanned ×|periods| into a ≤ #types·Σp residue
    // agg; the stats join is a broadcast ≤#types relation off an RDD
    // leaf (explicit, r7 rule); the literal table broadcasts 192 rows.
    "q_ts_periodogram" -> ((s: SparkSession, dir: String) =>
      periodogramOf(hourlyCentGrid(s, dir))),

    // Permutation entropy (r12c3, Bandt–Pompe 2002 shape): ordinal
    // 3-patterns of consecutive hourly cent totals per event type — the
    // model-free complexity readout next to the correlogram (a periodic
    // or trending series concentrates a few patterns; noise spreads all
    // six). Ties rank the earlier hour lower (permPatternFormula — one
    // integer CASE text in both engines, always a valid permutation),
    // counts per pattern pivot into ONE row per type, and the entropy is
    // the exact ilog2 QUANTA form H_q = n·ilog2(n) − Σ c·ilog2(c) (the
    // source_mi machinery; only exact-replay pins are safe for quanta —
    // the r11 order-relation caution). max_share is one int/int IEEE
    // division. Scale: lag windows run over the span-bounded grid (the
    // acf exemption class); everything after is ≤ #types·6 rows.
    "q_ts_perm_entropy" -> ((s: SparkSession, dir: String) => {
      val g = hourlyCentGrid(s, dir)
      val w = Window.partitionBy("event_type").orderBy("h")
      val pid = g
        .withColumn("a", lag("k", 2).over(w))
        .withColumn("b", lag("k", 1).over(w))
        .withColumn("c", col("k"))
        .where(col("a").isNotNull)
        .selectExpr("event_type", permPatternFormula)
      val byPat = pid.groupBy("event_type", "pid")
        .agg(count(lit(1)).as("cnt"))
      def ilog2(c: org.apache.spark.sql.Column) = length(bin(c)) - 1
      val aggs = permPatterns.map { case (nm, id) =>
        asLong(coalesce(max(when(col("pid") === id, col("cnt"))),
          lit(0L))).as(s"c$nm")
      } ++ Seq(
        asLong(sum(col("cnt") * ilog2(col("cnt")))).as("spart"),
        asLong(max("cnt")).as("cmax"))
      byPat.groupBy("event_type")
        .agg(asLong(sum("cnt")).as("n_triples"), aggs: _*)
        .selectExpr("event_type", "n_triples", "c012", "c021", "c102",
          "c120", "c201", "c210",
          "n_triples * (length(bin(n_triples)) - 1) - spart AS hq_perm",
          "CAST(cmax AS DOUBLE) / CAST(n_triples AS DOUBLE) AS max_share")
        .orderBy("event_type")
    }),

    // Truncated EWMA smoothing of the zero-filled hourly value series per
    // event type — the trend/denoise pass before anomaly thresholds or
    // forecast features. Window = the K=8 most recent grid hours with
    // geometric weights 2^(K-1-lag) (α = 1/2), renormalized over the lags
    // actually present near the series start (standard adjusted-EWMA). All
    // joins/windows run over the time-span-bounded grid (the q_ts_acf
    // shape), never event rows. Replay: cent values and power-of-two
    // weights are exact integers; num = Σ w·k ≤ 255 × per-hour cent sum
    // < 2^53 ⇒ the final DOUBLE casts and the shared division formula are
    // IEEE-exact in both engines.
    "q_ts_ewma" -> ((s: SparkSession, dir: String) =>
      ewmaSmooth(table(s, dir, "events"))),

    // Linear trend per event type: OLS slope/intercept/r² of the
    // zero-filled hourly cent series against the hour index — with
    // q_ts_seasonal and q_ts_changepoint this completes the classic
    // trend + seasonal + shift decomposition reads. All sums ride the
    // time-span-bounded grid and stay exact BIGINTs < 2^53 (Σk² hi/lo-
    // split like the acf moments); slope algebra runs in doubles through
    // ONE shared formula set.
    "q_ts_trend" -> ((s: SparkSession, dir: String) => {
      val ev = table(s, dir, "events")
        .withColumn("h", expr(s"unix_micros(ts) div $HourUs"))
      val rng = ev.agg(min("h").as("h0"), max("h").as("h1"))
      val grid = ev.select("event_type").distinct()
        .crossJoin(broadcast(rng))
        .select(col("event_type"), col("h0"),
          explode(expr("sequence(h0, h1)")).as("h"))
      val actual = ev.groupBy("event_type", "h")
        .agg(dsum(col("value")).as("sv"))
      val g = grid.join(actual, Seq("event_type", "h"), "left")
        .select(col("event_type"), (col("h") - col("h0")).as("x"),
          expr("CAST(round(coalesce(sv, 0.0) * 100) AS BIGINT)").as("k"))
      g.withColumn("k2", col("k") * col("k"))
        .groupBy("event_type")
        .agg(asLong(count(lit(1))).as("n"),
          sum(col("x")).cast("double").as("sxd"),
          sum(col("k")).cast("double").as("syd"),
          sum(col("x") * col("x")).cast("double").as("sxxd"),
          sum(col("x") * col("k")).cast("double").as("sxyd"),
          sum(expr(s"k2 div $MomentSplit").cast("decimal(38,0)"))
            .cast("double").as("syyhi"),
          sum(expr(s"k2 % $MomentSplit").cast("decimal(38,0)"))
            .cast("double").as("syylo"))
        .selectExpr(Seq("event_type", "n") ++ trendFormulas: _*)
        .orderBy("event_type")
    }),

    // Seasonal-naive forecast backtest per event type (r10) — the
    // completion of the ts family: forecast(h) = value(h − 24) on the
    // zero-filled hourly cent grid (daily period), scored over every
    // hour with a 24-h-old observation. MAE and signed bias accumulate
    // as exact BIGINT cents (one IEEE division each at the end), the lag
    // rides a per-type window over the time-span-bounded grid (the
    // interpolate precedent: partitions hold #hours rows, never corpus
    // rows). The honest baseline every fancier forecaster must beat —
    // and the operator a pipeline runs to decide if it needs one.
    "q_ts_forecast_naive" -> ((s: SparkSession, dir: String) => {
      val ev = table(s, dir, "events")
        .withColumn("h", expr(s"unix_micros(ts) div $HourUs"))
      val rng = ev.agg(min("h").as("h0"), max("h").as("h1"))
      val grid = ev.select("event_type").distinct()
        .crossJoin(broadcast(rng))
        .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("h"))
      val actual = ev.groupBy("event_type", "h")
        .agg(dsum(col("value")).as("sv"))
      val g = grid.join(actual, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          expr("CAST(round(coalesce(sv, 0.0) * 100) AS BIGINT)").as("k"))
      val w = Window.partitionBy("event_type").orderBy("h")
      g.withColumn("f", lag("k", 24).over(w))
        .where(col("f").isNotNull)
        .groupBy("event_type")
        .agg(asLong(count(lit(1))).as("n_scored"),
          asLong(sum(expr("abs(k - f)"))).as("sae"),
          asLong(sum(expr("k - f"))).as("se"))
        .selectExpr(Seq("event_type", "n_scored") ++ forecastFormulas: _*)
        .orderBy("event_type")
    }),

    // Single changepoint detection per event type: the hour whose split
    // maximizes the two-segment least-squares gain over the zero-filled
    // hourly cent series (the classic mean-shift detector, exact — no
    // iteration). Every window runs over the time-span-bounded grid (the
    // interpolate precedent: per-type partitions hold #hours rows, never
    // corpus rows); the prefix sums, totals, and argmax rank all ride the
    // grid; the gain evaluates through ONE shared formula set and the
    // argmax tie-breaks on the hour, so selection replays exactly.
    "q_ts_changepoint" -> ((s: SparkSession, dir: String) => {
      val ev = table(s, dir, "events")
        .withColumn("h", expr(s"unix_micros(ts) div $HourUs"))
      val rng = ev.agg(min("h").as("h0"), max("h").as("h1"))
      val grid = ev.select("event_type").distinct()
        .crossJoin(broadcast(rng))
        .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("h"))
      val actual = ev.groupBy("event_type", "h")
        .agg(dsum(col("value")).as("sv"))
      val g = grid.join(actual, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          expr("CAST(round(coalesce(sv, 0.0) * 100) AS BIGINT)").as("k"))
      val wCum = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = g.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("stot"))
      val scored = g
        .withColumn("n1", row_number().over(
          Window.partitionBy("event_type").orderBy("h")).cast("long"))
        .withColumn("s1", sum(col("k")).over(wCum))
        .join(broadcast(tot), "event_type")
        .where(col("n1") < col("n"))
        .withColumn("s1d", col("s1").cast("double"))
        .withColumn("sd", col("stot").cast("double"))
      scored
        .withColumn("gain", expr(cpGainExpr))
        .withColumn("rk", row_number().over(
          Window.partitionBy("event_type").orderBy(desc("gain"), asc("h"))))
        .where(col("rk") === 1)
        .selectExpr(Seq("event_type", "CAST(h AS BIGINT) AS split_hour",
          "n1 AS n_left", "gain") ++ changepointMeans: _*)
        .orderBy("event_type")
    }),

    // Distribution-drift audit between the corpus' first and second time
    // halves — the train/serve drift check a pipeline runs before trusting
    // a model: value histograms (4096-cent buckets, value-domain-bounded)
    // per half, the two-sample chi-square homogeneity statistic, and both
    // halves' exact means. FP-order discipline: the per-bucket double
    // terms sum through an ORDERED fold over the bucket-sorted collected
    // array (the index-ordered cosine-fold rule — an unordered SUM() of
    // doubles would not replay); the collect is value-domain-bounded, not
    // corpus-bounded. One corpus scan → one hash agg; the half boundary
    // is a broadcast 1-row relation.
    "q_profile_drift" -> ((s: SparkSession, dir: String) => {
      val ev = table(s, dir, "events")
        .withColumn("h", expr(s"unix_micros(ts) div $HourUs"))
        .withColumn("bucket",
          expr(s"CAST(round(value * 100) AS BIGINT) div $WinsorBucket"))
      val mid = ev.agg(expr("(min(h) + max(h)) div 2").as("hmid"))
      val dec = col("value").cast("decimal(18,4)")
      val bk = ev.crossJoin(broadcast(mid))
        .withColumn("first_half", col("h") <= col("hmid"))
        .groupBy("bucket")
        .agg(sum(when(col("first_half"), 1L).otherwise(0L)).as("c1"),
          sum(when(!col("first_half"), 1L).otherwise(0L)).as("c2"),
          sum(when(col("first_half"), dec)).as("s1dec"),
          sum(when(!col("first_half"), dec)).as("s2dec"))
      val tot = bk.agg(sum("c1").as("n1"), sum("c2").as("n2"),
        sum("s1dec").as("s1t"), sum("s2dec").as("s2t"))
      bk.crossJoin(broadcast(tot))
        .withColumn("term", expr(driftTermExpr))
        .agg(
          first(col("n1")).as("n1"), first(col("n2")).as("n2"),
          asLong(count(lit(1))).as("n_buckets"),
          first(col("s1t").cast("double")).as("s1d"),
          first(col("s2t").cast("double")).as("s2d"),
          sort_array(collect_list(struct(col("bucket"), col("term"))))
            .as("terms"))
        .selectExpr("CAST(n1 AS BIGINT) AS n1", "CAST(n2 AS BIGINT) AS n2",
          "n_buckets",
          "s1d / n1 AS mean_first", "s2d / n2 AS mean_second",
          "aggregate(terms, CAST(0 AS DOUBLE), (a, x) -> a + x.term) AS chi2")
    }),

    // Robust anomaly report per event type (r10): median / MAD (median
    // absolute deviation) and the |x − med| > 3·MAD outlier census — the
    // robust twin of q_agg_zscore_outlier (one 750× spike corrupts a
    // mean/stddev gate, but moves the median and MAD not at all). Both
    // medians are EXACT lower medians (rank (n+1) div 2) selected via the
    // bucketed valueAtRanks order-statistic machinery — never a
    // per-group sort, and the first selection SHARES the winsorize
    // histogram memo (same (event_type, value) spec + cache key). The
    // deviation pass re-derives cents integers, so the MAD selection is
    // exact too; the 3·MAD gate compares BIGINTs.
    "q_ts_anomaly_mad" -> ((s: SparkSession, dir: String) => {
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val (medSel, _) = valueAtRanks(ev, "event_type", "value", nRel =>
        nRel.select(col("event_type"), lit("med").as("which"),
          expr("(n + 1) div 2").as("rank")),
        Some("winsor-events|" +
          SourceSinkOps.fixtureKey(dir, "events.parquet")))
      val med = medSel.groupBy("event_type")
        .agg(min(when(col("which") === "med", col("value"))).as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("dev_c", expr(
          "abs(CAST(round(value * 100) AS BIGINT)" +
            " - CAST(round(med * 100) AS BIGINT))"))
      val devRel = dev.select(col("event_type"),
        (col("dev_c") / lit(100.0)).as("value"))
      val (madSel, _) = valueAtRanks(devRel, "event_type", "value", nRel =>
        nRel.select(col("event_type"), lit("mad").as("which"),
          expr("(n + 1) div 2").as("rank")),
        // the deviation relation is a pure function of the fixture (the
        // median it subtracts is itself memoized), so its histogram
        // memoizes too — without this every bench rep rebuilt it
        Some("mad-dev|" +
          SourceSinkOps.fixtureKey(dir, "events.parquet")))
      val mad = madSel.groupBy("event_type")
        .agg(min(when(col("which") === "mad", col("value"))).as("mad"))
        .withColumn("mad_c", expr("CAST(round(mad * 100) AS BIGINT)"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(asLong(count(lit(1))).as("n"),
          min("med").as("med"), min("mad").as("mad"),
          asLong(sum(when(col("dev_c") > lit(3L) * col("mad_c"), 1L)
            .otherwise(0L))).as("n_outliers"))
        .withColumn("outlier_rate",
          col("n_outliers").cast("double") / col("n"))
        .orderBy("event_type")
    }),

    // LTTB-style visualization downsampling (r11b) — per (type, hour
    // bucket) keep the ONE point forming the largest triangle with the
    // neighbor buckets' mean points (Steinarsson's
    // largest-triangle-three-buckets, in the parallel bucket-mean variant:
    // the sequential selected-point recurrence would serialize the scan;
    // the mean-anchored form is embarrassingly parallel and is the
    // standard approximation). Exact replay: areas compare as INTEGERS —
    // the 2·area expression with mean anchors multiplies through by
    // np²·nn (constant within a bucket, so the argmax is unchanged):
    // |(sxp·nn − sxn·np)(y·np − syp) − (sxp − xr·np)(syn·np − syp·nn)|,
    // every factor an exact BIGINT (x rebased to the corpus min so
    // Σxr < 2^63 up to ~10^6 rows/bucket at month span — beyond that
    // rebase per bucket), products in DECIMAL(38,0) (HUGEINT in the twin,
    // the ohlc okey precedent) — values ≤ ~10^35 stay exact in both.
    // Scale: one scan + a (type, bucket) hash agg; neighbor attachment
    // joins the TIME-BOUNDED agg relation on b±1 (empty-hour gaps drop
    // their neighbors in both engines identically — interior buckets
    // only, declared); the per-bucket argmax is max_by (map-side
    // combinable), never a window over raw events.
    "q_ts_downsample" -> ((s: SparkSession, dir: String) => {
      val D = "decimal(38,0)"
      val pts = table(s, dir, "events").select(col("event_type").as("et"),
        unix_micros(col("ts")).as("x"),
        expr("CAST(round(value * 100) AS BIGINT)").as("y"))
      val x0 = pts.agg(min("x").as("x0"))
      val b = pts.crossJoin(broadcast(x0))
        .select(col("et"), col("x"), col("y"),
          (col("x") - col("x0")).as("xr"),
          expr(s"x div $HourUs").as("b"))
      val agg = b.groupBy("et", "b").agg(asLong(count(lit(1))).as("n"),
        asLong(sum("xr")).as("sx"), asLong(sum("y")).as("sy"))
      val prev = agg.select(col("et").as("et_p"), (col("b") + 1).as("b_p"),
        col("n").as("np"), col("sx").as("sxp"), col("sy").as("syp"))
      val next = agg.select(col("et").as("et_n"), (col("b") - 1).as("b_n"),
        col("n").as("nn"), col("sx").as("sxn"), col("sy").as("syn"))
      val nbr = agg
        .join(prev, col("et") === col("et_p") && col("b") === col("b_p"))
        .join(next, col("et") === col("et_n") && col("b") === col("b_n"))
        .select("et", "b", "n", "np", "sxp", "syp", "nn", "sxn", "syn")
      val sc = b.join(nbr, Seq("et", "b"))
        .withColumn("score", abs(
          (col("sxp").cast(D) * col("nn") - col("sxn").cast(D) * col("np"))
            * (col("y").cast(D) * col("np") - col("syp"))
          - (col("sxp").cast(D) - col("xr").cast(D) * col("np"))
            * (col("syn").cast(D) * col("np") - col("syp").cast(D) * col("nn"))))
      sc.groupBy("et", "b")
        .agg(max_by(struct(col("x"), col("y")),
          struct(col("score"), (-col("x")).as("nx"), (-col("y")).as("ny"))).as("pt"),
          asLong(min("n")).as("n"))
        .select(col("et").as("event_type"), col("b").as("bucket"),
          col("pt.x").as("ts_us"),
          (col("pt.y").cast("double") / 100).as("value"),
          col("n"))
        .orderBy("event_type", "bucket")
    }),

    // Pearson correlation matrix over lineitem's four measures (r10) —
    // the standard profiling read next to q_profile_table: which metrics
    // move together (quantity↔extended-price is the structural pair;
    // discount/tax are the independence control). ONE scan computes every
    // moment exactly: cents-quantized BIGINTs, all ten second moments
    // (4 squares + 6 cross) hi/lo-split on 2^30 (the q_agg_skew rule —
    // each partial stays < 2^53; first moments are plain BIGINT sums,
    // exact to ~8·10^11 rows at cent scale, the collocations bound), and
    // the six r values evaluate from the SAME generated formula strings
    // in a fixed IEEE order. The pair rows explode from one struct array
    // over the 1-row moment relation — no union, nothing recomputed.
    "q_profile_corr" -> ((s: SparkSession, dir: String) => {
      val base = table(s, dir, "lineitem").select(
        corrVars.map { case (nm, src) =>
          expr(s"CAST(round($src * 100) AS BIGINT)").as(nm) }: _*)
      val aggs = Seq(count(lit(1)).as("n")) ++
        corrVars.map { case (nm, _) =>
          sum(col(nm)).cast("double").as(s"s_$nm") } ++
        corrSelfAndCross.flatMap { case (a, b) => Seq(
          sum(expr(s"($a * $b) div $MomentSplit").cast("decimal(38,0)"))
            .cast("double").as(s"m_${a}_${b}_hi"),
          sum(expr(s"($a * $b) % $MomentSplit").cast("decimal(38,0)"))
            .cast("double").as(s"m_${a}_${b}_lo"))
        }
      val mom = base.agg(aggs.head, aggs.tail: _*)
      val pairStructs = corrSelfAndCross.filter { case (a, b) => a != b }
        .map { case (a, b) =>
          struct(lit(a).as("var_a"), lit(b).as("var_b"),
            col("n").cast("long").as("n"),
            expr(corrFormula(a, b)).as("corr"))
        }
      mom.select(explode(array(pairStructs: _*)).as("p")).select("p.*")
        .orderBy("var_a", "var_b")
    }),

    // Hour-of-day seasonal profile per event type — the seasonality
    // DECOMPOSITION read next to q_ts_acf's correlogram: per (type,
    // hour-of-day) the event share, mean value, and deviation from the
    // type's overall mean. Scale: ONE map-side-combinable hash agg
    // collapses the corpus to ≤ #types × 24 rows; the per-type rollup
    // derives FROM that relation (sums of partials — no second scan) and
    // broadcasts back (event_type is an application-level enum, a
    // domain-bounded count side like simhash's 2^16, never O(#rows)).
    "q_ts_seasonal" -> ((s: SparkSession, dir: String) =>
      seasonalProfile(table(s, dir, "events"))),

    // Count-Min sketch over the l_partkey frequency stream — the bounded-
    // memory frequency estimator a 100 TB pipeline keeps when the exact
    // per-key relation is too large to hold (the streaming-side twin of
    // q_agg_heavy_hitters' exact counts). The sketch is DETERMINISTIC
    // (ReplayableHash affine rows, salt 11), so unlike the HLL/GK sketches
    // this "approximate" operator has an EXACT DuckDB oracle: both engines
    // build the identical d×w = 4×512 counter table and read the identical
    // min-over-rows estimates; the output quantifies the overestimate
    // (est − true ≥ 0 always, the CM guarantee — spec-pinned). Scale: the
    // exact per-key relation collapses in a hash agg FIRST (O(#keys) rows,
    // never O(#rows)); the 4-row param relation and the ≤2048-row cell
    // table broadcast; mod-P before multiply keeps a·(key%P)+b < P² < 2^63
    // at any key domain (the round-7 replay rule).
    "q_agg_countmin" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val P = ReplayableHash.P
      val prel = ReplayableHash.CountMinParams.zipWithIndex
        .map { case ((a, b), k) => (k.toLong, a, b) }.toDF("r", "a", "b")
      val freq = table(s, dir, "lineitem")
        .groupBy("l_partkey").agg(count(lit(1)).as("c"))
      val col512 = expr(s"((a * (l_partkey % $P) + b) % $P) % $CmWidth")
      val cells = freq.crossJoin(broadcast(prel))
        .withColumn("cm_col", col512)
        .groupBy("r", "cm_col").agg(sum(col("c")).as("cell"))
      val top = freq.orderBy(desc("c"), asc("l_partkey")).limit(20)
      top.crossJoin(broadcast(prel))
        .withColumn("cm_col", col512)
        .join(broadcast(cells), Seq("r", "cm_col"))
        .groupBy("l_partkey", "c")
        .agg(min(col("cell")).as("c_est"))
        .select(col("l_partkey"), col("c").as("c_true"),
          asLong(col("c_est")).as("c_est"),
          asLong(col("c_est") - col("c")).as("overest"))
        .orderBy(desc("c_true"), asc("l_partkey"))
    }),

    // KMV (k-minimum-values / bottom-k) distinct-count sketch per event
    // type: the bounded-state alternative to countDistinct's expand — a
    // typed Aggregator holding the 64 smallest distinct salt-14 affine
    // hashes, map-side combinable (partials merge as sorted-array merges),
    // O(k) state per group at ANY corpus size. The sketch is DETERMINISTIC
    // (mod-prime affine is a bijection on [0, P)), so like q_agg_countmin
    // it gets an EXACT DuckDB oracle — the oracle re-derives the bottom-64
    // with a window (single-node DuckDB may sort; the ENGINE never does):
    // under capacity the estimate IS the exact count, at capacity it is
    // (k−1)·P / h_(k) as a two-op IEEE double chain. n_exact rides along
    // for the error readout (spec pins the rsd band).
    "q_agg_kmv_distinct" -> ((s: SparkSession, dir: String) => {
      val P = ReplayableHash.P
      val (a, b) = ReplayableHash.KmvParams.head
      val kmv = udaf(KmvSketch)
      table(s, dir, "events")
        .select(col("event_type"), col("user_id"),
          expr(s"($a * (user_id % $P) + $b) % $P").as("hv"))
        .groupBy("event_type")
        .agg(kmv(col("hv")).as("sk"),
          countDistinct(col("user_id")).as("nd"))
        .select(col("event_type"),
          asLong(col("nd")).as("n_exact"),
          col("sk._1").as("sketch_size"),
          col("sk._2").as("kth_hash"),
          col("sk._3").as("est_distinct"))
        .orderBy("event_type")
    }),

    // One-way ANOVA by hour-of-day (r12): the "is the hourly seasonality
    // REAL" significance readout next to q_ts_seasonal's descriptive
    // profile — between-group sum of squares over the 24 hour cells vs
    // within, eta² and the F statistic. Replay discipline: per-cell and
    // per-type sums are exact BIGINTs (Σk² hi/lo-split — the skew/
    // bollinger rule; raw Σk² overflows 2^63 at ×10), SSB's 24-term
    // float sum is pinned to hod-ascending order by an ordered
    // cumulative window (the mix_alpha fixed-order rule), and every
    // later op is a staged IEEE chain over named columns. The cell
    // relation is ≤ 24·#types rows — the windows run over bounded
    // input, never event rows.
    "q_ts_anova" -> ((s: SparkSession, dir: String) => {
      val ev = table(s, dir, "events")
        .select(col("event_type"),
          expr(s"(unix_micros(ts) div $HourUs) % 24").as("hod"),
          expr("CAST(round(value * 100) AS BIGINT)").as("k"))
      val cell = ev.groupBy("event_type", "hod")
        .agg(count(lit(1)).as("nh"), sum(col("k")).as("sh"))
      val tot = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sk"),
          sum(expr(s"(k * k) div $MomentSplit")).as("s2hi"),
          sum(expr(s"(k * k) % $MomentSplit")).as("s2lo"))
      val withTerm = cell.withColumn("term",
        expr("(CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE)) / nh"))
      val pivotCols = (0 until 24).map(h =>
        max(when(col("hod") === h, col("term"))).as(s"t$h")) :+
        asLong(count(lit(1))).as("k_groups")
      val terms = withTerm.groupBy(col("event_type").as("et"))
        .agg(pivotCols.head, pivotCols.tail: _*)
        .withColumn("sumterm", expr(anovaSumTerm))
        .select(col("et"), col("sumterm"), col("k_groups"))
      tot.join(broadcast(terms), col("event_type") === col("et"))
        .selectExpr("event_type", "CAST(n AS BIGINT) AS n", "k_groups",
          "sumterm", "CAST(sk AS DOUBLE) AS skd",
          s"(CAST(s2hi AS DOUBLE) * $MomentSplit.0 + CAST(s2lo AS DOUBLE)) AS s2d",
          "CAST(n AS DOUBLE) AS nd")
        .selectExpr("event_type", "n", "k_groups",
          "s2d - skd * skd / nd AS sst",
          "sumterm - skd * skd / nd AS ssb")
        .selectExpr("event_type", "n", "k_groups", "sst", "ssb",
          "sst - ssb AS ssw")
        .selectExpr("event_type", "n", "sst", "ssb", "ssw",
          "ssb / sst AS eta_sq",
          "(ssb / (k_groups - 1)) / (ssw / (n - k_groups)) AS f_stat")
        .orderBy("event_type")
    }),

    // Exact WEIGHTED median (r12): quantity-weighted price median per
    // returnflag — the order statistic where each value carries a weight
    // (Spark's percentile/approx_percentile weight argument buffers the
    // group; this is the distributed-exact shape). Two-level bucketed
    // selection, the winsorize discipline generalized from counts to
    // weights: per-(grp, cent) weight sums, a cent-div-4096 bucket
    // summary whose cumulative window runs over DOMAIN-bounded rows
    // (≤ price-domain/4096 per group, never corpus-scaled), the target
    // bucket broadcast back (≤ #groups rows), and the in-bucket
    // cumulative over ≤ 4096 distinct cents. Lower weighted median:
    // smallest cent with 2·cumweight ≥ total — exact integer
    // comparisons; the readout is the k/100.0 exact division.
    "q_agg_weighted_median" -> ((s: SparkSession, dir: String) => {
      // both levels aggregate straight off the pruned scan — a
      // materialized (grp, cent) histogram measured 28 s at ×10 (17M
      // rows checkpointed for two consumers) vs ~4 s for two scans
      val li = table(s, dir, "lineitem")
        .select(col("l_returnflag").as("grp"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cent"),
          col("l_quantity").cast("long").as("q"))
        .withColumn("bucket", expr(s"cent div $WinsorBucket"))
      val b = li.groupBy("grp", "bucket").agg(sum(col("q")).as("bw"))
      val bc = b
        .withColumn("cbw", sum("bw").over(
          Window.partitionBy("grp").orderBy("bucket")))
        .withColumn("tw", sum("bw").over(Window.partitionBy("grp")))
        .withColumn("prior", col("cbw") - col("bw"))
      val tgt = bc.where(col("cbw") * 2 >= col("tw"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("grp").orderBy("bucket")))
        .where(col("rn") === 1)
        .select(col("grp").as("tgrp"), col("bucket").as("tb"),
          col("prior"), col("tw"))
      li.join(broadcast(tgt),
          col("grp") === col("tgrp") && col("bucket") === col("tb"))
        .groupBy("grp", "cent", "prior", "tw")
        .agg(sum(col("q")).as("w"))
        .withColumn("cwin", sum("w").over(
          Window.partitionBy("grp").orderBy("cent")))
        .where((col("prior") + col("cwin")) * 2 >= col("tw"))
        .groupBy("grp")
        .agg(asLong(min(col("tw"))).as("total_weight"),
          (min(col("cent")).cast("double") / lit(100)).as("w_median"))
        .select(col("grp").as("l_returnflag"), col("total_weight"),
          col("w_median"))
        .orderBy("l_returnflag")
    }),

    // Theil-Sen robust trend slope (r12) per event type: the LOWER MEDIAN
    // (the r10 (n+1) div 2 idiom — exact, no midpoint average) of all
    // pairwise slopes (k_j − k_i)/(h_j − h_i) over the zero-filled hourly
    // cent grid — the outlier-insensitive complement to q_ts_trend's OLS
    // slope and the natural companion to the Mann-Kendall verdict. Each
    // slope is ONE IEEE division of exact integers (replayable); the
    // median is selected BY VALUE at a fixed rank, so tie order among
    // equal slopes cannot matter. Selection runs through
    // [[doubleValueAtRanks]] (radix order-statistic over the IEEE bit
    // key): the ~1.2M slope pairs collapse map-side into a distinct-slope
    // histogram keyed by (type, bit key) — a HIGH-cardinality shuffle —
    // and every window after that is a ≤65536-row digit histogram per
    // type, so no 5-partition row-level sort anywhere (the r12 shape
    // ranked all pairs in 5 window tasks — the low-cardinality-window
    // trap the repo bans; the time-span bound made it survivable, not
    // right). The oracle keeps the naive rank window (the
    // q_agg_weighted_median rule: single-node DuckDB may run the naive
    // cumulative — the engine owes the scale discipline, both engines
    // only have to agree on the selected VALUE).
    "q_ts_theil_sen" -> ((s: SparkSession, dir: String) => {
      val g = hourlyCentGrid(s, dir).localCheckpoint(true)
      val pairs = g.as("g1").join(g.as("g2"),
          col("g1.event_type") === col("g2.event_type") &&
            col("g1.h") < col("g2.h"))
        // try_divide, not /: the histogram build consumes slope TWICE
        // (order key + min), and codegen's subexpression elimination
        // hoists the shared division into the join's consume path BEFORE
        // the h1 < h2 residual check — ANSI then throws on the h-equal
        // candidate rows the condition is about to drop. try_divide
        // tolerates those phantom rows (they never reach the output);
        // surviving pairs have h2 − h1 ≥ 1, so the quotient is the same
        // IEEE division the oracle runs.
        .select(col("g1.event_type").as("event_type"),
          expr("try_divide(CAST(g2.k - g1.k AS DOUBLE), CAST(g2.h - g1.h AS DOUBLE))")
            .as("slope"))
      val (sel, _) = doubleValueAtRanks(pairs, "event_type", "slope",
        nRel => nRel.select(col("event_type"), lit("med").as("which"),
          expr("(n + 1) div 2").as("rank"), col("n")),
        Some("theil-slopes|" +
          SourceSinkOps.fixtureKey(dir, "events.parquet")))
      sel.select(col("event_type"), asLong(col("n")).as("n_pairs"),
          (col("value") / lit(100.0)).as("slope_per_hour"))
        .orderBy("event_type")
    }),

    // Mann-Kendall trend test (r12) per event type over the zero-filled
    // hourly cent grid: S = Σ sign(k_j − k_i) over hour pairs i<j — the
    // standard non-parametric monotone-trend test, EXACT in integers
    // (the cent grid is the replay substrate; ties contribute 0 and the
    // tie-corrected variance numerator n(n−1)(2n+5) − Σt(t−1)(2t+5)
    // stays BIGINT for spans under ~2^21 hours ≈ 239 years). The pair
    // self-join carries event_type as its equi key and the per-key
    // density is TIME-SPAN-bounded (grid rows are identical at ×10 —
    // the q_ts_bollinger axis), so the quadratic never grows with data
    // volume. z/verdict are the staged shared formulas; the two 5-row
    // aggregates meet under an explicit broadcast.
    "q_ts_mann_kendall" -> ((s: SparkSession, dir: String) => {
      val g = hourlyCentGrid(s, dir).localCheckpoint(true)
      val pr = g.as("g1").join(g.as("g2"),
          col("g1.event_type") === col("g2.event_type") &&
            col("g1.h") < col("g2.h"))
        .groupBy(col("g1.event_type").as("event_type"))
        .agg(sum(when(col("g2.k") > col("g1.k"), 1L)
          .when(col("g2.k") < col("g1.k"), -1L)
          .otherwise(0L)).as("s"))
      val tv = g.groupBy("event_type", "k").agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(sum(col("t")).as("n"),
          sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_adj"))
      pr.join(broadcast(tv), "event_type")
        .withColumn("vnum", expr("n * (n - 1) * (2 * n + 5) - tie_adj"))
        .selectExpr("event_type", "CAST(s AS BIGINT) AS s_stat",
          "CAST(vnum AS BIGINT) AS var_num", "s", "vnum")
        .selectExpr("event_type", "s_stat", "var_num", mkZFormula)
        .selectExpr("event_type", "s_stat", "var_num", "z", mkTrendFormula)
        .orderBy("event_type")
    }),

    // Wald–Wolfowitz runs test (r12) per event type over the zero-filled
    // hourly cent grid: dichotomize each hour's exact cent total against
    // the per-type MEDIAN hourly total (hours AT the median drop — the
    // classical treatment; the median is selected by rank (n+1) div 2
    // under the total order (k, h), so both engines pick the identical
    // element), count maximal same-sign runs in hour order via one lag,
    // and read the normal approximation z = (R − E)/√Var through the
    // staged shared formulas. Scale: the grid is TIME-SPAN-bounded
    // (identical rows at ×10 — the bollinger/mann_kendall axis), so the
    // per-type windows never see corpus-scaled input; everything before
    // them is one map-combinable hash agg off the scan.
    "q_ts_runs_test" -> ((s: SparkSession, dir: String) => {
      // checkpointed like mann_kendall: med derives FROM g and joins back
      // against it (the ambiguous-self-join surface), and the leaf feeds
      // two consumers; RDD-leaf stats are unknown, so med's broadcast
      // below is explicit (r7 rule)
      val g = hourlyCentGrid(s, dir).localCheckpoint(true)
      val med = g
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("k", "h")))
        .withColumn("ng", count(lit(1)).over(Window.partitionBy("event_type")))
        .where(col("rn") === expr("(ng + 1) div 2"))
        .select(col("event_type"), col("k").as("med_k"))
      val signed = g.join(broadcast(med), "event_type")
        .where(col("k") =!= col("med_k"))
        .withColumn("sgn", when(col("k") > col("med_k"), 1).otherwise(-1))
      signed
        .withColumn("prev", lag("sgn", 1).over(
          Window.partitionBy("event_type").orderBy("h")))
        .groupBy("event_type")
        .agg(asLong(count(lit(1))).as("n"),
          asLong(sum(when(col("sgn") === 1, 1L).otherwise(0L))).as("n_above"),
          asLong(sum(when(col("sgn") === -1, 1L).otherwise(0L))).as("n_below"),
          asLong(sum(when(col("prev").isNull || col("prev") =!= col("sgn"), 1L)
            .otherwise(0L))).as("n_runs"))
        .selectExpr("event_type", "n", "n_above", "n_below", "n_runs",
          runsEFormula)
        .selectExpr("event_type", "n", "n_above", "n_below", "n_runs",
          "e_runs", runsVFormula)
        .selectExpr("event_type", "n", "n_above", "n_below", "n_runs",
          "e_runs", "var_runs", runsZFormula)
        .selectExpr("event_type", "n", "n_above", "n_below", "n_runs",
          "e_runs", "var_runs", "z", runsVerdictFormula)
        .orderBy("event_type")
    }),

    // One-sided CUSUM change detection (r12) per event type over the
    // zero-filled hourly cent grid: the classical sequential detector
    // S_t = max(0, S_{t−1} + (k_t − target)) — a clamped RECURRENCE that
    // does not window-decompose directly, computed EXACTLY via the
    // prefix-sum identity S_t = C_t − min_{j≤t} C_j (two integer windows:
    // running sum + running min — the recursion never materializes).
    // Target is the per-type MEDIAN hourly total and the alarm threshold
    // is 3×MAD, both rank-selected under total orders on the grid, so
    // the whole detector is integer-exact end to end; cents surface as
    // value units only in the report. Every window runs over the
    // TIME-SPAN-bounded grid (the mann_kendall exemption class).
    "q_ts_cusum" -> ((s: SparkSession, dir: String) => {
      val g = hourlyCentGrid(s, dir).localCheckpoint(true)
      def rankPick(df: DataFrame, valCol: String, out: String): DataFrame =
        df.withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy(col(valCol), col("h"))))
          .withColumn("ng", count(lit(1)).over(Window.partitionBy("event_type")))
          .where(col("rn") === expr("(ng + 1) div 2"))
          .select(col("event_type"), col(valCol).as(out))
      val med = rankPick(g, "k", "med_k")
      val dev = g.join(broadcast(med), "event_type")
        .withColumn("dev", col("k") - col("med_k"))
      val mad = rankPick(dev.withColumn("adev", abs(col("dev")))
        .select(col("event_type"), col("adev").as("k"), col("h")), "k", "mad_k")
      val wOrd = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // allowance (slack) = MAD: the standard CUSUM drift guard — without
      // it Σ(k − median) accumulates whenever mean ≠ median and the
      // detector alarms ~95% of hours (measured on the first cut)
      val cus = dev.join(broadcast(mad), "event_type")
        .withColumn("y", col("dev") - col("mad_k"))
        .withColumn("c", sum(col("y")).over(wOrd))
        // the running min must include the EMPTY prefix (C₀ = 0) or the
        // identity S_t = C_t − min_{j≤t} C_j under-reads whenever every
        // prefix sum stays positive — hence least(0, min)
        .withColumn("rmin", least(lit(0L), min(col("c")).over(wOrd)))
        .withColumn("s", col("c") - col("rmin"))
      cus
        .groupBy("event_type")
        .agg(asLong(count(lit(1))).as("n_hours"),
          max(struct(col("s"), (-col("h")).as("nh"))).as("pk"),
          asLong(sum(when(col("s") > lit(3L) * col("mad_k"), 1L)
            .otherwise(0L))).as("n_alarms"),
          asLong(min("med_k")).as("med_c"),
          asLong(min("mad_k")).as("mad_c"))
        .selectExpr("event_type", "n_hours",
          "CAST(pk.s AS DOUBLE) / 100 AS max_cusum",
          "-pk.nh AS peak_hour", "n_alarms",
          "CAST(med_c AS DOUBLE) / 100 AS target",
          "CAST(3 * mad_c AS DOUBLE) / 100 AS threshold")
        .orderBy("event_type")
    })
  )

  /** KMV sketch buffer: the `n` smallest DISTINCT hash values seen so far,
    * sorted ascending in `vals(0 until n)` (capacity [[KmvK]]).
    * `private[graft]`, not `private` — Janino-generated encoder code must
    * see the class (the round-5 interpreted-fallback trap). */
  private[graft] case class KmvBuf(var n: Int, vals: Array[Long])

  /** Typed KMV (k-minimum-values) distinct-count sketch: bounded O(k)
    * state, map-side combinable — the aggregate SHAPE a 100 TB pipeline
    * keeps when exact countDistinct's expand is too expensive. Input is
    * the salt-14 affine hash (a bijection on [0, P), so the bottom-k set
    * is collision-free); output is (sketch_size, kth_hash, est) where the
    * under-capacity branch is EXACT (= n) and the full branch reads the
    * classic (k−1)·M / h_(k) estimator as a two-op double chain (63·P is
    * an exact < 2^53 product; the division is one IEEE op — both replay
    * in DuckDB verbatim, so this sketch gets an EXACT oracle like
    * q_agg_countmin, unlike the engine-divergent HLL). */
  private[graft] object KmvSketch
      extends org.apache.spark.sql.expressions.Aggregator[Long, KmvBuf, (Long, Long, Double)] {
    private val K = KmvK
    def zero: KmvBuf = KmvBuf(0, new Array[Long](K))
    def reduce(b: KmvBuf, h: Long): KmvBuf = {
      val pos = java.util.Arrays.binarySearch(b.vals, 0, b.n, h)
      if (pos >= 0) return b // duplicate hash — KMV holds distinct values
      val ins = -(pos + 1)
      if (b.n < K) {
        System.arraycopy(b.vals, ins, b.vals, ins + 1, b.n - ins)
        b.vals(ins) = h
        b.n += 1
      } else if (ins < K) {
        System.arraycopy(b.vals, ins, b.vals, ins + 1, K - 1 - ins)
        b.vals(ins) = h
      }
      b
    }
    def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf = {
      val out = new Array[Long](K)
      var i = 0; var j = 0; var n = 0
      while (n < K && (i < b1.n || j < b2.n)) {
        val take =
          if (i >= b1.n) { val v = b2.vals(j); j += 1; v }
          else if (j >= b2.n) { val v = b1.vals(i); i += 1; v }
          else if (b1.vals(i) < b2.vals(j)) { val v = b1.vals(i); i += 1; v }
          else if (b1.vals(i) > b2.vals(j)) { val v = b2.vals(j); j += 1; v }
          else { val v = b1.vals(i); i += 1; j += 1; v }
        out(n) = take; n += 1
      }
      KmvBuf(n, out)
    }
    def finish(b: KmvBuf): (Long, Long, Double) = {
      val kth = if (b.n > 0) b.vals(b.n - 1) else -1L
      val est =
        if (b.n < K) b.n.toDouble
        else (K - 1).toDouble * ReplayableHash.P.toDouble / kth.toDouble
      (b.n.toLong, kth, est)
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[KmvBuf] =
      org.apache.spark.sql.Encoders.product[KmvBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[(Long, Long, Double)] =
      org.apache.spark.sql.Encoders.product[(Long, Long, Double)]
  }

  /** One referential-integrity audit row for a (child, fk, parent, pk)
    * edge — the q_profile_integrity primitive, exposed for
    * [[graft.Pipelines]] and the orphan-injection spec. ONE left-anti
    * join on the fk; the parent pre-collapses to its distinct keys. */
  private[graft] def integrityEdge(child: DataFrame, fk: String,
      parent: DataFrame, pk: String, label: String): DataFrame = {
    val keys = parent.select(col(pk).as(fk)).distinct()
    val n = child.agg(count(lit(1)).as("n_child"))
    child.select(fk).join(keys, Seq(fk), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .crossJoin(broadcast(n))
      .select(lit(label).as("fk_edge"), col("n_child"), col("n_orphans"),
        (col("n_orphans").cast("double") / col("n_child")).as("orphan_rate"))
  }

  /** Hour-of-day seasonal profile over an events frame (event_type, ts,
    * value) — the q_ts_seasonal primitive, exposed for
    * [[graft.Pipelines]]. See the query comment for the single-agg +
    * domain-bounded-broadcast shape. */
  private[graft] def seasonalProfile(events: DataFrame): DataFrame = {
    val hod = events
      .withColumn("hod", expr(s"(unix_micros(ts) div $HourUs) % 24"))
      .groupBy("event_type", "hod")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).as("svdec"))
    val tot = hod.groupBy("event_type")
      .agg(sum(col("n")).as("nt"), sum(col("svdec")).as("svtdec"))
    hod.join(broadcast(tot), "event_type")
      .withColumn("svd", col("svdec").cast("double"))
      .withColumn("svtd", col("svtdec").cast("double"))
      .selectExpr(Seq("event_type", "CAST(hod AS BIGINT) AS hod",
        "CAST(n AS BIGINT) AS n") ++ seasonalFormulas: _*)
      .orderBy("event_type", "hod")
  }

  /** Truncated-EWMA smoothing of the zero-filled hourly series of an
    * events frame — the q_ts_ewma primitive, exposed for
    * [[graft.Pipelines]]. See the query comment for the grid-bounded
    * fan-out shape and the exact-integer replay bound. */
  private[graft] def ewmaSmooth(events: DataFrame): DataFrame = {
    val ev = events.withColumn("h", expr(s"unix_micros(ts) div $HourUs"))
    val rng = ev.agg(min("h").as("h0"), max("h").as("h1"))
    val grid = ev.select("event_type").distinct()
      .crossJoin(broadcast(rng))
      .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("h"))
    val actual = ev.groupBy("event_type", "h")
      .agg(dsum(col("value")).as("sv"))
    val g = grid.join(actual, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        expr("CAST(round(coalesce(sv, 0.0) * 100) AS BIGINT)").as("k"))
    val pairs = g
      .withColumn("lag_h", explode(expr(
        s"sequence(CAST(0 AS BIGINT), CAST(${EwmaLags - 1} AS BIGINT))")))
      .join(g.select(col("event_type").as("et2"), col("h").as("h2"),
        col("k").as("k2")),
        col("event_type") === col("et2") && col("h2") === col("h") - col("lag_h"))
      .select(col("event_type"), col("h"),
        expr(s"shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(${EwmaLags - 1} - lag_h AS INT))").as("w"),
        col("k2"))
    pairs.groupBy("event_type", "h")
      .agg(asLong(count(lit(1))).as("n_lags"),
        sum(col("w") * col("k2")).as("num"),
        sum(col("w")).as("den"))
      .selectExpr("event_type", "CAST(h AS BIGINT) AS hour_idx", "n_lags",
        ewmaFormula)
      .orderBy("event_type", "hour_idx")
  }

  def oracle: Seq[(String, String)] = Seq(
    "q_profile_freq" ->
      """WITH st AS (
        |  SELECT 'o_orderstatus' AS col_name, o_orderstatus AS val FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', o_orderpriority FROM orders),
        |cnt AS (
        |  SELECT col_name, val, CAST(count(*) AS BIGINT) AS n
        |  FROM st GROUP BY 1, 2),
        |rnk AS (
        |  SELECT col_name, val, n,
        |         sum(n) OVER (PARTITION BY col_name) AS tot,
        |         row_number() OVER (PARTITION BY col_name
        |                            ORDER BY n DESC, val ASC) AS rk
        |  FROM cnt)
        |SELECT col_name, CAST(rk AS BIGINT) AS rk, val, n,
        |       CAST(n AS DOUBLE) / tot AS share
        |FROM rnk WHERE rk <= 3 ORDER BY col_name, rk""".stripMargin,

    "q_profile_table" -> {
      def one(name: String, sqlExpr: String) =
        s"""SELECT '$name' AS col_name,
           |       CAST(count(*) AS BIGINT) AS n_rows,
           |       CAST(sum(CASE WHEN $sqlExpr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |       CAST(count(DISTINCT $sqlExpr) AS BIGINT) AS n_distinct,
           |       CAST(min($sqlExpr) AS DOUBLE) AS min_v,
           |       CAST(max($sqlExpr) AS DOUBLE) AS max_v
           |FROM orders""".stripMargin
      Seq(
        one("o_orderkey", "CAST(o_orderkey AS DOUBLE)"),
        one("o_custkey", "CAST(o_custkey AS DOUBLE)"),
        one("o_totalprice", "o_totalprice"),
        one("o_orderdate_ms", "CAST(epoch_ms(o_orderdate) AS DOUBLE)"))
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")
    },

    "q_agg_heavy_hitters" ->
      """WITH c AS (SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY l_partkey),
        |t AS (SELECT count(*) AS n_total FROM lineitem),
        |r AS (
        |  SELECT l_partkey, c,
        |         row_number() OVER (ORDER BY c DESC, l_partkey) AS rn,
        |         CAST(sum(c) OVER (ORDER BY c DESC, l_partkey) AS BIGINT) AS cum_c
        |  FROM c)
        |SELECT l_partkey, c,
        |       CAST(c AS DOUBLE) / n_total AS share,
        |       cum_c,
        |       CAST(cum_c AS DOUBLE) / n_total AS cum_share
        |FROM r CROSS JOIN t WHERE rn <= 20
        |ORDER BY c DESC, l_partkey""".stripMargin,

    "q_agg_zscore_outlier" ->
      """WITH st AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s1d,
        |         CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s2d
        |  FROM events GROUP BY event_type),
        |p AS (
        |  SELECT event_type, s1d / n AS mean,
        |         sqrt(s2d / n - (s1d / n) * (s1d / n)) AS std
        |  FROM st)
        |SELECT e.event_id, e.event_type, e.value,
        |       (e.value - p.mean) / p.std AS z
        |FROM events e JOIN p USING (event_type)
        |WHERE abs((e.value - p.mean) / p.std) > 2.5
        |ORDER BY e.event_id""".stripMargin,

    "q_win_winsorize" ->
      """WITH s AS (
        |  SELECT event_type, value,
        |         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |p AS (
        |  SELECT event_type,
        |         max(CASE WHEN rn = (n + 19) // 20 THEN value END) AS p05,
        |         max(CASE WHEN rn = (19 * n + 19) // 20 THEN value END) AS p95
        |  FROM s GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |       least(greatest(e.value, p.p05), p.p95) AS value_w
        |FROM events e JOIN p USING (event_type)
        |ORDER BY e.event_id""".stripMargin,

    "q_agg_skew" ->
      s"""WITH k0 AS (
         |  SELECT event_type,
         |         CAST(round(value * 100) AS BIGINT) AS k,
         |         CAST(round(value * 100) AS BIGINT)
         |           * CAST(round(value * 100) AS BIGINT) AS k2
         |  FROM events),
         |k AS (SELECT event_type, k, k2, k2 * k AS k3,
         |             k2 // 65536 AS a, k2 % 65536 AS b FROM k0),
         |st AS (
         |  SELECT event_type, count(*) AS n,
         |         CAST(sum(k) AS DOUBLE) AS s1d,
         |         CAST(sum(k2) AS DOUBLE) AS s2d,
         |         CAST(sum(CAST(k3 // $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS s3hid,
         |         CAST(sum(CAST(k3 % $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS s3lod,
         |         CAST(sum(CAST(a * a AS DECIMAL(38,0))) AS DOUBLE) AS s4aad,
         |         CAST(sum(CAST(2 * a * b AS DECIMAL(38,0))) AS DOUBLE) AS s4abd,
         |         CAST(sum(CAST(b * b AS DECIMAL(38,0))) AS DOUBLE) AS s4bbd
         |  FROM k GROUP BY event_type)
         |SELECT event_type, CAST(n AS BIGINT) AS n,
         |       ${momentFormulas.mkString(",\n       ")}
         |FROM st ORDER BY event_type""".stripMargin,

    "q_ts_gapfill" ->
      s"""WITH e AS (
         |  SELECT event_type, epoch_us(ts) // $HourUs AS h, value FROM events),
         |r AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
         |g AS (
         |  SELECT t.event_type, unnest(generate_series(r.h0, r.h1)) AS h
         |  FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN r),
         |a AS (
         |  SELECT event_type, h, count(*) AS cnt,
         |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
         |  FROM e GROUP BY event_type, h)
         |SELECT g.event_type, g.h AS hour_idx,
         |       COALESCE(a.cnt, 0) AS n_events,
         |       COALESCE(a.sv, 0.0) AS total_value
         |FROM g LEFT JOIN a USING (event_type, h)
         |ORDER BY g.event_type, hour_idx""".stripMargin,

    "q_ts_interpolate" ->
      s"""WITH e AS (
         |  SELECT event_type, epoch_us(ts) // $HourUs AS h, value FROM events),
         |r AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
         |g AS (
         |  SELECT t.event_type, unnest(generate_series(r.h0, r.h1)) AS h
         |  FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN r),
         |a AS (
         |  SELECT event_type, h,
         |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
         |  FROM e GROUP BY event_type, h),
         |j AS (
         |  SELECT g.event_type, g.h, a.sv
         |  FROM g LEFT JOIN a USING (event_type, h)),
         |w AS (
         |  SELECT event_type, h, sv,
         |         last_value(sv IGNORE NULLS) OVER
         |           (PARTITION BY event_type ORDER BY h
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         |         last_value(CASE WHEN sv IS NOT NULL THEN h END IGNORE NULLS) OVER
         |           (PARTITION BY event_type ORDER BY h
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
         |         first_value(sv IGNORE NULLS) OVER
         |           (PARTITION BY event_type ORDER BY h
         |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         |         first_value(CASE WHEN sv IS NOT NULL THEN h END IGNORE NULLS) OVER
         |           (PARTITION BY event_type ORDER BY h
         |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
         |  FROM j)
         |SELECT event_type, h AS hour_idx, sv IS NOT NULL AS observed,
         |       CASE WHEN sv IS NOT NULL THEN sv
         |            WHEN prev_v IS NULL THEN next_v
         |            WHEN next_v IS NULL THEN prev_v
         |            ELSE prev_v + (next_v - prev_v)
         |                 * (CAST(h - prev_h AS DOUBLE) / (next_h - prev_h))
         |       END AS value_interp
         |FROM w ORDER BY event_type, hour_idx""".stripMargin,

    "q_ts_acf" ->
      s"""WITH $acfCte
         |SELECT event_type, lag_h, n, acf
         |FROM acfrel ORDER BY event_type, lag_h""".stripMargin,

    "q_ts_pacf" ->
      s"""WITH $acfCte,
         |piv AS (
         |  SELECT event_type,
         |         max(CASE WHEN lag_h = 1 THEN acf END) AS r1,
         |         max(CASE WHEN lag_h = 2 THEN acf END) AS r2,
         |         max(CASE WHEN lag_h = 3 THEN acf END) AS r3
         |  FROM acfrel GROUP BY event_type),
         |p1 AS (SELECT event_type, r1, r2, r3, $pacfStage1 FROM piv),
         |p2 AS (SELECT event_type, r1, r2, r3, phi11, ${pacfStage2.mkString(", ")} FROM p1),
         |p3 AS (SELECT event_type, r1, r2, r3, phi11, den2, num2, $pacfStage3 FROM p2),
         |p4 AS (SELECT event_type, r1, r2, r3, phi11, phi22, $pacfStage4 FROM p3),
         |p5 AS (SELECT event_type, r1, r2, r3, phi11, phi22, phi21, ${pacfStage5.mkString(", ")} FROM p4),
         |p6 AS (SELECT event_type, r1, r2, r3, phi11, phi22, num3, den3, $pacfStage6 FROM p5)
         |SELECT event_type, r1, r2, r3,
         |       phi11 AS pacf1, phi22 AS pacf2, phi33 AS pacf3
         |FROM p6 ORDER BY event_type""".stripMargin,

    "q_ts_ljung_box" -> {
      val pivCols = (1 to 5).flatMap(k => Seq(
        s"max(CASE WHEN lag_h = $k THEN acf END) AS r$k",
        s"CAST(max(CASE WHEN lag_h = $k THEN n END) AS BIGINT) AS n$k"))
        .mkString(",\n         ")
      val baseCols = ((1 to 5).map(k => s"r$k") ++
        (1 to 5).map(k => s"n$k")).mkString(", ")
      s"""WITH $acfCte,
         |piv AS (
         |  SELECT event_type,
         |         $pivCols
         |  FROM acfrel GROUP BY event_type),
         |pn AS (SELECT event_type, $baseCols, n1 + 1 AS n_obs FROM piv),
         |qs AS (SELECT event_type, n_obs, $lbQFormula FROM pn)
         |SELECT event_type, CAST(n_obs AS BIGINT) AS n_obs, q_stat,
         |       $lbVerdictFormula
         |FROM qs ORDER BY event_type""".stripMargin
    },

    // Expected shares embedded from the same code-gen-time constants
    // (shortest-round-trip double literals CAST to DOUBLE parse to the
    // identical doubles); first digit via the BIGINT string cast.
    // `g` is read twice -> MATERIALIZED.
    "q_profile_benford" -> {
      // `e0` forces a DOUBLE literal parse (strtod, correctly rounded):
      // a bare decimal literal would parse as DECIMAL and take DuckDB's
      // limb-wise decimal→double conversion — measured 1 ulp off the
      // Java shortest-round-trip parse on digit 3 (the r6 rule in
      // literal form).
      val vals = BenfordShares
        .map { case (d, sh) => s"($d, CAST(${sh}e0 AS DOUBLE))" }.mkString(", ")
      s"""WITH d AS (
         |  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS first_digit
         |  FROM orders),
         |g AS MATERIALIZED (
         |  SELECT first_digit, CAST(count(*) AS BIGINT) AS n
         |  FROM d WHERE first_digit BETWEEN 1 AND 9 GROUP BY first_digit),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g),
         |e AS (SELECT * FROM (VALUES $vals) v(first_digit, benford_share))
         |SELECT e.first_digit,
         |       COALESCE(g.n, 0) AS n,
         |       CAST(COALESCE(g.n, 0) AS DOUBLE) / total AS share,
         |       e.benford_share,
         |       abs(CAST(COALESCE(g.n, 0) AS DOUBLE) / total - e.benford_share) AS abs_dev
         |FROM e LEFT JOIN g USING (first_digit) CROSS JOIN t
         |ORDER BY e.first_digit""".stripMargin
    },

    // Generated from the same FdCols/FdPairs lists as the engine (single
    // source of truth); counts distinct RAW values — equal to the
    // engine's digest counts by injectivity on the observed domains.
    // `s` is read twice -> MATERIALIZED (CLAUDE rule).
    "q_profile_fd" -> {
      val singleSql = FdCols.map { case (nm, _) =>
        s"SELECT '$nm' AS c, CAST(count(DISTINCT $nm) AS BIGINT) AS nd FROM lineitem"
      }.mkString("\n  UNION ALL\n  ")
      val pairSql = FdPairs.map { case (i, j) =>
        val (a, b) = (FdCols(i)._1, FdCols(j)._1)
        s"SELECT '$a|$b' AS p, CAST(count(*) AS BIGINT) AS nd_ab " +
          s"FROM (SELECT DISTINCT $a, $b FROM lineitem)"
      }.mkString("\n  UNION ALL\n  ")
      val defVals = FdPairs.map { case (i, j) =>
        s"('${FdCols(i)._1}|${FdCols(j)._1}', '${FdCols(i)._1}', '${FdCols(j)._1}')"
      }.mkString(",\n       ")
      s"""WITH nr AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem),
         |s AS MATERIALIZED ($singleSql),
         |pp AS ($pairSql),
         |defs AS (SELECT * FROM (VALUES $defVals) v(p, col_a, col_b))
         |SELECT col_a, col_b, n_rows, sa.nd AS nd_a, sb.nd AS nd_b,
         |       pp.nd_ab AS nd_ab,
         |       pp.nd_ab = sa.nd AS fd_a_to_b,
         |       pp.nd_ab = sb.nd AS fd_b_to_a,
         |       sa.nd = n_rows AS key_a,
         |       sb.nd = n_rows AS key_b
         |FROM defs JOIN pp USING (p)
         |JOIN s sa ON sa.c = col_a
         |JOIN s sb ON sb.c = col_b
         |CROSS JOIN nr
         |ORDER BY col_a, col_b""".stripMargin
    },

    // Same gapfilled grid CTEs as crosscorr; frame moments in BIGINT
    // (HUGEINT window sums cast back), then the shared formula set.
    "q_ts_bollinger" ->
      s"""WITH $centGridCte,
         |w AS (
         |  SELECT event_type, h, k,
         |         CAST(count(*) OVER win AS BIGINT) AS n,
         |         CAST(sum(k) OVER win AS BIGINT) AS s1,
         |         CAST(sum((k * k) // $MomentSplit) OVER win AS BIGINT) AS s2hi,
         |         CAST(sum((k * k) % $MomentSplit) OVER win AS BIGINT) AS s2lo
         |  FROM g
         |  WINDOW win AS (PARTITION BY event_type ORDER BY h
         |                 ROWS BETWEEN ${BollWindow - 1} PRECEDING AND CURRENT ROW))
         |SELECT event_type, h AS hour,
         |       ${bollFormulas.mkString(",\n       ")}
         |FROM w WHERE n = $BollWindow ORDER BY event_type, hour""".stripMargin,

    // b and agg are each read twice -> MATERIALIZED; the score runs in
    // HUGEINT where the engine uses DECIMAL(38,0) (the ohlc okey
    // precedent) — identical integers, and the score never reaches the
    // output schema
    "q_ts_downsample" ->
      s"""WITH p AS (
         |  SELECT event_type AS et, epoch_us(ts) AS x,
         |         CAST(round(value * 100) AS BIGINT) AS y
         |  FROM events),
         |x0 AS (SELECT min(x) AS x0 FROM p),
         |b AS MATERIALIZED (
         |  SELECT et, x, y, x - x0 AS xr, x // $HourUs AS b
         |  FROM p CROSS JOIN x0),
         |agg AS MATERIALIZED (
         |  SELECT et, b, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(xr) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
         |  FROM b GROUP BY et, b),
         |nbr AS (
         |  SELECT a.et, a.b, a.n,
         |         pv.n AS np, pv.sx AS sxp, pv.sy AS syp,
         |         nx.n AS nn, nx.sx AS sxn, nx.sy AS syn
         |  FROM agg a
         |  JOIN agg pv ON pv.et = a.et AND pv.b = a.b - 1
         |  JOIN agg nx ON nx.et = a.et AND nx.b = a.b + 1),
         |sc AS (
         |  SELECT b.et, b.b, b.x, b.y, nbr.n,
         |         abs((CAST(sxp AS HUGEINT) * nn - CAST(sxn AS HUGEINT) * np)
         |               * (CAST(b.y AS HUGEINT) * np - syp)
         |             - (CAST(sxp AS HUGEINT) - CAST(b.xr AS HUGEINT) * np)
         |               * (CAST(syn AS HUGEINT) * np - CAST(syp AS HUGEINT) * nn)) AS score
         |  FROM b JOIN nbr ON nbr.et = b.et AND nbr.b = b.b),
         |r AS (
         |  SELECT et, b, x, y, n,
         |         row_number() OVER (PARTITION BY et, b ORDER BY score DESC, x, y) AS rn
         |  FROM sc)
         |SELECT et AS event_type, b AS bucket, x AS ts_us,
         |       CAST(y AS DOUBLE) / 100 AS value, n
         |FROM r WHERE rn = 1 ORDER BY event_type, bucket""".stripMargin,

    "q_ts_crosscorr" ->
      s"""WITH e AS (
         |  SELECT event_type, epoch_us(ts) // $HourUs AS h, value FROM events),
         |r AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
         |g0 AS (
         |  SELECT t.event_type, unnest(generate_series(r.h0, r.h1)) AS h
         |  FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN r),
         |a AS (
         |  SELECT event_type, h,
         |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
         |  FROM e GROUP BY event_type, h),
         |g AS MATERIALIZED (
         |  SELECT g0.event_type, g0.h,
         |         CAST(round(COALESCE(a.sv, 0.0) * 100) AS BIGINT) AS k
         |  FROM g0 LEFT JOIN a USING (event_type, h)),
         |l AS (SELECT unnest(generate_series(0, $AcfMaxLag)) AS lag_h),
         |p AS (
         |  SELECT x.event_type AS et_a, y.event_type AS et_b, l.lag_h,
         |         x.k AS x, y.k AS y
         |  FROM g x CROSS JOIN l
         |  JOIN g y ON y.h = x.h - l.lag_h AND y.event_type <> x.event_type),
         |m AS (
         |  SELECT et_a, et_b, CAST(lag_h AS BIGINT) AS lag_h,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(x) AS DOUBLE) AS sx,
         |         CAST(sum(y) AS DOUBLE) AS sy,
         |         CAST(sum(CAST((x * x) // $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS sxxhi,
         |         CAST(sum(CAST((x * x) % $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS sxxlo,
         |         CAST(sum(CAST((y * y) // $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS syyhi,
         |         CAST(sum(CAST((y * y) % $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS syylo,
         |         CAST(sum(CAST((x * y) // $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS sxyhi,
         |         CAST(sum(CAST((x * y) % $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS sxylo
         |  FROM p GROUP BY et_a, et_b, lag_h)
         |SELECT et_a, et_b, lag_h, n,
         |       ${ccfFormula.mkString(",\n       ")}
         |FROM m ORDER BY et_a, et_b, lag_h""".stripMargin,

    "q_ts_ohlc" ->
      s"""WITH e AS (
         |  SELECT event_type, epoch_us(ts) // $HourUs AS h, value,
         |         CAST(epoch_us(ts) AS HUGEINT) * 10000000000000000000
         |           + event_id AS okey
         |  FROM events)
         |SELECT event_type, h AS hour_idx,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       arg_min(value, okey) AS open,
         |       max(value) AS high,
         |       min(value) AS low,
         |       arg_max(value, okey) AS close,
         |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS volume
         |FROM e GROUP BY event_type, h ORDER BY event_type, hour_idx""".stripMargin,

    "q_ts_candles" ->
      s"""WITH e AS (
         |  SELECT event_type, epoch_us(ts) // $HourUs AS h,
         |         CAST(round(value * 100) AS BIGINT) AS c,
         |         CAST(epoch_us(ts) AS HUGEINT) * 10000000000000000000
         |           + event_id AS okey
         |  FROM events),
         |bars AS (
         |  SELECT event_type, h,
         |         arg_min(c, okey) AS oc, arg_max(c, okey) AS cc
         |  FROM e GROUP BY event_type, h),
         |fl AS (
         |  SELECT event_type, h, cc > oc AS up,
         |         lag(cc > oc, 1) OVER w AS up1,
         |         lag(cc > oc, 2) OVER w AS up2,
         |         lag(cc, 1) OVER w AS cc1,
         |         lag(cc, 2) OVER w AS cc2,
         |         lag(oc, 1) OVER w AS oc1,
         |         oc, cc
         |  FROM bars
         |  WINDOW w AS (PARTITION BY event_type ORDER BY h)),
         |pt AS (
         |  SELECT event_type, h, up,
         |         (up AND up1 AND up2 AND cc > cc1 AND cc1 > cc2) AS tws,
         |         (up AND NOT up1 AND oc <= cc1 AND cc >= oc1) AS eng
         |  FROM fl)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_bars,
         |       CAST(sum(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         |       CAST(sum(CASE WHEN tws THEN 1 ELSE 0 END) AS BIGINT) AS n_three_white,
         |       CAST(sum(CASE WHEN eng THEN 1 ELSE 0 END) AS BIGINT) AS n_engulf,
         |       CAST(coalesce(max(CASE WHEN tws THEN h END), -1) AS BIGINT) AS last_three_white,
         |       CAST(coalesce(max(CASE WHEN eng THEN h END), -1) AS BIGINT) AS last_engulf
         |FROM pt GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_ts_periodogram" ->
      s"""WITH $centGridCte,
         |tab(period, rr, cr, sr) AS (VALUES $dftTableSql),
         |st AS (
         |  SELECT event_type, count(*) AS n_hours, sum(k) AS t
         |  FROM g GROUP BY event_type),
         |res AS (
         |  SELECT g.event_type, p.period, g.h % p.period AS rr,
         |         sum(g.k) AS sk, count(*) AS cnt
         |  FROM g CROSS JOIN (SELECT DISTINCT period FROM tab) p
         |  GROUP BY 1, 2, 3),
         |tm AS (
         |  SELECT res.event_type, res.period,
         |         max(st.n_hours) AS n_hours,
         |         CAST(sum(tab.cr * (st.n_hours * res.sk - res.cnt * st.t))
         |           AS BIGINT) AS asum,
         |         CAST(sum(tab.sr * (st.n_hours * res.sk - res.cnt * st.t))
         |           AS BIGINT) AS bsum
         |  FROM res
         |  JOIN st USING (event_type)
         |  JOIN tab ON tab.period = res.period AND tab.rr = res.rr
         |  GROUP BY 1, 2),
         |ab AS (
         |  SELECT event_type, period, n_hours, $dftAFormula, $dftBFormula
         |  FROM tm)
         |SELECT event_type, CAST(period AS BIGINT) AS period,
         |       CAST(n_hours AS BIGINT) AS n_hours, a_dft, b_dft,
         |       $dftPowerFormula
         |FROM ab ORDER BY event_type, period""".stripMargin,

    "q_ts_perm_entropy" -> {
      val patCols = permPatterns.map { case (nm, id) =>
        s"CAST(coalesce(max(CASE WHEN pid = $id THEN cnt END), 0) AS BIGINT) AS c$nm"
      }.mkString(",\n         ")
      s"""WITH $centGridCte,
         |lagd AS (
         |  SELECT event_type,
         |         lag(k, 2) OVER w AS a, lag(k, 1) OVER w AS b, k AS c
         |  FROM g WINDOW w AS (PARTITION BY event_type ORDER BY h)),
         |pids AS (
         |  SELECT event_type, $permPatternFormula
         |  FROM lagd WHERE a IS NOT NULL),
         |byp AS (
         |  SELECT event_type, pid, CAST(count(*) AS BIGINT) AS cnt
         |  FROM pids GROUP BY event_type, pid),
         |rep AS (
         |  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_triples,
         |         $patCols,
         |         CAST(sum(cnt * (length(bin(cnt)) - 1)) AS BIGINT) AS spart,
         |         CAST(max(cnt) AS BIGINT) AS cmax
         |  FROM byp GROUP BY event_type)
         |SELECT event_type, n_triples, c012, c021, c102, c120, c201, c210,
         |       n_triples * (length(bin(n_triples)) - 1) - spart AS hq_perm,
         |       CAST(cmax AS DOUBLE) / CAST(n_triples AS DOUBLE) AS max_share
         |FROM rep ORDER BY event_type""".stripMargin
    },

    "q_ts_trend" ->
      s"""WITH e AS (
         |  SELECT event_type, epoch_us(ts) // $HourUs AS h, value FROM events),
         |r AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
         |g0 AS (
         |  SELECT t.event_type, r.h0, unnest(generate_series(r.h0, r.h1)) AS h
         |  FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN r),
         |a AS (
         |  SELECT event_type, h,
         |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
         |  FROM e GROUP BY event_type, h),
         |g AS (
         |  SELECT g0.event_type, g0.h - g0.h0 AS x,
         |         CAST(round(COALESCE(a.sv, 0.0) * 100) AS BIGINT) AS k
         |  FROM g0 LEFT JOIN a USING (event_type, h)),
         |m AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(x) AS DOUBLE) AS sxd,
         |         CAST(sum(k) AS DOUBLE) AS syd,
         |         CAST(sum(x * x) AS DOUBLE) AS sxxd,
         |         CAST(sum(x * k) AS DOUBLE) AS sxyd,
         |         CAST(sum(CAST((k * k) // $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS syyhi,
         |         CAST(sum(CAST((k * k) % $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS syylo
         |  FROM g GROUP BY event_type)
         |SELECT event_type, n,
         |       ${trendFormulas.mkString(",\n       ")}
         |FROM m ORDER BY event_type""".stripMargin,

    "q_ts_changepoint" ->
      s"""WITH e AS (
         |  SELECT event_type, epoch_us(ts) // $HourUs AS h, value FROM events),
         |r AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
         |g0 AS (
         |  SELECT t.event_type, unnest(generate_series(r.h0, r.h1)) AS h
         |  FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN r),
         |a AS (
         |  SELECT event_type, h,
         |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
         |  FROM e GROUP BY event_type, h),
         |g AS MATERIALIZED (
         |  SELECT g0.event_type, g0.h,
         |         CAST(round(COALESCE(a.sv, 0.0) * 100) AS BIGINT) AS k
         |  FROM g0 LEFT JOIN a USING (event_type, h)),
         |tq AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(k) AS BIGINT) AS stot
         |       FROM g GROUP BY event_type),
         |cu AS (
         |  SELECT event_type, h,
         |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY h) AS BIGINT) AS n1,
         |         CAST(sum(k) OVER (PARTITION BY event_type ORDER BY h
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s1
         |  FROM g),
         |sc AS (
         |  SELECT cu.event_type, cu.h, cu.n1, tq.n,
         |         CAST(cu.s1 AS DOUBLE) AS s1d, CAST(tq.stot AS DOUBLE) AS sd
         |  FROM cu JOIN tq USING (event_type) WHERE cu.n1 < tq.n),
         |sg AS (
         |  SELECT *, $cpGainExpr AS gain,
         |         row_number() OVER (PARTITION BY event_type
         |                            ORDER BY $cpGainExpr DESC, h) AS rk
         |  FROM sc)
         |SELECT event_type, h AS split_hour, n1 AS n_left, gain,
         |       ${changepointMeans.mkString(",\n       ")}
         |FROM sg WHERE rk = 1 ORDER BY event_type""".stripMargin,

    "q_ts_ewma" ->
      s"""WITH e AS (
         |  SELECT event_type, epoch_us(ts) // $HourUs AS h, value FROM events),
         |r AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
         |g0 AS (
         |  SELECT t.event_type, unnest(generate_series(r.h0, r.h1)) AS h
         |  FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN r),
         |a AS (
         |  SELECT event_type, h,
         |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
         |  FROM e GROUP BY event_type, h),
         |g AS MATERIALIZED (
         |  SELECT g0.event_type, g0.h,
         |         CAST(round(COALESCE(a.sv, 0.0) * 100) AS BIGINT) AS k
         |  FROM g0 LEFT JOIN a USING (event_type, h)),
         |l AS (SELECT unnest(generate_series(0, ${EwmaLags - 1})) AS lag_h),
         |p AS (
         |  SELECT x.event_type, x.h,
         |         (CAST(1 AS BIGINT) << CAST(${EwmaLags - 1} - l.lag_h AS INTEGER)) AS w,
         |         y.k AS k2
         |  FROM g x CROSS JOIN l
         |  JOIN g y ON y.event_type = x.event_type AND y.h = x.h - l.lag_h),
         |m AS (
         |  SELECT event_type, h, CAST(count(*) AS BIGINT) AS n_lags,
         |         CAST(sum(w * k2) AS BIGINT) AS num,
         |         CAST(sum(w) AS BIGINT) AS den
         |  FROM p GROUP BY event_type, h)
         |SELECT event_type, h AS hour_idx, n_lags,
         |       $ewmaFormula
         |FROM m ORDER BY event_type, hour_idx""".stripMargin,

    "q_agg_diversity" ->
      s"""WITH cl AS (
         |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
         |  FROM documents GROUP BY source, lang),
         |sr AS (
         |  SELECT source, CAST(sum(c) AS BIGINT) AS n,
         |         CAST(count(*) AS BIGINT) AS n_langs,
         |         CAST(sum(c * c) AS BIGINT) AS sc2
         |  FROM cl GROUP BY source)
         |SELECT source, n, n_langs,
         |       ${diversityFormulas.mkString(",\n       ")}
         |FROM sr ORDER BY source""".stripMargin,

    "q_profile_drift" ->
      s"""WITH e AS (
         |  SELECT epoch_us(ts) // $HourUs AS h,
         |         CAST(round(value * 100) AS BIGINT) // $WinsorBucket AS bucket,
         |         value
         |  FROM events),
         |md AS (SELECT (min(h) + max(h)) // 2 AS hmid FROM e),
         |bk AS MATERIALIZED (
         |  SELECT bucket,
         |         CAST(sum(CASE WHEN h <= md.hmid THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |         CAST(sum(CASE WHEN h > md.hmid THEN 1 ELSE 0 END) AS BIGINT) AS c2,
         |         sum(CASE WHEN h <= md.hmid THEN CAST(value AS DECIMAL(18,4)) END) AS s1dec,
         |         sum(CASE WHEN h > md.hmid THEN CAST(value AS DECIMAL(18,4)) END) AS s2dec
         |  FROM e CROSS JOIN md GROUP BY bucket),
         |tot AS (
         |  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
         |         CAST(sum(s1dec) AS DOUBLE) AS s1d, CAST(sum(s2dec) AS DOUBLE) AS s2d
         |  FROM bk),
         |tm AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_buckets,
         |         list(struct_pack(bucket := bucket, term := $driftTermExpr)
         |              ORDER BY bucket) AS terms
         |  FROM bk CROSS JOIN tot)
         |SELECT tot.n1, tot.n2, tm.n_buckets,
         |       tot.s1d / tot.n1 AS mean_first, tot.s2d / tot.n2 AS mean_second,
         |       list_reduce(
         |         list_prepend(CAST(0 AS DOUBLE),
         |                      list_transform(tm.terms, x -> x.term)),
         |         (a, b) -> a + b) AS chi2
         |FROM tm CROSS JOIN tot""".stripMargin,

    "q_ts_forecast_naive" ->
      s"""WITH e AS (
         |  SELECT event_type, epoch_us(ts) // $HourUs AS h, value FROM events),
         |r AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
         |g0 AS (
         |  SELECT t.event_type, unnest(generate_series(r.h0, r.h1)) AS h
         |  FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN r),
         |a AS (
         |  SELECT event_type, h,
         |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
         |  FROM e GROUP BY event_type, h),
         |g AS (
         |  SELECT g0.event_type, g0.h,
         |         CAST(round(COALESCE(a.sv, 0.0) * 100) AS BIGINT) AS k
         |  FROM g0 LEFT JOIN a USING (event_type, h)),
         |l AS (
         |  SELECT event_type, k,
         |         lag(k, 24) OVER (PARTITION BY event_type ORDER BY h) AS f
         |  FROM g)
         |SELECT event_type, n_scored,
         |       ${forecastFormulas.mkString(",\n       ")}
         |FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
         |             CAST(sum(abs(k - f)) AS BIGINT) AS sae,
         |             CAST(sum(k - f) AS BIGINT) AS se
         |      FROM l WHERE f IS NOT NULL GROUP BY event_type)
         |ORDER BY event_type""".stripMargin,

    // d is read by the deviation-median window AND the final census ->
    // MATERIALIZED; both medians are the lower-median row_number idiom
    // (ties share a cent key, so the selected VALUE is deterministic)
    "q_ts_anomaly_mad" ->
      """WITH s AS (
        |  SELECT event_type, value,
        |         row_number() OVER (PARTITION BY event_type ORDER BY round(value * 100)) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |m AS (
        |  SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS med
        |  FROM s GROUP BY event_type),
        |d AS MATERIALIZED (
        |  SELECT e.event_type, m.med,
        |         abs(CAST(round(e.value * 100) AS BIGINT)
        |             - CAST(round(m.med * 100) AS BIGINT)) AS dev_c
        |  FROM events e JOIN m USING (event_type)),
        |s2 AS (
        |  SELECT event_type, dev_c,
        |         row_number() OVER (PARTITION BY event_type ORDER BY dev_c) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM d),
        |md AS (
        |  SELECT event_type,
        |         max(CASE WHEN rn = (n + 1) // 2 THEN dev_c END) AS mad_c
        |  FROM s2 GROUP BY event_type)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |       min(d.med) AS med,
        |       CAST(min(md.mad_c) AS DOUBLE) / 100.0 AS mad,
        |       CAST(sum(CASE WHEN d.dev_c > 3 * md.mad_c THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       CAST(sum(CASE WHEN d.dev_c > 3 * md.mad_c THEN 1 ELSE 0 END) AS DOUBLE)
        |         / count(*) AS outlier_rate
        |FROM d JOIN md USING (event_type)
        |GROUP BY d.event_type ORDER BY event_type""".stripMargin,

    // mom is read by all six pair rows -> MATERIALIZED; every SELECT is
    // generated from the same Scala builders as the engine formulas
    "q_profile_corr" -> {
      val quant = corrVars.map { case (nm, src) =>
        s"CAST(round($src * 100) AS BIGINT) AS $nm" }.mkString(",\n         |       ")
      val sums = corrVars.map { case (nm, _) =>
        s"CAST(CAST(sum($nm) AS BIGINT) AS DOUBLE) AS s_$nm" }
      val moments = corrSelfAndCross.flatMap { case (a, b) => Seq(
        s"CAST(sum(CAST($a * $b // $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS m_${a}_${b}_hi",
        s"CAST(sum(CAST($a * $b % $MomentSplit AS DECIMAL(38,0))) AS DOUBLE) AS m_${a}_${b}_lo")
      }
      val rows = corrSelfAndCross.filter { case (a, b) => a != b }
        .map { case (a, b) =>
          s"SELECT '$a' AS var_a, '$b' AS var_b, n, ${corrFormula(a, b)} AS corr FROM mom"
        }
      s"""WITH q AS (
         |  SELECT $quant
         |  FROM lineitem),
         |mom AS MATERIALIZED (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |       ${(sums ++ moments).mkString(",\n         |       ")}
         |  FROM q)
         |SELECT * FROM (
         |${rows.mkString("\n|UNION ALL\n")}
         |) ORDER BY var_a, var_b""".stripMargin
    },

    "q_profile_integrity" -> {
      def edge(child: String, fk: String, parent: String, pk: String,
          label: String) =
        s"""SELECT '$label' AS fk_edge,
           |       (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_child,
           |       CAST(count(*) AS BIGINT) AS n_orphans,
           |       CAST(count(*) AS DOUBLE)
           |         / (SELECT count(*) FROM $child) AS orphan_rate
           |FROM $child c
           |WHERE NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)""".stripMargin
      Seq(
        edge("lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem->orders"),
        edge("lineitem", "l_partkey", "part", "p_partkey", "lineitem->part"),
        edge("lineitem", "l_suppkey", "supplier", "s_suppkey", "lineitem->supplier"),
        edge("orders", "o_custkey", "customer", "c_custkey", "orders->customer"))
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY fk_edge")
    },

    "q_ts_seasonal" ->
      s"""WITH h AS (
         |  SELECT event_type, (epoch_us(ts) // $HourUs) % 24 AS hod,
         |         count(*) AS n, sum(CAST(value AS DECIMAL(18,4))) AS svdec
         |  FROM events GROUP BY 1, 2),
         |t AS (
         |  SELECT event_type, CAST(sum(n) AS BIGINT) AS nt,
         |         sum(svdec) AS svtdec
         |  FROM h GROUP BY event_type),
         |j AS (
         |  SELECT h.event_type, h.hod, CAST(h.n AS BIGINT) AS n, t.nt,
         |         CAST(h.svdec AS DOUBLE) AS svd, CAST(t.svtdec AS DOUBLE) AS svtd
         |  FROM h JOIN t USING (event_type))
         |SELECT event_type, hod, n,
         |       ${seasonalFormulas.mkString(",\n       ")}
         |FROM j ORDER BY event_type, hod""".stripMargin,

    "q_agg_countmin" -> {
      val P = ReplayableHash.P
      s"""WITH c AS (
         |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
         |  FROM lineitem GROUP BY l_partkey),
         |pr AS ${ReplayableHash.paramsSql(ReplayableHash.CountMinParams, CmDepth, "v")},
         |cells AS MATERIALIZED (
         |  SELECT pr.k AS r, ((pr.a * (c.l_partkey % $P) + pr.b) % $P) % $CmWidth AS cm_col,
         |         CAST(sum(c.c) AS BIGINT) AS cell
         |  FROM c CROSS JOIN pr GROUP BY 1, 2),
         |top AS (SELECT l_partkey, c FROM c ORDER BY c DESC, l_partkey LIMIT 20),
         |est AS (
         |  SELECT t.l_partkey, t.c, min(cells.cell) AS c_est
         |  FROM top t CROSS JOIN pr
         |  JOIN cells ON cells.r = pr.k
         |   AND cells.cm_col = ((pr.a * (t.l_partkey % $P) + pr.b) % $P) % $CmWidth
         |  GROUP BY t.l_partkey, t.c)
         |SELECT l_partkey, c AS c_true, CAST(c_est AS BIGINT) AS c_est,
         |       CAST(c_est - c AS BIGINT) AS overest
         |FROM est ORDER BY c_true DESC, l_partkey""".stripMargin
    },

    "q_agg_kmv_distinct" -> {
      val P = ReplayableHash.P
      val (a, b) = ReplayableHash.KmvParams.head
      s"""WITH h AS (
         |  SELECT DISTINCT event_type, ($a * (user_id % $P) + $b) % $P AS hv
         |  FROM events),
         |r AS (
         |  SELECT event_type, hv,
         |         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk,
         |         count(*) OVER (PARTITION BY event_type) AS nd
         |  FROM h),
         |k AS (
         |  SELECT event_type, min(nd) AS nd,
         |         max(CASE WHEN rk = least(nd, $KmvK) THEN hv END) AS kth_hash
         |  FROM r WHERE rk <= $KmvK GROUP BY event_type),
         |e AS (
         |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
         |  FROM events GROUP BY event_type)
         |SELECT k.event_type, e.n_exact,
         |       CAST(least(k.nd, $KmvK) AS BIGINT) AS sketch_size,
         |       CAST(k.kth_hash AS BIGINT) AS kth_hash,
         |       CASE WHEN k.nd < $KmvK THEN CAST(k.nd AS DOUBLE)
         |            ELSE CAST(${KmvK - 1} AS DOUBLE) * CAST($P AS DOUBLE) / CAST(k.kth_hash AS DOUBLE)
         |       END AS est_distinct
         |FROM k JOIN e ON k.event_type = e.event_type
         |ORDER BY k.event_type""".stripMargin
    },

    "q_ts_anova" ->
      s"""WITH ev AS (
         |  SELECT event_type, (epoch_us(ts) // $HourUs) % 24 AS hod,
         |         CAST(round(value * 100) AS BIGINT) AS k
         |  FROM events),
         |cell AS (
         |  SELECT event_type, hod, CAST(count(*) AS BIGINT) AS nh,
         |         CAST(sum(k) AS BIGINT) AS sh
         |  FROM ev GROUP BY event_type, hod),
         |tot AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(k) AS BIGINT) AS sk,
         |         CAST(sum((k * k) // $MomentSplit) AS BIGINT) AS s2hi,
         |         CAST(sum((k * k) % $MomentSplit) AS BIGINT) AS s2lo
         |  FROM ev GROUP BY event_type),
         |trm AS (
         |  SELECT event_type,
         |         ${(0 until 24).map(h =>
      s"max(CASE WHEN hod = $h THEN (CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE)) / nh END) AS t$h")
      .mkString(",\n         ")},
         |         CAST(count(*) AS BIGINT) AS k_groups
         |  FROM cell GROUP BY event_type),
         |tm AS (SELECT event_type, $anovaSumTerm AS sumterm, k_groups
         |       FROM trm),
         |j AS (
         |  SELECT t.event_type, t.n, tm.k_groups, tm.sumterm,
         |         CAST(t.sk AS DOUBLE) AS skd,
         |         (CAST(t.s2hi AS DOUBLE) * $MomentSplit.0 + CAST(t.s2lo AS DOUBLE)) AS s2d,
         |         CAST(t.n AS DOUBLE) AS nd
         |  FROM tot t JOIN tm ON tm.event_type = t.event_type),
         |ss AS (
         |  SELECT event_type, n, k_groups,
         |         s2d - skd * skd / nd AS sst,
         |         sumterm - skd * skd / nd AS ssb
         |  FROM j),
         |sw AS (SELECT event_type, n, k_groups, sst, ssb, sst - ssb AS ssw FROM ss)
         |SELECT event_type, n, sst, ssb, ssw,
         |       ssb / sst AS eta_sq,
         |       (ssb / (k_groups - 1)) / (ssw / (n - k_groups)) AS f_stat
         |FROM sw ORDER BY event_type""".stripMargin,

    // single-node DuckDB may run the naive per-group cumulative — the
    // bucketed two-level shape is the ENGINE's scale discipline, the
    // oracle only has to agree on the selected value
    "q_agg_weighted_median" ->
      """WITH h AS (
        |  SELECT l_returnflag AS grp,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cent,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT grp, cent, w,
        |         sum(w) OVER (PARTITION BY grp ORDER BY cent) AS cw,
        |         sum(w) OVER (PARTITION BY grp) AS tw
        |  FROM h)
        |SELECT grp AS l_returnflag,
        |       CAST(min(tw) AS BIGINT) AS total_weight,
        |       CAST(min(CASE WHEN cw * 2 >= tw THEN cent END) AS DOUBLE) / 100 AS w_median
        |FROM c GROUP BY grp ORDER BY l_returnflag""".stripMargin,

    "q_ts_theil_sen" ->
      s"""WITH $centGridCte,
         |p AS (
         |  SELECT g1.event_type,
         |         CAST(g2.k - g1.k AS DOUBLE) / CAST(g2.h - g1.h AS DOUBLE) AS slope
         |  FROM g g1 JOIN g g2
         |    ON g1.event_type = g2.event_type AND g1.h < g2.h),
         |rk AS (
         |  SELECT event_type, slope,
         |         row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
         |         count(*) OVER (PARTITION BY event_type) AS np
         |  FROM p)
         |SELECT event_type, CAST(np AS BIGINT) AS n_pairs,
         |       slope / CAST(100 AS DOUBLE) AS slope_per_hour
         |FROM rk WHERE rn = (np + 1) // 2
         |ORDER BY event_type""".stripMargin,

    "q_ts_mann_kendall" ->
      s"""WITH $centGridCte,
         |pr AS (
         |  SELECT g1.event_type,
         |         CAST(sum(CASE WHEN g2.k > g1.k THEN 1
         |                       WHEN g2.k < g1.k THEN -1 ELSE 0 END) AS BIGINT) AS s
         |  FROM g g1 JOIN g g2
         |    ON g1.event_type = g2.event_type AND g1.h < g2.h
         |  GROUP BY g1.event_type),
         |tg AS (
         |  SELECT event_type, k, CAST(count(*) AS BIGINT) AS t
         |  FROM g GROUP BY event_type, k),
         |tv AS (
         |  SELECT event_type, CAST(sum(t) AS BIGINT) AS n,
         |         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_adj
         |  FROM tg GROUP BY event_type),
         |j AS (
         |  SELECT pr.event_type, pr.s,
         |         tv.n * (tv.n - 1) * (2 * tv.n + 5) - tv.tie_adj AS vnum
         |  FROM pr JOIN tv ON tv.event_type = pr.event_type),
         |jz AS (
         |  SELECT event_type, CAST(s AS BIGINT) AS s_stat,
         |         CAST(vnum AS BIGINT) AS var_num, s, vnum
         |  FROM j),
         |z AS (SELECT event_type, s_stat, var_num, $mkZFormula FROM jz)
         |SELECT event_type, s_stat, var_num, z, $mkTrendFormula
         |FROM z ORDER BY event_type""".stripMargin,

    "q_ts_runs_test" ->
      s"""WITH $centGridCte,
         |med AS (
         |  SELECT event_type, max(CASE WHEN rn = (ng + 1) // 2 THEN k END) AS med_k
         |  FROM (SELECT event_type, k,
         |          row_number() OVER (PARTITION BY event_type ORDER BY k, h) AS rn,
         |          count(*) OVER (PARTITION BY event_type) AS ng
         |        FROM g) s
         |  GROUP BY event_type),
         |sg AS (
         |  SELECT g.event_type, g.h,
         |         CASE WHEN g.k > med.med_k THEN 1 ELSE -1 END AS sgn
         |  FROM g JOIN med USING (event_type)
         |  WHERE g.k <> med.med_k),
         |runs AS (
         |  SELECT event_type,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
         |         CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
         |         CAST(sum(CASE WHEN prev IS NULL OR prev <> sgn THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
         |  FROM (SELECT event_type, sgn,
         |          lag(sgn) OVER (PARTITION BY event_type ORDER BY h) AS prev
         |        FROM sg) t
         |  GROUP BY event_type),
         |st1 AS (SELECT event_type, n, n_above, n_below, n_runs, $runsEFormula FROM runs),
         |st2 AS (SELECT event_type, n, n_above, n_below, n_runs, e_runs, $runsVFormula FROM st1),
         |st3 AS (SELECT event_type, n, n_above, n_below, n_runs, e_runs, var_runs, $runsZFormula FROM st2)
         |SELECT event_type, n, n_above, n_below, n_runs, e_runs, var_runs, z, $runsVerdictFormula
         |FROM st3 ORDER BY event_type""".stripMargin,

    "q_ts_cusum" ->
      s"""WITH $centGridCte,
         |med AS (
         |  SELECT event_type, max(CASE WHEN rn = (ng + 1) // 2 THEN k END) AS med_k
         |  FROM (SELECT event_type, k,
         |          row_number() OVER (PARTITION BY event_type ORDER BY k, h) AS rn,
         |          count(*) OVER (PARTITION BY event_type) AS ng
         |        FROM g) s1
         |  GROUP BY event_type),
         |dev AS (
         |  SELECT g.event_type, g.h, g.k - med.med_k AS dev
         |  FROM g JOIN med USING (event_type)),
         |mad AS (
         |  SELECT event_type, max(CASE WHEN rn = (ng + 1) // 2 THEN adev END) AS mad_k
         |  FROM (SELECT event_type, abs(dev) AS adev, h,
         |          row_number() OVER (PARTITION BY event_type ORDER BY abs(dev), h) AS rn,
         |          count(*) OVER (PARTITION BY event_type) AS ng
         |        FROM dev) s2
         |  GROUP BY event_type),
         |c1 AS (
         |  SELECT event_type, h,
         |         sum(dev - mad_k) OVER (PARTITION BY event_type ORDER BY h
         |                                ROWS UNBOUNDED PRECEDING) AS c
         |  FROM dev JOIN mad USING (event_type)),
         |c2 AS (
         |  SELECT event_type, h,
         |         c - least(0, min(c) OVER (PARTITION BY event_type ORDER BY h
         |                                   ROWS UNBOUNDED PRECEDING)) AS s
         |  FROM c1),
         |pk AS (
         |  SELECT event_type, s, h FROM (
         |    SELECT event_type, s, h,
         |           row_number() OVER (PARTITION BY event_type
         |                              ORDER BY s DESC, h ASC) AS rn
         |    FROM c2) WHERE rn = 1)
         |SELECT c2.event_type, CAST(count(*) AS BIGINT) AS n_hours,
         |       CAST(min(pk.s) AS DOUBLE) / 100 AS max_cusum,
         |       CAST(min(pk.h) AS BIGINT) AS peak_hour,
         |       CAST(sum(CASE WHEN c2.s > 3 * mad.mad_k THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
         |       CAST(min(med.med_k) AS DOUBLE) / 100 AS target,
         |       CAST(3 * min(mad.mad_k) AS DOUBLE) / 100 AS threshold
         |FROM c2 JOIN mad USING (event_type) JOIN med USING (event_type)
         |         JOIN pk USING (event_type)
         |GROUP BY c2.event_type ORDER BY event_type""".stripMargin
  )
}
