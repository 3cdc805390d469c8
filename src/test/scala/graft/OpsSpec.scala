package graft

/** Every declared SURVEY §2B query runs on sf0.001, returns rows, and keeps
  * a stable schema; every oracled key has an oracle and vice versa.
  * (Value-level correctness is the driver's DuckDB gate, replayed locally by
  * scripts/check.py — this suite is the cheap in-build regression net.)
  */
class OpsSpec extends SparkTestBase {

  test("queries and oracleSql keys are consistent") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert(q.forall(_.startsWith("q_")))
    assert(q.size >= 127, s"inventory shrank: ${q.size}")
    assert(o.size >= 125, s"oracled set shrank: ${o.size}")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs non-empty on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("partitioned sink lays out one directory per lang and prunes on read") {
    import org.apache.spark.sql.functions.col
    // the query itself writes the layout on first use
    SparkEntry.queries("q_sink_partitioned")(spark, sfDir).count()
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft-sink-part-${graft.ops.SourceSinkOps.fixtureKey(sfDir, "documents.parquet")}")
    val langDirs = path.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(langDirs.forall(_.startsWith("lang=")), langDirs.mkString(","))
    val pruned = spark.read.parquet(path.toString).where(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      "expected the lang predicate to prune partitions at the scan")
    val full = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(pruned.count() ==
      full.where(col("lang") === "en").count())
  }

  test("bucketed sink: both join sides pre-bucketed, no exchange below the join") {
    // static plan (AQE off) so the join subtree is directly inspectable —
    // the PlanAudit convention; broadcast disabled because at the TOY
    // fixture size Spark would (correctly) broadcast the tiny side and
    // never exercise the bucket path this test exists to pin
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val df = SparkEntry.queries("q_sink_bucketed")(spark, sfDir)
    // the co-location claim, asserted on the PHYSICAL plan: the sort-merge
    // join consumes both bucketed scans directly — any Exchange below the
    // join would mean the layout bought nothing
    val plan = df.queryExecution.executedPlan
    val smj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.nonEmpty, "expected a sort-merge join over the bucketed tables")
    val exchangesBelowJoin = smj.head.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchangesBelowJoin.isEmpty,
      s"bucketed join must not shuffle either side:\n$plan")
    assert(plan.toString.contains("SelectedBucketsCount"),
      "expected bucketed file scans")
    // and the content equals the plain join on the sources
    import org.apache.spark.sql.functions.{col, count, lit}
    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = graft.ops.table(spark, sfDir, "lineitem")
      .join(graft.ops.table(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).cast("long").as("n"),
        graft.ops.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want, "bucketed-layout join content differs from the sources")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("try_* functions return NULL on fault instead of ANSI-throwing (r12)") {
    val rows = SparkEntry.queries("q_fn_try")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val users = ops.table(spark, sfDir, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = users.groupBy(_._1)
    rows.foreach { case (t, n, divOk, castOk, rtOk, addOk) =>
      val us = byType(t).map(_._2)
      assert(n == us.length.toLong, s"$t row count")
      assert(castOk == 0L, s"$t: an alphabetic string must never cast")
      assert(rtOk == n, s"$t: the id roundtrip must always cast")
      assert(divOk == us.count(_ % 3 != 0).toLong, s"$t: zero-denominator NULLs")
      assert(addOk == us.count(_ % 2 == 0).toLong, s"$t: overflow NULLs")
      assert(divOk < n && addOk < n, s"$t: both fault arms must actually fire")
    }
    // and the raw ANSI behaviors the try_* forms shield against DO throw
    intercept[Exception] {
      spark.sql("SELECT CAST('click' AS BIGINT)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT 9223372036854775807 + 1").collect()
    }
  }

  test("bitmap audience overlap equals a driver-side set replay (r12)") {
    val rows = SparkEntry.queries("q_agg_bitmap_overlap")(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(rows.nonEmpty)
    val ev = ops.table(spark, sfDir, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // driver-side audiences: users strictly above the per-type LOWER
    // median event count (selected by value over the count histogram)
    val aud = ev.groupBy(_._1).map { case (t, es) =>
      val counts = es.groupBy(_._2).map { case (u, xs) => (u, xs.length.toLong) }
      val sorted = counts.values.toSeq.sorted
      val med = sorted(((sorted.length + 1) / 2) - 1)
      (t, counts.filter(_._2 > med).keySet)
    }
    val types = aud.keys.toSeq.sorted
    for (a <- types; b <- types if a < b) {
      val (na, nb, common, jac) = rows((a, b))
      val (sa, sb) = (aud(a), aud(b))
      val inter = (sa & sb).size.toLong
      assert((na, nb, common) ==
        ((sa.size.toLong, sb.size.toLong, inter)), s"$a/$b set sizes")
      assert(jac == inter.toDouble / (sa.size + sb.size - inter), s"$a/$b jaccard")
    }
    // the heavy-user cut is non-degenerate: some but not all users qualify
    assert(aud.values.forall(s => s.nonEmpty),
      "empty audience — median cut lost its bite")
  }

  test("binaryFile source: every exported file reads back byte-exact (r12)") {
    val rows = SparkEntry.queries("q_src_binaryfile")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // byte fidelity: every file's sha2 matched its source text's sha2
    rows.foreach { case (b, n, bytes, ok) =>
      assert(ok == n, s"bucket $b: $ok of $n files byte-exact")
      assert(bytes > 0, s"bucket $b: empty byte total")
    }
    // the 16 buckets partition the corpus
    val docs = ops.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
    assert(rows.map(_._2).sum == docs.length.toLong, "every doc exported once")
    val expBytes = docs.map(_.getString(1)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong).sum
    assert(rows.map(_._3).sum == expBytes, "UTF-8 byte totals")
  }

  test("schema evolution: mergeSchema unifies generations, old rows read NULL (r12)") {
    import org.apache.spark.sql.functions.col
    SparkEntry.queries("q_src_schema_evolution")(spark, sfDir).count()
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft-src-evo-" + graft.ops.SourceSinkOps
        .fixtureKey(sfDir, "events.parquet")
        .replaceAll("[^0-9a-fA-F]", "").toLowerCase).getAbsolutePath
    // gen1 alone has NO user_id column; the merged read has it
    val gen1 = spark.read.parquet(s"$path/gen1")
    assert(!gen1.columns.contains("user_id"), "gen1 must predate the column")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$path/gen1", s"$path/gen2")
    assert(merged.columns.contains("user_id"), "merged schema must unify")
    // every NULL user_id row is a gen1 (even event_id) row and vice versa
    assert(merged.where(col("user_id").isNull)
      .where(col("event_id") % 2 =!= 0).count() == 0L)
    assert(merged.where(col("user_id").isNotNull)
      .where(col("event_id") % 2 =!= 1).count() == 0L)
    assert(merged.count() ==
      ops.table(spark, sfDir, "events").count(), "no rows lost across generations")
  }

  test("dpp study: the fact scan carries a runtime dynamicpruning filter (r12)") {
    import org.apache.spark.sql.functions.col
    val df = SparkEntry.queries("q_join_dpp")(spark, sfDir)
    // the whole point of the key: the partitioned customer scan must be
    // pruned by a RUNTIME subquery from the region-filtered dim side —
    // a static plan reading all 25 nation directories would mean the
    // layout bought nothing
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning PartitionFilter on the fact scan:\n$plan")
    // content equals the plain star join on the sources
    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = graft.ops.table(spark, sfDir, "customer")
      .join(graft.ops.table(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(graft.ops.table(spark, sfDir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).cast("long").as("n_customers"),
        graft.ops.dsum(col("c_acctbal")).as("total_acctbal"))
      .orderBy("n_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want, "partitioned-layout join content differs from the sources")
  }

  test("FP-sensitive aggregates are run-to-run deterministic") {
    for (name <- Seq("q_agg_basic", "q_join_multiway", "q_udaf_weighted", "q_win_moving")) {
      val a = SparkEntry.queries(name)(spark, sfDir).collect().toSeq
      val b = SparkEntry.queries(name)(spark, sfDir).collect().toSeq
      assert(a == b, s"$name not deterministic")
    }
  }

  test("ntile quartiles are balanced within each segment") {
    val rows = SparkEntry.queries("q_win_ntile")(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (seg, rs) =>
      val sizes = rs.groupBy(_._2).map(_._2.length)
      assert(sizes.max - sizes.min <= 1, s"segment $seg unbalanced: $sizes")
    }
  }

  // ---- quantitative pins for the two BY-DESIGN non-oracled sketch rows ----
  // (cross-engine sketch algorithms differ, so there is no DuckDB hash gate;
  // these pin the error bound instead of just the shape. Both sketches hash
  // deterministically, so the observed error is a fixed fact of the fixture
  // — the assertions are exact-repeatable, not flaky.)

  test("q_agg_approx_distinct (KMV) stays within 3×rsd of the exact distinct count (sf0.01)") {
    // hash-gated since r13 (deterministic KMV with an exact DuckDB twin);
    // this spec keeps the ERROR-BOUND pin the old HLL row carried: the
    // estimate must sit inside 3·rsd = 3/√(k−2) = 38.1% at k = 64, and
    // the emitted within_3rsd column must agree with the spec-side bound
    val rows = SparkEntry.queries("q_agg_approx_distinct")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.length >= 3)
    rows.foreach { r =>
      val approx = r.getAs[Double]("approx_parts")
      val exact = r.getAs[Long]("exact_parts").toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.381,
        s"group ${r.get(0)}: approx=$approx exact=$exact relErr=$relErr > 0.381")
      // the emitted bound column (what the driver artifact records) agrees
      assert(r.getAs[Boolean]("within_3rsd"), s"group ${r.get(0)}: " +
        "within_3rsd column false while the spec-side bound holds")
      // over-capacity groups must be in the estimator branch at sf0.01
      assert(r.getAs[Long]("sketch_size") == graft.ops.DiagOps.KmvK.toLong,
        s"group ${r.get(0)}: expected a full sketch at sf0.01")
    }
  }

  test("ops.table normalizes every historical events.ts physical form to µs timestamps") {
    import org.apache.spark.sql.functions._
    // the loader has to accept three fixture generations: raw ns LONGs
    // (legacy/probe replicators), TIMESTAMP_NTZ (r9 fixtures), and plain
    // TIMESTAMP — all must come back as a session-TZ TimestampType column
    // with identical µs values, or every epoch-µs oracle silently shifts
    val base = java.nio.file.Files.createTempDirectory("graft-evts").toString
    val tUs = 1700000000123456L
    def check(dir: String): Unit = {
      val df = ops.table(spark, dir, "events")
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, s"$dir: ${df.schema("ts")}")
      val got = df.select(unix_micros(col("ts"))).head().getLong(0)
      assert(got == tUs, s"$dir: $got != $tUs")
    }
    // ns longs
    val d1 = s"$base/ns"
    spark.range(1).select(lit(tUs * 1000L).as("ts"), lit(1L).as("event_id"))
      .write.parquet(s"$d1/events.parquet")
    check(d1)
    // TIMESTAMP_NTZ
    val d2 = s"$base/ntz"
    spark.range(1).select(
        timestamp_micros(lit(tUs)).cast("timestamp_ntz").as("ts"),
        lit(1L).as("event_id"))
      .write.parquet(s"$d2/events.parquet")
    check(d2)
    // plain TIMESTAMP (already the target shape)
    val d3 = s"$base/ts"
    spark.range(1).select(timestamp_micros(lit(tUs)).as("ts"),
        lit(1L).as("event_id"))
      .write.parquet(s"$d3/events.parquet")
    check(d3)
  }

  test("sample-percentile: deterministic across partitionings, near the exact median (sf0.01)") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.01"
    val q = SparkEntry.queries("q_agg_approx_percentile")
    val rows = q(spark, dir).collect()
    assert(rows.length >= 3)
    val li = ops.table(spark, dir, "lineitem")
      .select("l_returnflag", "l_extendedprice").cache()
    try {
      rows.foreach { r =>
        val flag = r.getString(0)
        val n = r.getAs[Long]("n_rows")
        val ns = r.getAs[Long]("n_sample")
        assert(ns == math.min(n, ops.DiagOps.SampleK.toLong),
          s"group $flag: sample size $ns vs n=$n")
        val approx = r.getAs[Double]("approx_p50")
        val grp = li.where(col("l_returnflag") === flag)
        val lt = grp.where(col("l_extendedprice") < approx).count()
        val le = grp.where(col("l_extendedprice") <= approx).count()
        // a 512-row uniform sample's median rank error has σ ≈
        // 0.5/√512 ≈ 2.2% — [0.42, 0.58] is a ≥3.6σ band
        assert(lt <= n * 0.58 && le >= n * 0.42,
          s"group $flag: approx=$approx rank in [${lt + 1},$le] " +
            s"outside [${n * 0.42},${n * 0.58}] of n=$n")
      }
      // the bottom-k sample is a pure function of the data: an adversarial
      // repartitioning (and per-partition order scramble) must reproduce
      // the result BIT-identically — the property the GK built-in lacks
      val base = q(spark, dir).collect().map(_.toSeq).toSeq
      val scrambled = {
        val P = graft.functions.ReplayableHash.P
        val (a, b) = graft.functions.ReplayableHash.SamplePctlParams.head
        val samp = org.apache.spark.sql.functions.udaf(ops.DiagOps.BottomKSample)
        ops.table(spark, dir, "lineitem")
          .repartition(17, col("l_partkey"))
          .sortWithinPartitions(col("l_shipdate"))
          .select(col("l_returnflag"),
            org.apache.spark.sql.functions.expr("l_orderkey * 8 + l_linenumber").as("uk"),
            org.apache.spark.sql.functions.expr(
              "CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
          .withColumn("pri", org.apache.spark.sql.functions.expr(
            s"($a * (uk % $P) + $b) % $P"))
          .groupBy("l_returnflag")
          .agg(samp(col("pri"), col("uk"), col("cents")).as("sk"),
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"))
          .select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
            col("sk._1").as("n_sample"),
            (col("sk._2").cast("double") / org.apache.spark.sql.functions.lit(100))
              .as("approx_p50"))
          .orderBy("l_returnflag")
          .collect().map(_.toSeq).toSeq
      }
      assert(base == scrambled,
        "bottom-k sample percentile must be partitioning-independent")
    } finally li.unpersist()
  }

  test("nearest as-of equals a driver-side bidirectional replay") {
    val ev = graft.ops.table(spark, sfDir, "events")
      .where("event_type IN ('click', 'purchase')")
      .selectExpr("user_id", "unix_micros(ts) AS t", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, if (e._4 == "click") 0 else 1, e._3))
      sorted.zipWithIndex.collect { case ((_, t, id, "purchase"), i) =>
        val bb = sorted.take(i).filter(_._4 == "click")
          .sortBy(e => (e._2, e._3)).lastOption
        val fb = sorted.drop(i + 1).filter(_._4 == "click")
          .sortBy(e => (e._2, e._3)).headOption
        val pickB = bb.isDefined &&
          (fb.isEmpty || t - bb.get._2 <= fb.get._2 - t)
        if (bb.isEmpty && fb.isEmpty) (id, u, None, None, None)
        else if (pickB) (id, u, Some(bb.get._3), Some(t - bb.get._2),
          Some("backward"))
        else (id, u, Some(fb.get._3), Some(fb.get._2 - t), Some("forward"))
      }
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_join_asof_nearest")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.getString(4)))).toSeq
    assert(got == expected, "nearest-click assignment differs from the replay")
    // both directions genuinely occur on the fixture (clicks scatter
    // around purchases) — the discriminating branch has real coverage
    val dirs = got.flatMap(_._5).distinct.sorted
    assert(dirs == Seq("backward", "forward"), s"directions seen: $dirs")
    got.foreach { case (_, _, _, dt, _) => dt.foreach(d => assert(d >= 0)) }
  }

  test("tolerance as-of equals a driver-side bounded-backward replay (r13)") {
    val tol = graft.ops.JoinOps.AsofTolUs
    val ev = graft.ops.table(spark, sfDir, "events")
      .where("event_type IN ('click', 'purchase')")
      .selectExpr("user_id", "unix_micros(ts) AS t", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, if (e._4 == "click") 0 else 1, e._3))
      sorted.zipWithIndex.collect { case ((_, t, id, "purchase"), i) =>
        val bb = sorted.take(i).filter(_._4 == "click")
          .sortBy(e => (e._2, e._3)).lastOption
        val m = bb.exists(b => t - b._2 <= tol)
        (id, u, if (m) Some(bb.get._3) else None,
          if (m) Some(t - bb.get._2) else None, m)
      }
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_join_asof_tolerance")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getBoolean(4))).toSeq
    assert(got == expected, "tolerance-bounded assignment differs from replay")
    // the tolerance genuinely bites on the fixture: both matched and
    // unmatched purchases occur, and every gap honors the bound
    assert(got.exists(_._5) && got.exists(!_._5),
      s"matched=${got.count(_._5)} of ${got.size} — the bound must split")
    got.foreach { case (_, _, _, g, m) =>
      if (m) assert(g.exists(d => d >= 0 && d <= tol)) else assert(g.isEmpty) }
  }

  test("zorder layout report: interleave replay + the locality punchline") {
    val rows = SparkEntry.queries("q_layout_zorder")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6))).toMap
    assert(rows.keySet == Set("linear", "zorder"))
    // driver-side Morton replay over the raw keys
    def morton(ka: Long, kb: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((ka >> i) & 1L) << (2 * i)) | (((kb >> i) & 1L) << (2 * i + 1))
      }
    val keys = ops.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cell = 1L << 12
    def spans(assign: ((Long, Long)) => Long) = {
      val cells = keys.groupBy(assign)
      val aSpans = cells.values.map(v => v.map(_._1).max - v.map(_._1).min + 1)
      val bSpans = cells.values.map(v => v.map(_._2).max - v.map(_._2).min + 1)
      (cells.size.toLong, aSpans.sum.toDouble / cells.size,
        bSpans.sum.toDouble / cells.size, aSpans.max, bSpans.max)
    }
    val (zc, za, zb, zam, zbm) = spans { case (ka, kb) => morton(ka, kb) / cell }
    val (lc, la, lb, lam, lbm) = spans { case (ka, kb) => (ka * 65536 + kb) / cell }
    assert(rows("zorder") == ((zc, keys.length.toLong, za, zb, zam, zbm)))
    assert(rows("linear") == ((lc, keys.length.toLong, la, lb, lam, lbm)))
    // the punchline: z-order bounds the SECOND dimension's worst-case
    // span at the cell's 64-value extent; the orderkey-major linear
    // layout leaves it near the full partkey domain
    assert(rows("zorder")._6 <= 64L,
      "z-order must bound the partkey span at the cell extent")
    assert(rows("zorder")._6 < rows("linear")._6,
      "z-order must bound the partkey span below the linear layout's")
  }

  test("zonemap audit: pruning replay + the range-clustering punchline (r12c3)") {
    val rows = SparkEntry.queries("q_layout_zonemap")(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getDouble(8), r.getDouble(9))))
      .toMap
    assert(rows.keys.map(_._1).toSet == Set("ingest", "pk_range", "zorder"))
    def morton(ka: Long, kb: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((ka >> i) & 1L) << (2 * i)) | (((kb >> i) & 1L) << (2 * i + 1))
      }
    val keys = ops.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (mka, mkb) = (keys.map(_._1).max, keys.map(_._2).max)
    val mkz = keys.map { case (a, b) => morton(a, b) }.max
    val layouts: Map[String, ((Long, Long)) => Long] = Map(
      "ingest" -> { case (ka, _) => ka / (mka / 64 + 1) },
      "pk_range" -> { case (_, kb) => kb / (mkb / 64 + 1) },
      "zorder" -> { case (ka, kb) => morton(ka, kb) / (mkz / 64 + 1) })
    (0L until 8L).foreach { pid =>
      val lo = pid * (mkb + 1) / 8
      val hi = (pid + 1) * (mkb + 1) / 8
      val matched = keys.count { case (_, kb) => kb >= lo && kb < hi }.toLong
      layouts.foreach { case (nm, assign) =>
        val zones = keys.groupBy(assign)
        val scanned = zones.filter { case (_, zk) =>
          val (zmin, zmax) = (zk.map(_._2).min, zk.map(_._2).max)
          !(zmax < lo || zmin >= hi)
        }
        val (gl, gh, gn, gzs, grs, grm, gskip, gamp) = {
          val t = rows((nm, pid))
          (t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8)
        }
        assert((gl, gh) == ((lo, hi)), s"$nm/$pid bounds")
        assert(gn == zones.size.toLong, s"$nm/$pid zone count")
        assert(gzs == scanned.size.toLong, s"$nm/$pid zones scanned")
        assert(grs == scanned.values.map(_.length.toLong).sum, s"$nm/$pid rows scanned")
        assert(grm == matched, s"$nm/$pid rows matched")
        assert(gskip == (gn - gzs).toDouble / gn.toDouble, s"$nm/$pid skip")
        val expAmp = if (grm > 0) grs.toDouble / grm.toDouble else 0.0
        assert(gamp == expAmp, s"$nm/$pid read amp")
      }
      // the layout punchline: clustering the predicate column prunes at
      // least as well as ingest order on every range predicate
      assert(rows(("pk_range", pid))._4 <= rows(("ingest", pid))._4,
        s"pred $pid: pk_range must scan no more zones than ingest")
    }
  }

  test("csv malformed-row quarantine equals the ground-truth corruption (r12c3)") {
    val rows = SparkEntry.queries("q_src_csv_malformed")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows.nonEmpty)
    val truth = ops.table(spark, sfDir, "events")
      .selectExpr("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    truth.foreach { case (t, es) =>
      val (n, c, s) = rows(t)
      assert(n == es.length.toLong, s"$t row count")
      assert(c == es.count(_._2 % 7 == 0).toLong, s"$t quarantine count")
      val good = es.filter(_._2 % 7 != 0).map(e => BigDecimal(e._3)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      assert(s == good.toDouble, s"$t good-side exact sum")
      assert(c > 0 && c < n, s"$t both sides of the quarantine populated")
    }
  }

  test("band join equals a brute-force per-user replay, probe fan duplicate-free (r12c3)") {
    val ev = ops.table(spark, sfDir, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS t_us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val expected = byUser.flatMap { case (u, es) =>
      val clicks = es.filter(_._2 == "click").map(_._3)
      val purch = es.filter(_._2 == "purchase").map(_._3)
      val gaps = for {
        tc <- clicks; tp <- purch if math.abs(tp - tc) <= 60000000L
      } yield tp - tc
      if (gaps.isEmpty) None
      else Some((u, (gaps.length.toLong, gaps.min, gaps.max)))
    }.toSeq.sortBy { case (u, (n, _, _)) => (-n, u) }.take(200)
    val got = SparkEntry.queries("q_join_band")(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toSeq
    assert(got.nonEmpty, "fixture must produce band pairs")
    assert(got == expected, "band pairs, gaps, or order differ")
  }

  test("salted skew join: identical to the plain join, salt in the shuffle keys") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val df = SparkEntry.queries("q_join_skew_salted")(spark, sfDir)
    val salted = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = ops.table(spark, sfDir, "lineitem")
      .join(ops.table(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).cast("long").as("n_lines"),
        org.apache.spark.sql.functions.sum(
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy("p_brand")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq,
      "salting must not change the join result")
    // with broadcast disabled the static plan must shuffle on (key, salt):
    // a hot partkey's rows scatter across SaltFactor partitions
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_join_skew_salted")(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("salt"), s"salt column missing from the plan:\n$plan")
      val joinKeys = "hashpartitioning\\([^)]*salt".r
      assert(joinKeys.findFirstIn(plan).isDefined,
        s"shuffle must partition on the salted key:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("bloom prefilter: no false negatives + exact driver replay (r12)") {
    val r = SparkEntry.queries("q_join_bloom_prefilter")(spark, sfDir)
      .collect().head
    val (nf, np, nm, nfp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // the Bloom guarantee: every member row passes; pass = member + fp
    assert(np >= nm && np == nm + nfp)
    // full driver replay of the filter
    val P = graft.functions.ReplayableHash.P
    val pr = graft.functions.ReplayableHash.BloomParams
    val dimKeys = ops.table(spark, sfDir, "part").where("p_size > 40")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val posSet = dimKeys.flatMap(k =>
      pr.map { case (a, b) => ((a * (k % P) + b) % P) % 65536 })
    val fact = ops.table(spark, sfDir, "lineitem")
      .select("l_partkey").collect().map(_.getLong(0))
    val pass = fact.count(k =>
      pr.forall { case (a, b) => posSet(((a * (k % P) + b) % P) % 65536) })
    assert(nf == fact.length.toLong && np == pass.toLong)
    assert(nm == fact.count(dimKeys).toLong)
    if (!r.isNullAt(4))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0)
  }

  test("bag set ops keep exact multiplicities (r12)") {
    val orders = ops.table(spark, sfDir, "orders")
      .select("o_custkey", "o_totalprice", "o_orderpriority", "o_orderstatus")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getString(3)))
    def mult(ks: Seq[Long]) =
      ks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val a1 = mult(orders.filter(_._2 > 100000).map(_._1).toSeq)
    val b1 = mult(orders.filter(_._3 == "1-URGENT").map(_._1).toSeq)
    val expInter = (a1.keySet & b1.keySet).iterator
      .map(k => k -> math.min(a1(k), b1(k))).toMap
    val gotInter = mult(SparkEntry.queries("q_set_intersect_all")(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq)
    assert(gotInter == expInter, "INTERSECT ALL must keep min(multA, multB)")

    val a2 = mult(orders.map(_._1).toSeq)
    val b2 = mult(orders.filter(_._4 == "F").map(_._1).toSeq)
    val expExcept = a2.iterator
      .map { case (k, n) => k -> (n - b2.getOrElse(k, 0L)) }
      .filter(_._2 > 0).toMap
    val gotExcept = mult(SparkEntry.queries("q_set_except_all")(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq)
    assert(gotExcept == expExcept, "EXCEPT ALL must keep multA - multB")
  }

  test("scd2 merge emits a consistent versioned dimension (r12)") {
    val rows = SparkEntry.queries("q_sink_scd2")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val Open = 253402300800000L
    val byCust = rows.groupBy(_._1)
    val nCust = ops.table(spark, sfDir, "customer").count()
    assert(byCust.size == nCust.toInt, "every customer appears")
    byCust.foreach { case (ck, vs) =>
      val sorted = vs.sortBy(_._3)
      // exactly one OPEN current row per customer, closing the chain
      assert(sorted.count(_._5) == 1, s"cust $ck current-row count")
      assert(sorted.last._5 && sorted.last._4 == Open, s"cust $ck open tail")
      assert(sorted.head._3 == 0L, s"cust $ck chain starts at epoch 0")
      // intervals tile without gap or overlap: valid_to(i) == valid_from(i+1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 == b._3, s"cust $ck interval chain broken")
          assert(!a._5, s"cust $ck non-tail row must be closed")
        case _ =>
      }
      assert(sorted.length <= 2, "this change batch versions at most once")
      if (sorted.length == 2) {
        assert(sorted.last._2 == "UPGRADED" && sorted.head._2 != "UPGRADED",
          s"cust $ck upgrade direction")
      }
    }
    // the change batch is non-trivial at every fixture scale
    assert(byCust.values.count(_.length == 2) > 0, "no customer versioned")
  }
}
