package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Invariant tests for the event-analytics family (AnalyticsOps); value
  * correctness is the DuckDB hash gate, these pin the semantic shape.
  */
class AnalyticsSpec extends SparkTestBase {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

  test("funnel stages are ordered and monotone-decreasing in population") {
    val rows = q("q_funnel_steps").collect().map { r =>
      (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4))
    }
    assert(rows.nonEmpty)
    rows.foreach { case (u, v, c, p, stage) =>
      // each stage's timestamp is at/after the previous stage's
      for (cv <- c; vv <- v) assert(cv >= vv, s"user $u: click before view")
      for (pv <- p; cv <- c) assert(pv >= cv, s"user $u: purchase before click")
      // a stage exists only if every earlier stage exists
      assert(c.isEmpty || v.nonEmpty)
      assert(p.isEmpty || c.nonEmpty)
      val expectedStage = if (p.nonEmpty) 3L else if (c.nonEmpty) 2L else if (v.nonEmpty) 1L else 0L
      assert(stage == expectedStage)
    }
    val byStage = (0L to 3L).map(k => rows.count(_._5 >= k))
    assert(byStage == byStage.sorted.reverse, s"population not monotone: $byStage")
  }

  test("attribution matches a per-purchase driver-side replay") {
    // independent ground truth: brute-force scan of each user's timeline
    // (sf0.001 fixture — O(n²) loops are test scaffolding, not engine path)
    val ev = ops.table(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val touches = ev.filter(e => e._4 == "click" || e._4 == "view")
    val purchases = ev.filter(_._4 == "purchase")
    val week = 7L * 86400L * 1000000L
    val expected = purchases.groupBy { case (u, ts, id, _, _) =>
      touches.filter(t => t._1 == u && t._2 < ts && t._2 >= ts - week)
        .sortBy(t => (t._2, t._3)).lastOption.map(_._4).getOrElse("none")
    }.map { case (ch, ps) => (ch, (ps.length.toLong,
      ps.map(p => BigDecimal(p._5).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble)) }
    val got = q("q_analytics_attribution").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (ch, e) =>
      assert(got(ch) == e, s"channel $ch: got ${got(ch)}, expected $e")
    }
  }

  test("survival life table equals a driver-side KM replay (r12c3)") {
    val rows = q("q_analytics_survival").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))))
    assert(rows.nonEmpty)
    val orders = ops.table(spark, sfDir, "orders")
      .selectExpr("o_custkey", "unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byCust = orders.distinct.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    val maxDay = orders.map(_._2).max
    val subj = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    byCust.foreach { case (_, ds) =>
      ds.zip(ds.tail).foreach { case (a, b) => subj += (((b - a) / 7, 1)) }
      subj += (((maxDay - ds.last) / 7, 0))
    }
    val tbl = subj.groupBy(_._1).view
      .mapValues(g => (g.count(_._2 == 1).toLong, g.count(_._2 == 0).toLong))
      .toMap
    val total = subj.size.toLong
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted.distinct)
    var consumed = 0L
    rows.foreach { case (w, (d, c, atRisk, hz)) =>
      val (ed, ec) = tbl(w)
      assert((d, c) == ((ed, ec)), s"week $w event/censor counts")
      // at-risk = subjects with event-or-censor week >= w; weeks appear
      // sorted, so the exclusive prefix equals everything consumed so far
      assert(atRisk == total - consumed, s"week $w at-risk")
      consumed += d + c
      assert(hz == d.toDouble / atRisk.toDouble, s"week $w hazard")
      assert(hz >= 0.0 && hz <= 1.0, s"week $w hazard range")
    }
    assert(tbl.keySet == rows.map(_._1).toSet, "occupied week buckets")
    assert(rows.head._2._3 == total, "week-0 risk set is every subject")
  }

  test("abandonment audit equals a driver-side window replay (r12c3)") {
    val ev = ops.table(spark, sfDir, "events")
      .selectExpr("user_id", "event_type", "event_id", "unix_micros(ts) AS t")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val H = 3600000000L
    val purByUser = ev.filter(_._2 == "purchase").groupBy(_._1)
      .view.mapValues(_.map(_._4)).toMap
    val views = ev.filter(_._2 == "view")
    val flags = views.map { case (u, _, _, tv) =>
      val conv = purByUser.getOrElse(u, Array.empty[Long])
        .exists(tp => tp > tv && tp <= tv + H)
      ((tv / H) % 24, conv)
    }
    val expected = flags.groupBy(_._1).map { case (hod, g) =>
      val n = g.length.toLong
      val c = g.count(_._2).toLong
      (hod, (n, c, (n - c).toDouble / n.toDouble))
    }
    val got = q("q_analytics_abandon").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == expected, "per-hour abandonment rows differ")
    assert(got.values.map(_._1).sum == views.length.toLong,
      "every view lands in exactly one hour bucket")
    // no "conversions occur every hour" pin — sparse fixture (r12c2
    // runs_test lesson); only the exact recount is the contract
  }

  test("retention offset-0 cell equals the cohort size") {
    val rows = q("q_retention_cohort").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case ((_, off), n) => off >= 0 && n >= 1 })
    // every user is active in their cohort week, so offset 0 counts the
    // whole cohort, and no later offset can exceed it
    val byCohort = rows.groupBy(_._1._1)
    byCohort.foreach { case (cw, cells) =>
      val at0 = cells.collectFirst { case ((_, 0L), n) => n }
      assert(at0.nonEmpty, s"cohort $cw missing offset 0")
      assert(cells.forall(_._2 <= at0.get), s"cohort $cw: offset beats cohort size")
    }
  }

  test("sessionize matches a driver-side gap-split replay") {
    val ev = ops.table(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gap = 30L * 60L * 1000000L
    val expected = ev.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var session = 0L
      var prev = Long.MinValue
      val tagged = sorted.map { case (_, t, _) =>
        if (prev == Long.MinValue || t - prev > gap) session += 1
        prev = t
        (session, t)
      }
      tagged.groupBy(_._1).map { case (sn, ts) =>
        (u, sn, ts.length.toLong, ts.map(_._2).min, ts.map(_._2).max)
      }
    }.toSet
    val got = q("q_analytics_sessionize").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)).toSet == expected)
    got.foreach(t => assert(t._6 == t._5 - t._4, s"duration mismatch: $t"))
    // consecutive sessions are separated by a real silence (> gap)
    got.groupBy(_._1).foreach { case (u, ss) =>
      ss.sortBy(_._2).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b._4 - a._5 > gap, s"user $u: sessions touch")
        case _ => ()
      }
    }
  }

  test("concurrency profile equals a driver-side sweep-line replay (r15)") {
    val sess = q("q_analytics_sessionize").collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    assert(sess.nonEmpty)
    val deltas = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    sess.foreach { case (s0, e0) =>
      deltas(s0 / 60000000L) += 1L
      deltas(e0 / 60000000L + 1L) -= 1L
    }
    val m0 = deltas.keys.min
    val m1 = deltas.keys.max
    var cur = 0L
    val perHour = collection.mutable.Map[Long, (Long, Long)]()
    (m0 to m1).foreach { m =>
      cur += deltas(m)
      val h = m / 60L
      val (mx, act) = perHour.getOrElse(h, (Long.MinValue, 0L))
      perHour(h) = (math.max(mx, cur), act + (if (cur > 0) 1L else 0L))
    }
    val got = q("q_analytics_concurrency").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = perHour.toSeq.sortBy(_._1)
      .map { case (h, (mx, act)) => (h, mx, act) }
    assert(got == expected, "concurrency drifted from the sweep replay")
    // every session closes: the final running count returns to zero
    assert(cur == 0L, "sweep did not return to zero")
    // peak concurrency is a real overlap readout: >= 1 somewhere and
    // bounded by the live session count
    assert(got.map(_._2).max >= 1L && got.map(_._2).max <= sess.length.toLong)
  }

  test("pattern detection equals a driver-side last-touch chain replay") {
    val step = 86400000000L // 24 h per chain step (PatternStepUs)
    val ev = graft.ops.table(spark, sfDir, "events")
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), expr("unix_micros(ts)").as("t"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val perDay = collection.mutable.Map[Long, (Long, Long)]()
      .withDefaultValue((0L, 0L))
    ev.groupBy(_._1).foreach { case (_, es) =>
      val kind = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
      val sorted = es.sortBy(e => (e._2, kind(e._4), e._3))
      var bestView: Option[Long] = None
      var bestClick: Option[(Long, Long)] = None // (clickT, viewT-at-click or -1)
      sorted.foreach { case (_, t, _, tpe) =>
        if (tpe == "purchase") {
          val matched = bestClick.exists { case (ct, vt) =>
            ct < t && ct >= t - step && vt >= 0 && vt < ct && vt >= ct - step
          }
          val day = t / 86400000000L
          val (n, m) = perDay(day)
          perDay(day) = (n + 1, m + (if (matched) 1L else 0L))
        }
        // update running bests AFTER processing (strictly-prior semantics)
        if (tpe == "view") bestView = Some(bestView.fold(t)(math.max(_, t)))
        if (tpe == "click") {
          val cand = (t, bestView.getOrElse(-1L))
          bestClick = Some(bestClick.fold(cand)(b => if (cand._1 >= b._1) cand else b))
        }
      }
    }
    val expected = perDay.toSeq.sortBy(_._1).map { case (d, (n, m)) =>
      (d, n, m, m.toDouble / n) }
    val got = q("q_analytics_pattern").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected, "daily pattern report differs from the replay")
    assert(got.map(_._3).sum > 0, "fixture should contain completed chains")
  }

  test("abtest equals a driver-side Welch replay, same FP order") {
    import graft.functions.ReplayableHash
    val (a, b) = ReplayableHash.AbTestParams.head
    val P = ReplayableHash.P
    val ev = ops.table(spark, sfDir, "events")
      .where(col("event_type") === "purchase")
      .select("user_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val arms = ev.groupBy { case (u, _) => (a * (u % P) + b) % P % 2 }
    def st(arm: Long) = {
      val vs = arms(arm).map(e =>
        BigDecimal(e._2).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      (vs.length.toLong, vs.sum.toDouble, vs.map(v => v * v).sum.toDouble)
    }
    val (na, s1a, s2a) = st(0); val (nb, s1b, s2b) = st(1)
    def mv(n: Long, s1: Double, s2: Double) = {
      val m = s1 / n
      (m, (s2 / n - m * m) * n / (n - 1))
    }
    val (ma, va) = mv(na, s1a, s2a); val (mb, vb) = mv(nb, s1b, s2b)
    val t = (ma - mb) / math.sqrt(va / na + vb / nb)
    val r = q("q_analytics_abtest").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((na, nb)))
    assert(r.getDouble(2) == ma && r.getDouble(3) == mb)
    assert(r.getDouble(4) == va && r.getDouble(5) == vb)
    assert(r.getDouble(6) == t, s"t ${r.getDouble(6)} vs replay $t")
    // a hash split should produce arms of comparable size (3x band)
    assert(na > 0 && nb > 0 && na < 3 * nb && nb < 3 * na)

    // r11 significance columns: Welch–Satterthwaite df + the
    // Cornish–Fisher t-critical replay (same op order as the SQL string)
    val sea = va / na; val seb = vb / nb
    val df = (sea + seb) * (sea + seb) /
      (sea * sea / (na - 1) + seb * seb / (nb - 1))
    assert(r.getDouble(7) == df, s"df ${r.getDouble(7)} vs replay $df")
    val tc = graft.ops.AnalyticsOps.tCrit05(df)
    assert(r.getDouble(8) == tc, s"t_crit ${r.getDouble(8)} vs replay $tc")
    assert(r.getBoolean(9) == (math.abs(t) > tc))
    // df is large on this fixture, so t_crit must sit near the z limit
    assert(df > 30.0 && tc > 1.9599 && tc < 2.05)
    // r12 replayable p-value: same staged op order as the SQL chain
    val p = graft.ops.AnalyticsOps.pValueNormal(t)
    assert(r.getDouble(10) == p, s"p ${r.getDouble(10)} vs replay $p")
    // consistency with the significance verdict at its own alpha scale:
    // normal-approx p vs t-critical agree when not at a knife edge
    if (math.abs(math.abs(t) - tc) > 0.01)
      assert((p < 0.05) == r.getBoolean(9), s"p=$p vs significant=${r.getBoolean(9)}")
  }

  test("pValueNormal matches reference two-sided normal tail values (r12)") {
    // high-precision erfc(|t|/sqrt(2)) references; the A-S 7.1.26 bound is
    // 1.5e-7 and the staged exp adds < 1e-10
    val table = Seq(
      0.0 -> 1.0,
      0.5 -> 0.6170750774519739,
      1.0 -> 0.31731050786291415,
      1.959963984540054 -> 0.05000000000000002,
      2.0 -> 0.04550026389635842,
      3.0 -> 0.0026997960632601866,
      5.0 -> 5.733031437583892e-7,
      8.0 -> 1.2442169928688156e-15)
    table.foreach { case (t, expect) =>
      val got = graft.ops.AnalyticsOps.pValueNormal(t)
      // A-S 7.1.26 is an ABSOLUTE 1.5e-7 bound; in the far tail the form
      // stays relatively accurate to ~2% (measured 0.2% at t=5, 1% at t=8)
      val tol = math.max(4e-7, 0.02 * expect)
      assert(math.abs(got - expect) < tol, s"pValueNormal($t) = $got, ref $expect")
      assert(graft.ops.AnalyticsOps.pValueNormal(-t) == got, "two-sided symmetry")
    }
    // monotone decreasing in |t|; clamp region emits exact zero
    val ps = Seq(0.0, 0.5, 1.0, 2.0, 4.0, 8.0, 11.9)
      .map(graft.ops.AnalyticsOps.pValueNormal)
    assert(ps == ps.sorted.reverse)
    assert(graft.ops.AnalyticsOps.pValueNormal(12.5) == 0.0)
  }

  test("tCrit05 expansion matches two-sided 0.05 t-table values (r11)") {
    // published two-sided 0.05 critical values; the pure-rational
    // expansion must land within 2e-3 down to ν = 10 (it is the
    // replayable stand-in for the libm-dependent erf path)
    val table = Seq(
      10.0 -> 2.228139, 20.0 -> 2.085963, 30.0 -> 2.042272,
      60.0 -> 2.000298, 100.0 -> 1.983972, 1000.0 -> 1.962339)
    table.foreach { case (df, expect) =>
      val got = graft.ops.AnalyticsOps.tCrit05(df)
      assert(math.abs(got - expect) < 2e-3,
        s"tCrit05($df) = $got, table $expect")
    }
    // monotone decreasing toward the z limit
    val zs = Seq(10.0, 30.0, 100.0, 1e4, 1e8).map(graft.ops.AnalyticsOps.tCrit05)
    assert(zs == zs.sorted.reverse && zs.last > 1.9599 && zs.last < 1.96)
  }

  test("basket rules equal a driver-side support/confidence/lift replay") {
    val rows = q("q_analytics_basket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty && rows.length <= 25)
    val baskets = graft.ops.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = baskets.map(_._1).distinct.length.toLong
    val supp = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairSupp = baskets.groupBy(_._1).values.flatMap { bs =>
      val ps = bs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = pairSupp.toSeq.collect { case ((a, b), sab) if sab >= 2 =>
      (a, b, sab, supp(a), supp(b), sab.toDouble / supp(a),
        sab.toDouble * n / supp(a) / supp(b))
    }.sortBy { case (a, b, _, _, _, _, l) => (-l, a, b) }.take(25)
    assert(rows.toSeq == expected, "rule set differs from the naive replay")
    // semantic sanity: confidence ≤ 1, supports consistent, top rule lifts
    rows.foreach { case (_, _, sab, sa, sb, conf, lift) =>
      assert(sab <= sa && sab <= sb && conf <= 1.0 + 1e-12)
      assert(lift > 0.0)
    }
  }

  test("rfm segments equal a driver-side quintile replay, including order") {
    val os = ops.table(spark, sfDir, "orders")
      .select(col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms"),
        col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val base = os.groupBy(_._1).map { case (c, rs) =>
      (c, rs.map(_._2 / 86400000L).max, rs.length.toLong,
        rs.map(x => math.round(x._3 * 100)).sum)
    }.toSeq
    val maxDay = base.map(_._2).max
    val n = base.length.toLong
    // exact global rank of (metric, cust) → quintile, same integer math
    def quint(metric: Map[Long, Long]): Map[Long, Long] = base.map(_._1)
      .sortBy(c => (metric(c), c)).zipWithIndex
      .map { case (c, i) => c -> (i.toLong * 5 / n + 1) }.toMap
    val rq = quint(base.map(b => b._1 -> (maxDay - b._2)).toMap)
    val fq = quint(base.map(b => b._1 -> b._3).toMap)
    val mq = quint(base.map(b => b._1 -> b._4 / 100).toMap)
    val cents = base.map(b => b._1 -> b._4).toMap
    val expected = base.map(_._1).groupBy(c => (6 - rq(c), fq(c), mq(c)))
      .map { case ((r, f, m), cs) =>
        (r, f, m, cs.size.toLong, cs.map(cents).sum.toDouble / 100)
      }.toSeq.sortBy(t => (t._1, t._2, t._3))
    val got = q("q_analytics_rfm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected, "segment table differs from the naive replay")
    // quintile machinery sanity: scores span the full 1..5 range on each
    // axis and every segment is within bounds
    assert(got.forall { case (r, f, m, _, _) =>
      r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5 })
    assert(got.map(_._1).distinct.size == 5 || n < 25)
  }

  test("markov transitions equal a driver-side chain replay; rows normalize") {
    val ev = ops.table(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { es =>
      val seq = es.sortBy(e => (e._2, e._3)).map(_._4).toSeq
      seq.zip(seq.tail)
    }.toSeq
    val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTot = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expected = counts.toSeq.map { case ((f, t), n) =>
      (f, t, n, fromTot(f), n.toDouble / fromTot(f))
    }.sortBy(x => (x._1, x._2))
    val got = q("q_analytics_markov").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected, "transition matrix differs from the chain replay")
    // each from-row's probabilities sum to ~1 (exact n/n_from fractions)
    got.groupBy(_._1).foreach { case (f, rs) =>
      assert(rs.map(_._3).sum == rs.head._4, s"$f: counts don't total n_from")
      assert(math.abs(rs.map(_._5).sum - 1.0) < 1e-9, s"$f: row not normalized")
    }
  }

  test("revenue concentration equals a driver-side order-statistic replay") {
    val cents = ops.table(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).values.map(_.map(_._2).sum).toSeq.sorted
    val n = cents.length.toLong
    def cut(rank: Long): Long = cents(rank.toInt - 1)
    val (c50, c90, c99) =
      (cut((n + 1) / 2), cut((9 * n + 9) / 10), cut((99 * n + 99) / 100))
    val tot = cents.sum
    val ab90 = cents.filter(_ > c90)
    val ab99 = cents.filter(_ > c99)
    val r = q("q_analytics_revenue_conc").collect().head
    assert(r.getLong(0) == n)
    assert(r.getDouble(1) == tot.toDouble / 100)
    assert(r.getDouble(2) == c50.toDouble / 100.0)
    assert(r.getDouble(3) == c90.toDouble / 100.0)
    assert(r.getDouble(4) == c99.toDouble / 100.0)
    assert(r.getLong(5) == ab90.length.toLong)
    assert(r.getLong(6) == ab99.length.toLong)
    assert(r.getDouble(7) == ab90.sum.toDouble / tot)
    assert(r.getDouble(8) == ab99.sum.toDouble / tot)
    // the report's reason to exist: concentration is real but bounded —
    // the top decile-by-cut holds more than its population share and the
    // strict-above populations respect their percentile definitions
    assert(r.getLong(5) <= n / 10 && r.getLong(6) <= n / 100 + 1)
    assert(r.getDouble(7) > 0.05)
  }

  test("ltv: cohort cells reconcile against a driver-side replay") {
    val weekUs = 7L * 86400L * 1000000L
    val rows = q("q_analytics_ltv").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // driver-side replay on the sf0.001 purchase stream
    val ev = ops.table(spark, sfDir, "events")
      .where(col("event_type") === "purchase")
      .select(col("user_id"), expr(s"unix_micros(ts) div $weekUs"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cohortOf = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cohortSize = cohortOf.values.groupBy(identity).view.mapValues(_.size).toMap
    val cellRev = ev.groupBy(e => (cohortOf(e._1), e._2 - cohortOf(e._1)))
      .view.mapValues(_.map(e =>
        BigDecimal(e._3).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum).toMap
    val cellBuyers = ev.groupBy(e => (cohortOf(e._1), e._2 - cohortOf(e._1)))
      .view.mapValues(_.map(_._1).distinct.size).toMap
    assert(rows.length == cellRev.size, "one row per active (cohort, offset) cell")
    rows.groupBy(_._1).foreach { case (cw, cells) =>
      val sorted = cells.sortBy(_._2)
      var cum = BigDecimal(0)
      sorted.foreach { case (_, off, buyers, rev, cumRev, ltv) =>
        assert(buyers == cellBuyers((cw, off)).toLong)
        assert(rev == cellRev((cw, off)).toDouble)
        cum += cellRev((cw, off))
        assert(cumRev == cum.toDouble, s"cum revenue at ($cw, $off)")
        assert(ltv == cum.toDouble / cohortSize(cw))
      }
      // every cohort is active at offset 0 (its members' first purchase)
      assert(sorted.head._2 == 0L)
    }
  }

  test("stage latency reconciles with the funnel relation, medians by value") {
    val rows = q("q_analytics_stage_latency").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(rows.keySet == Set("1_view_to_click", "2_click_to_purchase"))
    val fs = q("q_funnel_steps").collect().map(r =>
      (if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    def replay(lats: Seq[Long]) = {
      val n = lats.size.toLong
      val mean = lats.sum.toDouble / n / 1000000.0
      val secs = lats.map(_ / 1000000L).sorted
      val p50 = secs((((n + 1) / 2) - 1).toInt)
      (n, mean, p50)
    }
    val vc = fs.collect { case (Some(v), Some(c), _) => c - v }
    val cp = fs.collect { case (_, Some(c), Some(p)) => p - c }
    assert(vc.nonEmpty && cp.nonEmpty, "fixture has converting users")
    assert(rows("1_view_to_click") == replay(vc.toSeq))
    assert(rows("2_click_to_purchase") == replay(cp.toSeq))
  }

  test("point-in-time features never leak same-or-later events (r12)") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val rows = q("q_analytics_pit_features").collect().map(r =>
      (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(rows.nonEmpty)
    val ev = ops.table(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._2)
    var purchases = 0
    byUser.values.foreach { es =>
      val ordered = es.sortBy(e => (e._4, e._1)) // the (ts, id) total order
      ordered.zipWithIndex.foreach { case ((id, u, tpe, ts), i) =>
        if (tpe == "purchase") {
          purchases += 1
          val prior = ordered.take(i) // STRICTLY earlier under the order
          val (gu, gts, nv, nc, gap) = {
            val r = rows(id); (r._1, r._2, r._3, r._4, r._5)
          }
          assert(gu == u && gts == ts, s"event $id identity")
          assert(nv == prior.count(_._3 == "view").toLong, s"event $id views")
          assert(nc == prior.count(_._3 == "click").toLong, s"event $id clicks")
          val lastClick = prior.filter(_._3 == "click")
            .map(_._4).maxOption
          assert(gap == lastClick.map(ts - _).getOrElse(-1L), s"event $id gap")
        }
      }
    }
    assert(purchases == rows.size, "one feature row per purchase label")
  }
}
