package graft

import org.apache.spark.sql.DataFrame
import graft.ops.GraphOps

/** q_graph_pagerank / q_graph_degree (r9): the distributed integer PageRank
  * must equal an independent driver-side replay of the same arithmetic on
  * the collected edge list — the strongest check available beyond the
  * DuckDB oracle (which shares the unrolled-CTE formulation; this replay
  * shares nothing but the constants).
  */
class GraphSpec extends SparkTestBase {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

  private lazy val edges: Array[(Long, Long)] = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val pairs = li.map { case (ok, sk) => (ord(ok), sk) }.distinct
    (pairs.map { case (c, s) => (2 * c, 2 * s + 1) } ++
      pairs.map { case (c, s) => (2 * s + 1, 2 * c) })
  }

  /** Driver-side limit-cycle replay: same integer arithmetic, iterated
    * until r_k == r_{k−2} (the quantized map settles into a period-2
    * cycle, not an exact fixpoint — the engine's documented contract),
    * result = elementwise min of the two cycle states. Converged by
    * construction, so equality also pins that the engine's early-exit loop
    * (and the oracle's PrIters-round unroll + least()) truly reach the
    * cycle. */
  private lazy val (driverRanks: Map[Long, Long], driverPrRounds: Int) = {
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val S = GraphOps.PrScale
    var r = deg.keys.map(_ -> S).toMap
    var rPrev = Map.empty[Long, Long]
    var rounds = 0
    var inCycle = false
    while (!inCycle && rounds < GraphOps.PrMaxRounds) {
      val contrib = r.map { case (n, v) => n -> v / deg(n) }
      val m = edges.groupBy(_._2).view
        .mapValues(_.map(e => contrib(e._1)).sum).toMap
      val next = m.map { case (n, v) => n -> (15 * S + 85 * v) / 100 }
      inCycle = rounds >= 1 && next == rPrev
      rPrev = r
      r = next
      rounds += 1
    }
    assert(inCycle, "driver replay did not reach the period-2 limit cycle")
    (r.map { case (n, v) => n -> math.min(v, rPrev(n)) }, rounds)
  }

  test("driver cycle-entry depth fits inside the oracle unroll with margin") {
    // the oracle needs both of its last two stages in-cycle, i.e. unroll
    // depth >= entry + 1; driverPrRounds already includes the confirming
    // r_k == r_{k-2} round, so <= would suffice and < carries slack
    assert(driverPrRounds < GraphOps.PrIters,
      s"cycle entry $driverPrRounds ≥ oracle unroll ${GraphOps.PrIters}")
  }

  test("pagerank equals an independent driver-side integer replay, including order") {
    val expectedTop = driverRanks.toSeq
      .sortBy { case (n, v) => (-v, n) }.take(50)
    val got = q("q_graph_pagerank").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length == math.min(50, driverRanks.size))
    assert(got.toSeq == expectedTop, "top-50 ranks or order differ")
    // node_type labels derive from the id parity
    q("q_graph_pagerank").collect().foreach { r =>
      val t = if (r.getLong(0) % 2 == 0) "customer" else "supplier"
      assert(r.getString(1) == t)
    }
  }

  test("pagerank mass stays conserved up to integer-floor loss") {
    // every iteration floors twice (contrib and damping), so total mass can
    // only shrink, and by < 1 unit per node per floor per iteration
    val S = GraphOps.PrScale
    val n = driverRanks.size
    val total = driverRanks.values.sum
    assert(total <= n * S)
    assert(total >= n * S - driverPrRounds.toLong * 2L * n * 100,
      "integer floor lost more mass than the bound allows")
  }

  /** Driver-side strong co-purchase edges: basket-capped distinct
    * (order, part) pairs, support counts, threshold — the same constants
    * as the engine, none of its execution. */
  private lazy val strongEdges: Seq[(Long, Long)] = {
    val op = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq
    val capped = op.groupBy(_._1).toSeq.flatMap { case (o, ps) =>
      ps.map(_._2).sorted.take(GraphOps.MaxBasket).map(p => (o, p))
    }
    capped.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
      val parts = ps.map(_._2).sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).iterator.collect {
      // NB: .collect on the Map itself would rebuild a Map from the tuple
      // results and silently collapse pairs sharing a first element
      case (e, occ) if occ.size >= GraphOps.StrongSupport => e
    }.toSeq
  }

  test("concomp equals a union-find ground truth (propagation truly converged)") {
    // union-find is fully converged by construction, so equality also pins
    // that the engine's fixpoint loop (and the oracle's CcIters-round
    // unroll) truly reach the components on this fixture
    val par = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = par.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); par(x) = r; r }
    }
    strongEdges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) par(ra) = rb
    }
    val hist = par.keys.toSeq.map(find).groupBy(identity)
      .map(_._2.size).groupBy(identity)
      .map { case (sz, cs) => (sz.toLong, cs.size.toLong) }
    val got = q("q_graph_concomp").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq.sortBy(_._1) == hist.toSeq.sortBy(_._1),
      "component size histogram differs from union-find ground truth")
  }

  /** Driver-side mutual-KNN edge set (u < v) — same constants as the
    * engine, none of its execution. */
  private lazy val mutualEdges: Set[(Long, Long)] = {
    val op = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq
    val capped = op.groupBy(_._1).toSeq.flatMap { case (o, ps) =>
      ps.map(_._2).sorted.take(GraphOps.MaxBasket).map(p => (o, p))
    }
    val support = capped.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
      val parts = ps.map(_._2).sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val adj = support.toSeq.flatMap { case ((a, b), n) =>
      Seq((a, b, n), (b, a, n)) }
    val kept = adj.groupBy(_._1).toSeq.flatMap { case (s, ns) =>
      ns.sortBy(t => (-t._3, t._2)).take(GraphOps.KnnK).map(t => (s, t._2))
    }.toSet
    kept.filter { case (u, v) => u < v && kept((v, u)) }
  }

  test("triangles equal a brute-force mutual-KNN replay, including order") {
    val nbrs = mutualEdges.toSeq.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val triCnt = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((u, vs) <- nbrs; v <- vs; w <- vs if v < w
         if nbrs.getOrElse(v, Set.empty[Long])(w)) {
      triCnt(u) += 1; triCnt(v) += 1; triCnt(w) += 1
    }
    val expected = triCnt.toSeq.sortBy { case (p, n) => (-n, p) }.take(50)
    val got = q("q_graph_triangles").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, "top-50 triangle counts or order differ")
  }

  test("stress centrality equals a driver-side integer-Brandes replay (r12c3)") {
    val und = mutualEdges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sources = nbrs.keys.toSeq.sorted.take(8)
    val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val touched = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    sources.foreach { s0 =>
      // forward: levels 0..3, sigma = #shortest paths
      var levels = Vector(Map(s0 -> 1L))
      var visited = Set(s0)
      for (_ <- 1 to 3) {
        val next = scala.collection.mutable.Map[Long, Long]()
          .withDefaultValue(0L)
        levels.last.foreach { case (v, sg) =>
          nbrs.getOrElse(v, Set.empty).foreach { w =>
            if (!visited(w)) next(w) += sg
          }
        }
        levels :+= next.toMap
        visited ++= next.keySet
      }
      // backward: h_l(v) = sum over succ w of (1 + h_{l+1}(w))
      var hNext: Map[Long, Long] = levels(3).map { case (v, _) => v -> 0L }
      for (l <- 2 to 1 by -1) {
        val hl = levels(l).map { case (v, _) =>
          v -> nbrs.getOrElse(v, Set.empty).toSeq
            .flatMap(w => hNext.get(w).map(1L + _)).sum
        }
        levels(l).foreach { case (v, sg) =>
          val c = sg * hl(v)
          contrib(v) += c
          touched(v) = touched(v) + s0
        }
        hNext = hl
      }
    }
    val expected = contrib.toSeq.filter(_._2 > 0)
      .map { case (v, c) => (v, c, touched(v).size.toLong) }
      .sortBy { case (v, c, _) => (-c, v) }.take(100)
    val got = q("q_graph_stress").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty, "fixture must produce interior shortest paths")
    assert(got == expected, "stress rows or order differ from the replay")
  }

  test("edge stress equals explicit shortest-path enumeration (r12c3)") {
    // INDEPENDENT ground truth: enumerate every shortest path (≤3 hops)
    // from each sampled source by walking the BFS dag, and count edge
    // usage directly — no σ·(1+h) formula anywhere in the replay
    val und = mutualEdges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sources = nbrs.keys.toSeq.sorted.take(8)
    val usage = scala.collection.mutable
      .Map[(Long, Long), Long]().withDefaultValue(0L)
    val touching = scala.collection.mutable
      .Map[(Long, Long), Set[Long]]().withDefaultValue(Set.empty)
    sources.foreach { s0 =>
      // BFS levels (the dag)
      var levels = Vector(Set(s0))
      var visited = Set(s0)
      for (_ <- 1 to 3) {
        val next = levels.last.flatMap(v => nbrs.getOrElse(v, Set.empty))
          .diff(visited)
        levels :+= next; visited ++= next
      }
      val levelOf = levels.zipWithIndex
        .flatMap { case (ns, l) => ns.map(_ -> l) }.toMap
      // enumerate dag paths: every path prefix ending at each node IS a
      // shortest path to that node — count each edge once per path that
      // crosses it (paths to deeper targets recount shallower edges)
      def walk(v: Long, pathEdges: List[(Long, Long)]): Unit = {
        pathEdges.foreach { case (a, b) =>
          val key = (math.min(a, b), math.max(a, b))
          usage(key) += 1L
          touching(key) = touching(key) + s0
        }
        val lv = levelOf(v)
        if (lv < 3)
          nbrs.getOrElse(v, Set.empty)
            .filter(w => levelOf.get(w).contains(lv + 1))
            .foreach(w => walk(w, (v, w) :: pathEdges))
      }
      // start: each dag edge out of the source begins a path; recursion
      // counts the edges of every extension exactly once per full path
      // PREFIX — which is exactly "paths through the edge", because each
      // shortest path to a target t is one prefix chain
      nbrs.getOrElse(s0, Set.empty)
        .filter(w => levelOf.get(w).contains(1))
        .foreach(w => walk(w, List((s0, w))))
    }
    val expected = usage.toSeq
      .map { case (e, t) => (e._1, e._2, t, touching(e).size.toLong) }
      .sortBy { case (a, b, t, _) => (-t, a, b) }.take(100)
    val got = q("q_graph_edge_stress").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.nonEmpty)
    assert(got == expected, "edge traversal counts or order differ")
  }

  test("sampled eccentricity equals a driver-side BFS replay (r12c3)") {
    val und = mutualEdges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sources = nbrs.keys.toSeq.sorted.take(8)
    val expected = sources.map { s0 =>
      var visited = Set(s0)
      var frontier = Set(s0)
      val sizes = (1 to 3).map { _ =>
        val next = frontier.flatMap(v => nbrs.getOrElse(v, Set.empty))
          .diff(visited)
        visited ++= next
        frontier = next
        next.size.toLong
      }
      val ecc =
        if (sizes(2) > 0) 3L else if (sizes(1) > 0) 2L
        else if (sizes(0) > 0) 1L else 0L
      (s0, (sizes(0), sizes(1), sizes(2), ecc))
    }.toMap
    val dia = expected.values.map(_._4).max
    val got = q("q_graph_ecc_sample").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == expected.keySet, "source sample")
    got.foreach { case (s0, (n1, n2, n3, ecc, dlb)) =>
      val (e1, e2, e3, eEcc) = expected(s0)
      assert((n1, n2, n3) == ((e1, e2, e3)), s"source $s0 level sizes")
      assert(ecc == eEcc, s"source $s0 capped eccentricity")
      assert(dlb == dia, s"source $s0 diameter lower bound")
    }
  }

  test("assortativity equals a driver-side Newman-r replay, same FP order") {
    val und = mutualEdges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val deg = und.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val es = mutualEdges.toSeq
    val m = es.length.toLong
    val s1 = es.map { case (u, v) => deg(u) + deg(v) }.sum
    val s2 = es.map { case (u, v) => deg(u) * deg(u) + deg(v) * deg(v) }.sum
    val sp = es.map { case (u, v) => deg(u) * deg(v) }.sum
    val mu = s1.toDouble / (2 * m)
    val expected = (sp.toDouble / m - mu * mu) / (s2.toDouble / (2 * m) - mu * mu)
    val r = q("q_graph_assortativity").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((m, s1, s2, sp)))
    assert(r.getDouble(4) == expected, s"r ${r.getDouble(4)} vs $expected")
    assert(r.getDouble(4) >= -1.0 - 1e-9 && r.getDouble(4) <= 1.0 + 1e-9)
  }

  test("clustering coefficients equal a brute-force replay, including order") {
    val und = mutualEdges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val nbrs = und.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triCnt = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val onbrs = mutualEdges.toSeq.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    for ((u, vs) <- onbrs; v <- vs; w <- vs if v < w
         if onbrs.getOrElse(v, Set.empty[Long])(w)) {
      triCnt(u) += 1; triCnt(v) += 1; triCnt(w) += 1
    }
    val expected = nbrs.toSeq.collect { case (p, ns) if ns.size >= 2 =>
      val d = ns.size.toLong
      (p, d, triCnt(p), (2 * triCnt(p)).toDouble / (d * (d - 1)))
    }.sortBy { case (p, _, _, c) => (-c, p) }.take(50)
    val got = q("q_graph_clustercoef").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected, "coefficient list or order differs")
    got.foreach { case (p, d, t, c) =>
      assert(c >= 0.0 && c <= 1.0 + 1e-12, s"node $p coef $c out of range")
      assert(t <= d * (d - 1) / 2, s"node $p has more triangles than pairs")
    }
  }

  test("simnodes equal a brute-force neighbor-Jaccard replay, including order") {
    // undirected neighbor sets from the mutual edges
    val nbr = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    mutualEdges.foreach { case (u, v) =>
      nbr(u) = nbr(u) + v; nbr(v) = nbr(v) + u
    }
    // candidate pairs = share at least one neighbor (two-hop wedges)
    val pairs = nbr.toSeq.flatMap { case (_, vs) =>
      val s = vs.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
    }.distinct
    val expected = pairs.map { case (a, b) =>
      val common = (nbr(a) & nbr(b)).size.toLong
      val (da, db) = (nbr(a).size.toLong, nbr(b).size.toLong)
      (a, b, common, da, db, common.toDouble / (da + db - common))
    }.filter(_._3 > 0)
      .sortBy { case (a, b, _, _, _, j) => (-j, a, b) }.take(100)
    val got = q("q_graph_simnodes").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expected, "top-100 similarity pairs or order differ")
  }

  test("linkpred equals a brute-force resource-allocation replay, including order") {
    val nbr = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    mutualEdges.foreach { case (u, v) =>
      nbr(u) = nbr(u) + v; nbr(v) = nbr(v) + u
    }
    val pairs = nbr.toSeq.flatMap { case (_, vs) =>
      val s = vs.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
    }.distinct
    val expected = pairs
      .filterNot(mutualEdges.contains)
      .map { case (a, b) =>
        val common = (nbr(a) & nbr(b)).toSeq.sorted
        val score = common.map(w => GraphOps.RaScale / nbr(w).size).sum
        (a, b, common.size.toLong, score)
      }
      .sortBy { case (a, b, _, s) => (-s, a, b) }.take(100)
    val got = q("q_graph_linkpred").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected, "top-100 RA predictions or order differ")
    assert(got.nonEmpty && got.forall { case (a, b, _, _) =>
      !mutualEdges((a, b)) }, "a predicted pair is already an edge")
  }

  test("modularity equals a driver-side replay on the brand partition") {
    // strong arcs (support >= StrongSupport), both directions — the same
    // relation the engine derives, none of its execution
    val op = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq
    val support = op.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
      val parts = ps.map(_._2).sorted.take(GraphOps.MaxBasket)
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val arcs = support.toSeq.filter(_._2 >= GraphOps.StrongSupport)
      .flatMap { case ((a, b), _) => Seq((a, b), (b, a)) }
    val brand = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perBrand = arcs.groupBy { case (a, _) => brand(a) }.view
      .mapValues { as =>
        (as.size.toLong,
          as.count { case (a, b) => brand(a) == brand(b) }.toLong)
      }.toMap
    val m = perBrand.values.map(_._1).sum
    val within = perBrand.values.map(_._2).sum
    val s2hi = perBrand.values
      .map { case (d, _) => (d * d) / GraphOps.ModSplit }.sum.toDouble
    val s2lo = perBrand.values
      .map { case (d, _) => (d * d) % GraphOps.ModSplit }.sum.toDouble
    val expectedQ = within.toDouble / m -
      (s2hi * GraphOps.ModSplit.toDouble + s2lo) / m / m
    val row = q("q_graph_modularity").collect().head
    assert(row.getLong(0) == m, "m_arcs differs")
    assert(row.getLong(1) == perBrand.size.toLong, "n_comms differs")
    assert(row.getLong(2) == within, "within_arcs differs")
    assert(row.getDouble(3) == expectedQ, "modularity differs")
    // the partition is non-degenerate on the fixture: many brands, and
    // arcs do cross brand boundaries (a Q pinned structurally to 0 —
    // e.g. connected components on a connected graph — is exactly what
    // this operator redesign avoided)
    assert(perBrand.size > 1 && within < m,
      "brand partition should be non-degenerate on the fixture")
    // r14: per-brand conductance off the SAME brand-arc aggregation —
    // exact replay, and φ ∈ [0, 1] because the arc list is symmetric
    // (cut(c) = cut(rest) ≤ vol(rest))
    val cRows = q("q_graph_conductance").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    val expected = perBrand.collect {
      case (b, (d, a)) if math.min(d, m - d) > 0 =>
        b -> ((d, a, d - a, m,
          (d - a).toDouble / math.min(d, m - d)))
    }
    assert(cRows == expected, "conductance replay differs")
    cRows.values.foreach { case (_, _, _, _, phi) =>
      assert(phi >= 0.0 && phi <= 1.0, "conductance out of [0,1]")
    }
  }

  test("kcore equals a brute-force peel to the fixpoint") {
    // driver-side peel on the mutual-KNN graph: converged by construction,
    // so equality also pins that the engine's early-exit loop (and the
    // oracle's KcIters-round unroll) truly reach the fixpoint
    var nbr = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    mutualEdges.foreach { case (u, v) =>
      nbr(u) = nbr(u) + v; nbr(v) = nbr(v) + u
    }
    var changed = true
    while (changed) {
      val drop = nbr.collect {
        case (n, vs) if vs.size < GraphOps.KCoreK => n }.toSet
      changed = drop.nonEmpty
      if (changed) {
        drop.foreach(nbr.remove)
        nbr.keys.toSeq.foreach(n => nbr(n) = nbr(n) -- drop)
      }
    }
    val expected = nbr.values.map(_.size.toLong).groupBy(identity)
      .map { case (d, xs) => (d, xs.size.toLong) }.toSeq.sortBy(_._1)
    val got = q("q_graph_kcore").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, "in-core degree histogram differs from brute peel")
    // the core is non-trivial on the fixture and every node meets the bound
    assert(got.map(_._2).sum > 0, "fixture 3-core is empty — cap needs a look")
    assert(got.forall(_._1 >= GraphOps.KCoreK))
  }

  test("bfs layers equal a brute-force queue BFS from the min-id node") {
    val nbr = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    mutualEdges.foreach { case (u, v) =>
      nbr(u) = nbr(u) + v; nbr(v) = nbr(v) + u
    }
    val src = nbr.keys.min
    val dist = scala.collection.mutable.Map(src -> 0L)
    var frontier = List(src)
    while (frontier.nonEmpty) {
      frontier = frontier.flatMap(u => nbr(u).filterNot(dist.contains)
        .map { v => dist(v) = dist(u) + 1; v })
    }
    val expected = nbr.keys.toSeq
      .map(n => dist.getOrElse(n, -1L)).groupBy(identity)
      .map { case (h, xs) => (h, xs.size.toLong) }.toSeq.sortBy(_._1)
    val got = q("q_graph_bfs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, "hop histogram differs from queue BFS")
    // source layer is exactly one node at hops 0
    assert(got.exists(r => r._1 == 0L && r._2 == 1L))
  }

  test("degree profile counts every node once and every arc twice") {
    val rows = q("q_graph_degree").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nodes = rows.map(_._3).sum
    val arcs = rows.map(r => r._2 * r._3).sum
    val deg = edges.groupBy(_._1).view.mapValues(_.length).toMap
    assert(nodes == deg.size)
    assert(arcs == edges.length, "sum(degree·n_nodes) must equal arc count")
    // replay the full histogram
    val expected = deg.toSeq
      .groupBy { case (id, d) =>
        (if (id % 2 == 0) "customer" else "supplier", d.toLong) }
      .map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSet
    assert(rows.toSet == expected)
  }

  test("label propagation equals a driver-side synchronous replay (r12)") {
    val rows = q("q_graph_labelprop").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val arcs = graft.ops.GraphOps.copurchaseAdj(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("n") >=
        graft.ops.GraphOps.StrongSupport)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val incoming = arcs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab = incoming.keySet.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      lab = incoming.map { case (node, nbrs) =>
        val freq = nbrs.map(lab).groupBy(identity).view
          .mapValues(_.length).toMap
        val best = freq.toSeq.minBy { case (l, c) => (-c, l) }._1
        node -> best
      }
    }
    val hist = lab.values.groupBy(identity).values
      .map(_.size.toLong) // community sizes
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows == hist, "LP community-size histogram replay")
    assert(rows.nonEmpty && rows.keys.max > 1,
      "LP must form at least one non-trivial community on this graph")
  }

  test("ktruss peeling equals a driver-side support replay (r12)") {
    val rows = q("q_graph_ktruss").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L), "one row per round")
    rows.foreach { case (_, nIn, nTri, mx, nKept, nDrop) =>
      assert(nKept + nDrop == nIn, "kept + dropped partitions the round")
      assert(nKept <= nIn && nTri >= 0 && mx >= 0)
    }
    // the rounds CHAIN: next round starts from this round's survivors
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._2 == a._5, "round chaining broken")
      case _ =>
    }
    // driver-side replay of the full peeling on the collected edge set
    var es = graft.ops.GraphOps.mutualKnnEdges(spark, sfDir)
      .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { case (_, nIn, nTri, mx, nKept, _) =>
      assert(nIn == es.size.toLong, "round input size")
      val adj = es.toSeq.flatMap(e => Seq(e, e.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val sup = es.toSeq.map { case (u, v) =>
        (u, v) -> adj(u).intersect(adj(v)).size.toLong
      }.toMap
      assert(nTri == sup.values.sum / 3, "triangle count")
      assert(mx == (if (sup.isEmpty) 0L else sup.values.max), "max support")
      val kept = es.filter(e => sup(e) >= 2)
      assert(nKept == kept.size.toLong, "survivor count")
      es = kept
    }
  }

  test("random-walk sample equals a driver-side argmin-hash walk replay (r12)") {
    val rows = q("q_graph_rw_sample").collect().map(r =>
      (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))).toMap
    assert(rows.nonEmpty)
    val adj = graft.ops.GraphOps.copurchaseAdj(spark, sfDir)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (s0, es) => (s0, es.map(_._2)) }
    val P = graft.functions.ReplayableHash.P
    val ps = graft.functions.ReplayableHash.RwParams
    adj.keys.foreach { start =>
      var cur = start
      val path = (0 until 4).map { t =>
        val (a, b) = ps(t)
        cur = adj(cur).minBy(d => ((a * (d % P) + b) % P, d))
        cur
      }
      val (n1, n2, n3, n4, nu) = {
        val r = rows(start); (r._1, r._2, r._3, r._4, r._5)
      }
      assert((n1, n2, n3, n4) == ((path(0), path(1), path(2), path(3))),
        s"walk from $start")
      assert(nu == (start +: path).distinct.length.toLong, s"$start n_unique")
    }
    assert(rows.keySet == adj.keySet, "one walk per adjacency node")
  }

  test("HITS equals a driver-side integer power-iteration replay (r15)") {
    import graft.ops.GraphPathOps.{HitsIters, HitsScale}
    val rows = q("q_graph_hits").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // replay: edges is the both-directions arc list (src, dst)
    val sToC = edges.filter(_._1 % 2 == 1)
    val cToS = edges.filter(_._1 % 2 == 0)
    var a: Map[Long, Long] = edges.map(_._1).filter(_ % 2 == 1).distinct
      .map(_ -> HitsScale).toMap
    var h: Map[Long, Long] = Map.empty
    (1 to HitsIters).foreach { _ =>
      val hr = sToC.groupBy(_._2).view
        .mapValues(_.map(e => a(e._1)).sum).toMap
      val mxh = hr.values.max
      h = hr.view.mapValues(v => Math.floorDiv(v * HitsScale, mxh)).toMap
      val ar = cToS.groupBy(_._2).view
        .mapValues(_.map(e => h(e._1)).sum).toMap
      val mxa = ar.values.max
      a = ar.view.mapValues(v => Math.floorDiv(v * HitsScale, mxa)).toMap
    }
    val expected =
      h.map { case (n, v) => ("customer", n / 2) -> v } ++
        a.map { case (n, v) => ("supplier", (n - 1) / 2) -> v }
    assert(rows == expected, "HITS scores must equal the driver replay")
    // non-vacuous: normalization pins at least one node per side at the
    // scale ceiling, and scores differentiate below it
    assert(rows.values.max == HitsScale)
    assert(rows.values.toSet.size > 2, "HITS degenerated to constants")
  }
}
