package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property tests for the oracle-less LLM dedup / similarity family
  * (SURVEY §2B). The driver's DuckDB gate can't hash-check these queries
  * (float instability / no SQL twin), so each one is pinned here against an
  * independent driver-side reimplementation or exact ground truth computed
  * from the sf0.001 fixtures (500 docs / 500 vectors — the O(n²) loops below
  * are test scaffolding, not an engine path).
  */
class LlmSpec extends SparkTestBase {

  private def docsDf: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

  // ---- exact token-set Jaccard ground truth ------------------------------

  private lazy val tokenSets: Array[(Long, Set[String])] =
    docsDf.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').filter(_.nonEmpty).toSet))
      .sortBy(_._1)

  /** (doc_a < doc_b) -> exact Jaccard, for pairs with any token overlap. */
  private lazy val exactJaccard: Map[(Long, Long), Double] = {
    val out = Map.newBuilder[(Long, Long), Double]
    for (i <- tokenSets.indices; j <- (i + 1) until tokenSets.length) {
      val (ida, ta) = tokenSets(i)
      val (idb, tb) = tokenSets(j)
      val inter = ta.count(tb.contains)
      if (inter > 0)
        out += ((ida, idb) -> inter.toDouble / (ta.size + tb.size - inter))
    }
    out.result()
  }

  /** Uncapped LSH candidates: (doc_a, doc_b) -> n_shared_bands. */
  private lazy val uncappedCands: Map[(Long, Long), Long] =
    graft.ops.LlmOps.candidatePairs(docsDf, maxBucket = Int.MaxValue)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap

  test("exact-duplicate token sets (J = 1) are always candidates, sharing all 8 bands") {
    val dups = exactJaccard.filter(_._2 == 1.0).keySet
    assert(dups.nonEmpty, "fixture sanity: expected exact-duplicate pairs")
    val missing = dups.filterNot(uncappedCands.contains)
    assert(missing.isEmpty, s"J=1 pairs missing from candidates: ${missing.take(5)}")
    val partial = dups.filter(p => uncappedCands(p) != 8L)
    assert(partial.isEmpty, s"J=1 pairs with <8 shared bands: ${partial.take(5)}")
  }

  test("uncapped LSH recall vs exact Jaccard: >=99% at J>=0.9, >=97% at J>=0.7") {
    def recall(thr: Double): Double = {
      val relevant = exactJaccard.filter(_._2 >= thr).keySet
      assert(relevant.nonEmpty)
      relevant.count(uncappedCands.contains).toDouble / relevant.size
    }
    val r9 = recall(0.9)
    val r7 = recall(0.7)
    info(f"measured LSH recall: J>=0.9 -> $r9%.4f, J>=0.7 -> $r7%.4f")
    assert(r9 >= 0.99, f"recall at J>=0.9 was $r9%.4f")
    assert(r7 >= 0.97, f"recall at J>=0.7 was $r7%.4f")
  }

  test("minhash recall harness: per-probe report is internally consistent") {
    val rows = q("q_llm_minhash_recall").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (pid, nExact, nCand, nHits, recall) =>
      assert(pid < 50L)
      assert(nExact >= 1L && nExact <= 10L)
      assert(nHits <= math.min(nExact, nCand),
        s"probe $pid: hits exceed exact/candidate counts")
      assert(recall == nHits.toDouble / nExact)
    }
    // exact ground truth replay for the top-10 membership of a few probes:
    // token-set Jaccard over the same distinct-token contract
    val toksAll = graft.ops.table(spark, sfDir, "documents")
      .selectExpr("doc_id", "explode(split(text, ' ')) AS t")
      .where("length(t) > 0").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sets = toksAll.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val probeIds = rows.map(_._1).take(3)
    probeIds.foreach { pid =>
      val p = sets(pid)
      val scored = sets.toSeq.filter(_._1 != pid)
        .map { case (d, s) =>
          val i = (p & s).size
          (d, i.toDouble / (p.size + s.size - i))
        }
        .filter(_._2 > 0)
        .sortBy { case (d, j) => (-j, d) }
        .take(10).map(_._1).toSet
      // the engine's exact set is internal; pin n_exact against the replay
      val nExact = rows.find(_._1 == pid).get._2
      assert(nExact == scored.size.toLong, s"probe $pid ground-truth size")
    }
    // the harness has teeth on the fixture: mean recall is high (the caps
    // cost little at this bucket histogram) but NOT pinned to 1.0
    val mean = rows.map(_._5).sum / rows.length
    info(f"minhash LSH capped recall@10 mean: $mean%.4f over ${rows.length} probes")
    assert(mean >= 0.5, f"mean recall collapsed: $mean%.4f")
  }

  test("shared-band count is a monotone similarity signal") {
    def meanJ(p: Long => Boolean): Double = {
      val js = uncappedCands.collect { case (pair, nb) if p(nb) => exactJaccard.getOrElse(pair, 0.0) }
      js.sum / js.size
    }
    val strong = meanJ(_ >= 4)
    val weak = meanJ(_ == 1)
    info(f"mean exact J: >=4 bands -> $strong%.3f, 1 band -> $weak%.3f")
    assert(strong > weak)
  }

  test("production candidate query (capped buckets) emits a subset of uncapped candidates") {
    val prod = q("q_llm_minhash").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(prod.nonEmpty)
    val leaked = prod.filterNot(uncappedCands.contains)
    assert(leaked.isEmpty, s"capped pairs not in uncapped set: ${leaked.take(5)}")
  }

  test("n-gram Jaccard verification reports the exact Jaccard of each candidate pair") {
    val got = q("q_llm_ngram_jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (pair, j) =>
      val exact = exactJaccard.getOrElse(pair, 0.0)
      assert(math.abs(j - exact) < 1e-9, s"pair $pair: query=$j exact=$exact")
    }
  }

  test("tf-cosine rows equal a driver-side multiset recount (r12c3)") {
    val docs = ops.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ").filter(_.nonEmpty)
          .groupBy(identity).map { case (t, g) => (t, g.length.toLong) }))
      .toMap
    def ssOf(m: Map[String, Long]): Long = m.values.map(v => v * v).sum
    def dotOf(a: Map[String, Long], b: Map[String, Long]): Long =
      a.iterator.map { case (t, v) => v * b.getOrElse(t, 0L) }.sum
    val got = q("q_llm_tf_cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
    assert(got.nonEmpty)
    got.foreach { case ((a, b), (dot, ssa, ssb, cos)) =>
      val (ma, mb) = (docs(a), docs(b))
      assert(dot == dotOf(ma, mb) && ssa == ssOf(ma) && ssb == ssOf(mb),
        s"integer parts for ($a, $b)")
      val expect = dot.toDouble / (math.sqrt(ssa.toDouble) * math.sqrt(ssb.toDouble))
      assert(cos == expect, s"cosine replay for ($a, $b)")
      assert(cos >= 0.5 && cos <= 1.0 + 1e-12, s"cosine range for ($a, $b)")
    }
    // multiset-vs-set separation: cosine sees repetition Jaccard cannot —
    // identical-token-SET pairs with different tf profiles score < 1
    val anyBelowOne = got.exists(_._2._4 < 1.0 - 1e-12)
    assert(anyBelowOne || got.size < 3,
      "every emitted pair scored exactly 1.0 — multiset path untested")
  }

  test("rouge-1 rows equal a driver-side min-multiset recount (r12c3)") {
    val docs = ops.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ").filter(_.nonEmpty)
          .groupBy(identity).map { case (t, g) => (t, g.length.toLong) }))
      .toMap
    val got = q("q_llm_rouge1").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7))))
    assert(got.nonEmpty)
    got.foreach { case ((a, b), (ov, dla, dlb, p, rr, f1)) =>
      val (ma, mb) = (docs(a), docs(b))
      val overlap = ma.iterator
        .map { case (t, v) => math.min(v, mb.getOrElse(t, 0L)) }.sum
      assert(ov == overlap && dla == ma.values.sum && dlb == mb.values.sum,
        s"integer parts for ($a, $b)")
      val ep = ov.toDouble / dla.toDouble
      val er = ov.toDouble / dlb.toDouble
      assert(p == ep && rr == er, s"p/r replay for ($a, $b)")
      val ef1 = if (ep + er > 0) 2 * ep * er / (ep + er) else 0.0
      assert(f1 == ef1, s"f1 replay for ($a, $b)")
      // the harmonic mean never exceeds either side
      assert(f1 <= math.max(p, rr) + 1e-12 && p <= 1.0 && rr <= 1.0,
        s"rouge bounds for ($a, $b)")
    }
  }

  // ---- similarity search vs driver-side ground truth ---------------------

  private lazy val vectors: Array[(Long, Array[Double])] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** Same semantics as graft.functions.CosineSimilarity (0.0 on zero norm). */
  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val probeVec: Array[Double] = vectors.find(_._1 == 0L).get._2

  /** (vec_id, cos vs probe) for every non-probe vector. */
  private lazy val simToProbe: Array[(Long, Double)] =
    vectors.filter(_._1 != 0L).map { case (id, v) => (id, cosine(v, probeVec)) }

  private def top10(cands: Array[(Long, Double)]): Seq[(Long, Double)] =
    cands.sortBy { case (id, s) => (-s, id) }.take(10).toSeq

  private def assertTopK(got: Array[(Long, Double)], want: Seq[(Long, Double)]): Unit = {
    assert(got.map(_._1).toSeq == want.map(_._1),
      s"ids: got ${got.map(_._1).mkString(",")} want ${want.map(_._1).mkString(",")}")
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-9)
    }
  }

  /** Byte-level Levenshtein DP — the query's DECLARED unit (both engines
    * compute the DP over UTF-8 bytes; on ASCII it coincides with the
    * codepoint unit). */
  private def levBytes(sa: String, sb: String): Int = {
    val a = sa.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = sb.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    for (j <- 0 to b.length) prev(j) = j
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      Array.copy(cur, 0, prev, 0, b.length + 1)
    }
    prev(b.length)
  }

  /** First n CODEPOINTS (both engines' substring unit — String.take would
    * split astral surrogate pairs). */
  private def cpPrefix(s: String, n: Int): String = {
    val it = s.codePoints().iterator()
    val sb = new java.lang.StringBuilder
    var k = 0
    while (k < n && it.hasNext) { sb.appendCodePoint(it.next()); k += 1 }
    sb.toString
  }

  test("editdist_neardup equals an independent driver-side byte DP over the candidates") {
    val texts = docsDf.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), cpPrefix(r.getString(1), graft.ops.LlmOps.EditPfx)))
      .toMap
    // the full (unlimited) memoized candidate relation the query reads
    val cands = graft.ops.LlmOps.candidateIndexFor(spark, sfDir)._3.collect()
      .filter(_.getAs[Long]("n_shared_bands") >= 2)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    def blen(s: String): Long =
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
    val expected = cands.map { case (a, b) =>
      val (ta, tb) = (texts(a), texts(b))
      val d = levBytes(ta, tb).toLong
      val mx = math.max(1L, math.max(blen(ta), blen(tb)))
      (a, b, d, blen(ta), blen(tb), 1.0 - d.toDouble / mx)
    }.filter(_._6 >= graft.ops.LlmOps.EditSimTau)
      .sortBy { case (a, b, _, _, _, s) => (-s, a, b) }.toSeq
    val got = q("q_llm_editdist_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expected, "edit-distance pairs differ from the driver DP")
    assert(got.nonEmpty, "fixture should surface at least one near-dup pair")
  }

  test("edit-distance byte unit holds on non-ASCII text across both engines") {
    // the round-9 verdict's latent hole: Spark levenshtein is
    // codepoint-based, DuckDB's is byte-based — the declared unit is BYTES,
    // realized on the Spark side via the Latin-1 byte proxy. Pin the
    // engine expression AND the DuckDB twin to the same driver byte-DP on
    // accented/CJK/astral text (each a different UTF-8 width).
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("résumé", "resume"),       // 2-byte chars vs ASCII
      ("naïve café", "naive cafe"),
      ("日本語テキスト", "日本語テキスト!"), // 3-byte chars, 1-byte append
      ("emoji 😀 doc", "emoji doc"), // astral (4-byte)
      ("plain ascii", "plain ascii"))
    val df = spark.createDataFrame(rows).toDF("a", "b")
      .select(col("a"), col("b"),
        levenshtein(
          decode(encode(col("a"), "UTF-8"), "ISO-8859-1"),
          decode(encode(col("b"), "UTF-8"), "ISO-8859-1")).as("d"))
    val gotSpark = df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    gotSpark.foreach { case (a, b, d) =>
      assert(d == levBytes(a, b), s"spark byte-proxy DP diverges on ($a, $b)")
    }
    // the test must BITE: without the proxy, Spark's codepoint DP disagrees
    // with the byte unit on at least one of these rows (résumé/resume is
    // 2 codepoint edits but 4 byte edits)
    val plain = spark.createDataFrame(rows).toDF("a", "b")
      .select(levenshtein(col("a"), col("b"))).collect().map(_.getInt(0))
    assert(plain.zip(gotSpark.map(_._3)).exists { case (cp, by) => cp != by },
      "every probe row is unit-insensitive — strengthen the fixture")
    // (DuckDB's native levenshtein is byte-based — probed directly this
    // round: lev('é','e') = 2, lev('€','e') = 3 — so the twin needs no
    // proxy; scripts/oracle_lint.py binds the twin and the ASCII fixture
    // gate pins the shared-unit arithmetic end-to-end.)
  }

  test("brute-force kNN matches a driver-side exact reimplementation") {
    val got = q("q_llm_sim_knn").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assertTopK(got, top10(simToProbe))
  }

  test("sign-LSH ANN = exact top-10 restricted to the probe's hyperplane bucket") {
    // independent reimplementation of the deterministic plane family
    val planes = Array.tabulate(8, 64) { (p, i) =>
      if (((p * 73856093 + i * 19349663) % 7 + 7) % 7 < 3) -1.0 else 1.0
    }
    // dot-product sign per plane, matching bucketOf in LlmOps
    def bucketOf(v: Array[Double]): Long = {
      var acc = 0L
      var p = 0
      while (p < 8) {
        var d = 0.0; var i = 0
        while (i < v.length) { d += v(i) * planes(p)(i); i += 1 }
        if (d > 0) acc |= (1L << p)
        p += 1
      }
      acc
    }
    val pb = bucketOf(probeVec)
    val inBucket = simToProbe.filter { case (id, _) => bucketOf(vectors.find(_._1 == id).get._2) == pb }
    val got = q("q_llm_sim_knn_lsh").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assertTopK(got, top10(inBucket))
    // recall trade-off stays bounded on the fixture: the bucket-restricted
    // top-1 is within 2x of the global optimum's similarity
    val bruteBest = top10(simToProbe).head._2
    assert(got.head._2 >= bruteBest * 0.5,
      s"LSH top-1 ${got.head._2} vs brute top-1 $bruteBest")
  }

  // Since round 4 the IVF index is real k-means (seed-id init + exact-
  // arithmetic Lloyd iterations, broadcast centroid relation), so the spec
  // pins semantic properties rather than replicating the centroid
  // arithmetic driver-side: cosines are exact, searching every cell IS
  // brute force, recall is monotone in nprobe, and the index is
  // bit-deterministic across runs.

  test("IVF: exact cosines per result, and nprobe = K searches everything = brute force") {
    val brute = q("q_llm_sim_knn").collect().map(r => (r.getLong(0), r.getDouble(2)))
    val full = graft.ops.AnnOps.ivfTopK(spark, sfDir, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assertTopK(full, brute.toSeq)
    val byId = vectors.toMap
    for (name <- Seq("q_llm_sim_knn_ivf", "q_llm_sim_knn_ivf2")) {
      val got = q(name).collect().map(r => (r.getLong(0), r.getDouble(2)))
      assert(got.nonEmpty, name)
      got.foreach { case (id, s) =>
        assert(math.abs(s - cosine(byId(id), probeVec)) < 1e-9, s"$name id=$id")
      }
      assert(got.map(_._2).toSeq == got.map(_._2).sortBy(-_).toSeq, s"$name order")
    }
  }

  test("IVF recall monotone in nprobe; k-means cohesion beats seed centroids at K=8 and K=64") {
    val bruteIds = q("q_llm_sim_knn").collect().map(_.getLong(0)).toSet
    def recall(np: Int, k: Int, iters: Int = 2): Double =
      graft.ops.AnnOps.ivfTopK(spark, sfDir, nprobe = np, k = k, iters = iters)
        .collect().map(_.getLong(0)).count(bruteIds.contains).toDouble / bruteIds.size
    val r1 = recall(1, 8)
    val r2 = recall(2, 8)
    val r64 = Seq(1, 2, 4, 8).map(np => np -> recall(np, 64)).toMap
    val seed1 = recall(1, 8, iters = 0)
    val seed64 = recall(4, 64, iters = 0)
    info(f"IVF recall: K=8 np=1 -> $r1%.2f (seed-centroid $seed1%.2f), np=2 -> $r2%.2f; " +
      s"K=64 np=1/2/4/8 -> ${Seq(1, 2, 4, 8).map(r64).map(r => f"$r%.2f").mkString("/")}" +
      f" (seed-centroid np=4 $seed64%.2f)")
    // a superset of searched cells can only add global-top-10 members
    assert(r2 >= r1)
    assert(r64(1) <= r64(2) && r64(2) <= r64(4) && r64(4) <= r64(8))
    // Index quality, measured on the statistic k-means actually optimizes —
    // mean best-centroid cosine over ALL corpus vectors. Single-probe top-10
    // recall deltas are ±1-neighbor noise on these near-uniform synthetic
    // embeddings (and comparing across K at fixed nprobe measures corpus
    // COVERAGE: K=64/np=4 scans 6% vs 12.5% at K=8/np=1), so the "real
    // centroids beat lowest-id seeds" claim is pinned on cohesion, where the
    // improvement is large and stable (measured +37% at K=8, +31% at K=64).
    val byId2 = vectors.toMap
    def cohesion(iters: Int, k: Int): Double = {
      // centroids are integer-sum DIRECTION vectors over the quantized
      // lattice (cosine is scale-invariant), compared against the true
      // float vectors
      val cents = graft.ops.AnnOps
        .kmeansCentroids(spark, graft.ops.AnnOps.embWithLattice(spark, sfDir), k, iters)
        .collect().map(_.getSeq[Long](1).map(_.toDouble).toArray)
      byId2.values.map(v => cents.map(c => cosine(v, c)).max).sum / byId2.size
    }
    for (k <- Seq(8, 64)) {
      val c0 = cohesion(0, k)
      val c2 = cohesion(2, k)
      info(f"k-means cohesion K=$k: seed $c0%.4f -> 2 Lloyd iters $c2%.4f")
      assert(c2 > c0,
        f"K=$k: k-means cohesion $c2%.4f did not improve on seed centroids $c0%.4f")
    }
    // widening nprobe can only improve (or tie) the best similarity found
    val got1 = q("q_llm_sim_knn_ivf").collect().map(r => r.getDouble(2))
    val got2 = q("q_llm_sim_knn_ivf2").collect().map(r => r.getDouble(2))
    assert(got2.head >= got1.head)
  }

  test("IVF is bit-deterministic across runs (exact integer lattice accumulation)") {
    // the centroid BUILD is what could wobble (summation order), and the
    // production path memoizes it — so determinism is pinned on two
    // independent uncached builds, under different partitioning (exact
    // BIGINT lattice sums are order-independent by construction)
    val emb = graft.ops.AnnOps.embWithLattice(spark, sfDir)
    def build(parts: Int): Seq[(Long, Seq[Long])] =
      graft.ops.AnnOps.kmeansCentroids(spark, emb.repartition(parts), 8, 2)
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq.sortBy(_._1)
    assert(build(3) == build(17))
    def run(): Seq[(Long, Double)] =
      q("q_llm_sim_knn_ivf").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(run() == run())
  }

  test("embedding near-dup pairs carry exact cosine values, ordered descending") {
    val got = q("q_llm_embed_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    val byId = vectors.toMap
    got.foreach { case (a, b, s) =>
      val exact = cosine(byId(a), byId(b))
      assert(math.abs(s - exact) < 1e-9, s"pair ($a,$b): query=$s exact=$exact")
    }
    assert(got.map(_._3).toSeq == got.map(_._3).sortBy(-_).toSeq, "descending order")
  }

  // ---- SimHash invariants ------------------------------------------------

  test("identical token sets receive identical SimHash fingerprints") {
    // SimHash is computed over the distinct-token set (docTokens), so docs
    // with equal token sets — the fixture's J=1 pairs — must collide exactly
    val setOf = tokenSets.toMap
    val sims = q("q_llm_simhash").collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySet = sims.groupBy { case (id, _) => setOf(id) }
    assert(bySet.exists(_._2.length > 1), "fixture sanity: duplicate token sets exist")
    bySet.foreach { case (_, group) =>
      assert(group.map(_._2).distinct.length == 1,
        s"docs ${group.map(_._1).mkString(",")} share a token set but differ in simhash")
    }
  }

  test("minhash signature-agreement estimates exact Jaccard (J=1 exact, bounded MAE)") {
    val rows = q("q_llm_minhash_est").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val errs = rows.map { case (pair, nAgree, est) =>
      assert(est == nAgree.toDouble / 16, s"$pair est not the exact rational")
      val exact = exactJaccard.getOrElse(pair, 0.0)
      // identical token sets must agree on EVERY signature position
      if (exact == 1.0) assert(est == 1.0, s"$pair J=1 but est=$est")
      math.abs(est - exact)
    }
    // K=16 → per-pair std ≤ 0.125; the mean absolute error over the
    // candidate set must stay well inside that envelope
    val mae = errs.sum / errs.length
    assert(mae < 0.15, s"MAE $mae too large for K=16")
  }

  test("block dedup stats match an independent string-block ground truth") {
    // ground truth on TOKEN-STRING blocks (collision-free by construction),
    // independent of the generator's hash arithmetic
    val blocks: Array[(Long, Array[Seq[String]])] = tokenSets.map(_._1).map { id =>
      val toks = docsDf.where(col("doc_id") === id)
        .head().getAs[String]("text").split(' ').filter(_.nonEmpty)
      (id, toks.grouped(8).filter(_.length == 8).map(_.toSeq).toArray)
    }
    val df = blocks.flatMap(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val expected = blocks.map { case (id, bs) =>
      (id, (bs.length.toLong, bs.count(b => df(b) > 1).toLong))
    }.toMap
    val got = q("q_llm_block_dedup").collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expected.keySet)
    val bad = expected.filter { case (id, e) => got(id) != e }
    assert(bad.isEmpty, s"mismatched block stats: ${bad.take(5)}")
    // fingerprint wiring: recompute one doc's unique-block fingerprint from
    // the shared constants
    val RH = graft.functions.ReplayableHash
    val (id0, bs0) = blocks.find(_._2.nonEmpty).get
    val hs = bs0.map(_.foldLeft(0L)((h, t) => (h * RH.BlockBase + RH.tokenHash(t)) % RH.P))
    val fp = hs.zipWithIndex.collect {
      case (h, i) if df(bs0(i)) == 1 => ((i + 1) % RH.P) * h % RH.P
    }.sum % RH.P
    val gotFp = q("q_llm_block_dedup").where(col("doc_id") === id0)
      .head().getAs[Long]("uniq_fp")
    assert(gotFp == fp, s"doc $id0 fingerprint $gotFp != recomputed $fp")
  }

  test("semdedup verdicts are sound: every drop cites a lower-id neighbor above tau") {
    val embs: Map[Long, Seq[Double]] =
      spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble))).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val rows = q("q_llm_emb_semdedup").collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3)))
    assert(rows.map(_._1).toSet == embs.keySet)
    rows.foreach { case (id, dupOf, keep) =>
      assert(keep == dupOf.isEmpty, s"vec $id: keep inconsistent with dup_of")
      dupOf.foreach { d =>
        assert(d < id, s"vec $id cites non-lower dup_of $d")
        val c = cos(embs(id), embs(d))
        assert(c >= 0.4 - 1e-12, s"vec $id dropped for $d but cos=$c < tau")
      }
    }
    assert(rows.exists(!_._3), "fixture sanity: expected at least one drop")
  }

  test("semdedup recall vs exact ground truth: quantified, monotone in plane count") {
    // exact within-tau ground truth on sf0.001 (500 vectors — test-side
    // O(n²) only): a vector is a TRUE dup iff some lower-id vector sits at
    // cosine >= tau. The sign-LSH cells miss cross-cell neighbors
    // (nprobe=1), so engine recall < 1 by design; this pins HOW MUCH.
    val embs: Array[(Long, Seq[Double])] =
      spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
        .sortBy(_._1)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val tau = 0.4
    val trueDups: Set[Long] = (for {
      j <- embs.indices
      if embs.indices.take(j).exists(i => cos(embs(i)._2, embs(j)._2) >= tau - 1e-12)
    } yield embs(j)._1).toSet
    assert(trueDups.nonEmpty, "fixture sanity: ground truth has dups")

    val emb = graft.ops.AnnOps.embDouble(spark, sfDir)
    def recallAt(nPlanes: Int, cap: Int): Double = {
      val dropped = graft.ops.AnnOps
        .semdedupVerdicts(spark, emb, tau, nPlanes, cap)
        .where(!col("keep")).collect().map(_.getLong(0)).toSet
      // soundness (pinned elsewhere) implies dropped ⊆ trueDups
      assert(dropped.subsetOf(trueDups), s"unsound drop at nPlanes=$nPlanes")
      dropped.size.toDouble / trueDups.size
    }

    // uncapped, plane-prefix cells NEST: fewer planes = coarser cells ⊇
    // finer cells, so candidate pairs (and recall) are monotone
    // non-increasing in plane count — structural, not statistical (note
    // even 1 plane is TWO half-space cells, so recall < 1 everywhere:
    // the cross-cell miss exists at every plane count)
    val uncapped = Seq(1, 2, 4, 8).map(p => p -> recallAt(p, Int.MaxValue))
    uncapped.sliding(2).foreach { case Seq((pa, ra), (pb, rb)) =>
      assert(ra >= rb - 1e-12, s"recall rose with planes: $pa->$ra, $pb->$rb")
    }
    val shipped = recallAt(8, 200)
    info(s"semdedup recall: uncapped by planes " +
      uncapped.map { case (p, r) => f"$p->$r%.3f" }.mkString(", ") +
      f", shipped (8 planes, cap 200) -> $shipped%.3f over ${trueDups.size} true dups")
    // the SHIPPED config (8 planes, cap 200) measured 0.194 on this
    // fixture (uncapped by planes: 1->0.629, 2->0.452, 4->0.258,
    // 8->0.194; cap 200 costs nothing at 500 vectors). tau=0.4 is a ~66°
    // angle — sign-LSH agreement decays fast there, which is exactly why
    // SemDeDup proper uses k-means cells (or multi-probe) for low-tau
    // regimes; at its production tau≈0.95 the same 8 planes agree far
    // more often. Pinned below the measured value so a silent recall
    // collapse (plane or cap regression) fails loudly while the nprobe=1
    // cross-cell miss stays quantified instead of just documented.
    assert(shipped >= 0.15, s"shipped-config recall $shipped < 0.15")

    // the multi-probe variant (weakest-plane flip) must be sound, beat the
    // single-probe recall on the same ground truth, and clear its own
    // measured floor — the recall/cost dial, quantified
    val mpDropped = graft.ops.AnnOps
      .semdedupMultiProbeVerdicts(spark, emb)
      .where(!col("keep")).collect().map(_.getLong(0)).toSet
    assert(mpDropped.subsetOf(trueDups), "unsound multi-probe drop")
    val mpRecall = mpDropped.size.toDouble / trueDups.size
    info(f"semdedup multi-probe recall: $mpRecall%.3f (single-probe $shipped%.3f)")
    // measured 0.258 (vs 0.194): modest at tau=0.4 where near-dup cells
    // differ in ~3/8 bits — one flip only reaches 1-bit-distant pairs
    assert(mpRecall >= shipped - 1e-12, "multi-probe recall below single-probe")
    assert(mpRecall >= 0.2, s"multi-probe recall $mpRecall < 0.2")
  }

  test("token novelty matches a driver-side first-occurrence replay") {
    // tokenSets is sorted by doc_id, so a token's first occurrence is the
    // first doc that carries it in iteration order
    val firstDoc = scala.collection.mutable.Map[String, Long]()
    tokenSets.foreach { case (id, ts) =>
      ts.foreach(t => if (!firstDoc.contains(t)) firstDoc(t) = id)
    }
    val expected = tokenSets.map { case (id, ts) =>
      val novel = ts.count(t => firstDoc(t) == id).toLong
      (id, ts.size.toLong, novel, novel.toDouble / ts.size)
    }.toSeq
    val got = q("q_llm_ngram_novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
    // fixture sanity: duplicates exist, so some docs must be fully stale
    assert(got.exists(_._3 == 0L), "expected at least one zero-novelty doc")
  }

  test("cross-source overlap matrix recounts from the candidate pair list") {
    val srcOf = docsDf.select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    // q_llm_minhash_est lists every capped candidate pair at >= 2 bands —
    // the same relation the overlap matrix rolls up
    val pairs = q("q_llm_minhash_est").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.groupBy { case (a, b) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.view.mapValues(_.length.toLong).toMap
    val total = expected.values.sum
    val got = q("q_llm_cross_source_overlap").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))))
    assert(got.map(_._1).toSet == expected.keySet)
    got.foreach { case ((lo, hi), (n, share, cross)) =>
      assert(n == expected((lo, hi)), s"pair ($lo,$hi)")
      assert(share == n.toDouble / total, s"share ($lo,$hi)")
      assert(cross == (lo != hi), s"cross flag ($lo,$hi)")
    }
  }

  test("embedding outliers are the true bottom-5 by own-label centroid cosine") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        transform(col("embedding"), _.cast("double")).as("emb"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val byLabel = rows.groupBy(_._2)
    // exact centroid replay: HALF_UP-rounded 2^16 quantization, BIGINT
    // sums, one IEEE division per dimension — the engine's arithmetic
    val cents = byLabel.map { case (lab, vs) =>
      val cent = Array.tabulate(vs.head._3.length) { d =>
        val qsum = vs.map(v => BigDecimal(v._3(d) * 65536)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
        qsum.toDouble / (vs.length * 65536.0)
      }
      (lab, cent)
    }
    val expected = byLabel.flatMap { case (lab, vs) =>
      vs.map { case (id, _, v) => (id, cosine(v, cents(lab))) }
        .toSeq.sortBy { case (id, c) => (c, id) }.take(5)
        .zipWithIndex.map { case ((id, c), i) => (lab, i + 1L, id, c) }
    }.toSet
    val got = q("q_llm_emb_outliers").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected)
  }

  test("nearest-class-mean classification beats chance on the fixture") {
    // the hash gate pins the values; this pins the SIGNAL — the fixture's
    // label clusters are separable, so centroid classification must beat
    // random assignment by a clear margin (sf0.01 measures 4.1x chance)
    val rows = SparkEntry.queries("q_llm_emb_classify")(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val nLabels = rows.map(_._1).distinct.length
    val acc = rows.count(p => p._1 == p._2).toDouble / rows.length
    assert(nLabels >= 2)
    assert(acc > 2.0 / nLabels, s"accuracy $acc vs chance ${1.0 / nLabels}")
  }

  test("ann_recall harness is internally consistent and matches the knn queries") {
    val rows = SparkEntry.queries("q_llm_ann_recall")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.length == 20 && rows.map(_._1).toSeq == (0L until 20L))
    rows.foreach { case (p, nEx, nLsh, nHits, rec) =>
      assert(nEx == 10, s"probe $p exact depth")
      assert(nHits <= math.min(nEx, nLsh), s"probe $p hits exceed a list")
      assert(rec == nHits.toDouble / nEx && rec >= 0.0 && rec <= 1.0)
    }
    // the single-bucket regime is LOW-recall by design (256 cells over 500
    // vectors at sf0.001 — the same honest finding as the semdedup pins);
    // the harness exists to MEASURE it: mean 0.10 on the fixture, floor 0.05
    val mean = rows.map(_._5).sum / rows.length
    assert(mean >= 0.05, s"mean recall $mean collapsed")
    assert(rows.exists(_._4 > 0), "no probe found any true neighbor")
    // probe 0's LSH hit count agrees with the declared single-probe queries:
    // |exact top-10 ∩ lsh top-10| computed from q_llm_sim_knn(+_lsh) directly
    val ex0 = SparkEntry.queries("q_llm_sim_knn")(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val ls0 = SparkEntry.queries("q_llm_sim_knn_lsh")(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(rows.head._4 == (ex0 & ls0).size.toLong,
      "probe 0 hit count disagrees with the declared knn queries")
  }

  test("embedding dim stats equal a driver-side quantized replay") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val dims = vecs.head.length
    val got = SparkEntry.queries("q_llm_emb_dim_stats")(spark, sfDir)
      .collect()
    assert(got.length == dims, "one row per dimension")
    got.foreach { r =>
      val d = r.getLong(0).toInt
      // Spark round() is HALF_UP on the exact double product (math.round
      // would diverge on negative .5 ties — it rounds toward +inf)
      val qs = vecs.map(v => BigDecimal(v(d).toDouble * 65536)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      val n = qs.length.toLong
      val qsum = qs.sum
      val q2hi = qs.map(q => (q * q) / 1073741824L).sum.toDouble
      val q2lo = qs.map(q => (q * q) % 1073741824L).sum.toDouble
      val mean = qsum.toDouble / n / 65536.0
      val variance =
        (q2hi * 1073741824.0 + q2lo) / n / 65536.0 / 65536.0 - mean * mean
      assert(r.getLong(1) == n, s"dim $d: n differs")
      assert(r.getDouble(2) == mean, s"dim $d: mean differs")
      assert(r.getDouble(3) == variance, s"dim $d: variance differs")
      assert(r.getDouble(4) == qs.min.toDouble / 65536.0, s"dim $d: min")
      assert(r.getDouble(5) == qs.max.toDouble / 65536.0, s"dim $d: max")
      // a health report must be able to SEE spread: var ≥ 0 and the
      // bounds bracket the mean
      assert(variance >= 0.0 && r.getDouble(4) <= mean && mean <= r.getDouble(5))
    }
  }

  test("embedding PCA equals a driver-side power-iteration replay (r15)") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val dims = vecs.head.length
    // the dim-stats replay discipline: HALF_UP (away-from-zero) ties
    def rq(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val qs = vecs.map(v => v.map(x => rq(x.toDouble * 65536)))
    val n = qs.length.toLong
    val mean = Array.tabulate(dims) { i =>
      qs.map(_(i)).sum.toDouble / n / 65536.0
    }
    val trace = {
      var t = 0.0
      (0 until dims).foreach { i =>
        val cl = qs.map(_(i))
        val q2hi = cl.map(v => (v * v) / 1073741824L).sum.toDouble
        val q2lo = cl.map(v => (v * v) % 1073741824L).sum.toDouble
        val m = cl.sum.toDouble / n / 65536.0
        t += (q2hi * 1073741824.0 + q2lo) / n / 65536.0 / 65536.0 - m * m
      }
      t
    }
    val xd = qs.map(row => Array.tabulate(dims)(i =>
      row(i).toDouble / 65536.0 - mean(i)))
    val v = Array.fill(dims)(1.0)
    var nrm = 0.0
    (1 to ops.AnnOps.PcaIters).foreach { _ =>
      val wsum = Array.fill(dims)(0L)
      xd.foreach { row =>
        var sv = 0.0
        var i = 0
        while (i < dims) { sv += row(i) * v(i); i += 1 }
        i = 0
        while (i < dims) {
          wsum(i) += rq(row(i) * sv * 1048576.0); i += 1
        }
      }
      val wd = wsum.map(_.toDouble / 1048576.0 / n)
      var s2 = 0.0
      wd.foreach(w => s2 += w * w)
      nrm = math.sqrt(s2)
      (0 until dims).foreach(i => v(i) = if (nrm > 0) wd(i) / nrm else 0.0)
    }
    val got = SparkEntry.queries("q_llm_emb_pca")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val evr = if (trace > 0) nrm / trace else 0.0
    val expected = (0 until dims)
      .map(i => (i.toLong, v(i), nrm, trace, evr))
    assert(got == expected, "PCA drifted from the power-iteration replay")
    // the readout is a meaningful spectral summary: unit loadings, a
    // positive dominant eigenvalue bounded by the exact trace
    val norm2 = got.map(r => r._2 * r._2).sum
    assert(math.abs(norm2 - 1.0) < 1e-9, "loadings not unit-norm")
    assert(nrm > 0.0 && evr > 0.0 && evr <= 1.0 + 1e-9,
      "explained-variance ratio outside (0, 1]")
  }

  test("IVF cluster-quality report is a consistent partition readout (r15)") {
    val rows = SparkEntry.queries("q_llm_emb_cluster_quality")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 8, "one row per IVF cell")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    assert(rows.map(_._2).sum == emb.count(), "cells do not partition")
    val nLabels = emb.select("label").distinct().count()
    rows.foreach { r =>
      assert(r._5 == r._4.toDouble / r._2.toDouble, s"cell ${r._1}: purity ops")
      // pigeonhole: the top label's count is at least n/#labels
      assert(r._5 >= 1.0 / nLabels, s"cell ${r._1}: pigeonhole violated")
      assert(r._6 > 0.0 && r._6 <= 1.0 + 1e-9,
        s"cell ${r._1}: cohesion outside (0,1]")
    }
  }

  test("deflated PC-2 is orthogonal to PC-1 with a sub-unit spectral gap (r15)") {
    val pc1 = SparkEntry.queries("q_llm_emb_pca")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val pc2 = SparkEntry.queries("q_llm_emb_pca2")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(pc2.length == pc1.length, "component dims differ")
    val lam1 = pc1.head._3
    pc2.foreach { r =>
      assert(r._4 == lam1, "eigenvalue1 column drifted from q_llm_emb_pca")
      assert(r._5 == (if (lam1 > 0) r._3 / lam1 else 0.0), "gap_ratio ops")
    }
    // deflation works: v2 ⊥ v1 (up to quantization), unit norm, and the
    // second eigenvalue sits strictly inside (0, λ1]
    val dot = pc1.map(_._2).zip(pc2.map(_._2)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-6, s"PC-2 not orthogonal to PC-1 (v1·v2=$dot)")
    val n2 = pc2.map(r => r._2 * r._2).sum
    assert(math.abs(n2 - 1.0) < 1e-9, "PC-2 loadings not unit-norm")
    // the fixture's top eigen-pair is near-DEGENERATE (λ2/λ1 ≈ 1.004
    // measured): finite-round iterates of a degenerate pair can invert
    // the order marginally, so the pin is a 2% band, not strict order
    // (the hapax fixture-shape lesson — λ2 ≈ λ1 IS the readout: the
    // cloud is at least 2-dimensional)
    val lam2 = pc2.head._3
    assert(lam2 > 0.0 && lam2 <= lam1 * 1.02,
      s"spectral band violated: λ2=$lam2 λ1=$lam1")
  }

  test("PC-1 whitening scores standardize against the reported eigenvalue (r15)") {
    val rows = SparkEntry.queries("q_llm_emb_whiten")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val lam = SparkEntry.queries("q_llm_emb_pca")(spark, sfDir)
      .collect().head.getDouble(2)
    // z is EXACTLY score/sqrt(eigenvalue) (same IEEE ops)
    rows.foreach { r =>
      assert(r._4 == r._2 / math.sqrt(lam), s"vec ${r._1}: z drifted")
      assert(r._3 >= 0.0, s"vec ${r._1}: negative residual norm")
    }
    // the score axis carries the eigenvalue's variance: Var(score) ≈ λ
    // (vᵀCv after 6 rounds; quantization + finite iteration ⇒ loose
    // band, but a wrong axis or scale would miss by decades)
    val n = rows.length
    val meanS = rows.map(_._2).sum / n
    val varS = rows.map(r => (r._2 - meanS) * (r._2 - meanS)).sum / n
    assert(math.abs(varS - lam) / lam < 0.2,
      s"score variance $varS far from eigenvalue $lam")
  }

  test("dedup-method agreement: exact dups are contained in both hash methods (r12)") {
    val rows = SparkEntry.queries("q_llm_dedup_agreement")(spark, sfDir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows.keySet == Set(
      ("exact", "minhash"), ("exact", "simhash"), ("minhash", "simhash")))
    // driver-side exact-dup count from sha groups (this fixture scale may
    // have none — only sf0.1 carries exact clones; the containment
    // equalities hold either way)
    val nExact = ops.table(spark, sfDir, "documents")
      .groupBy(org.apache.spark.sql.functions.sha2(
        org.apache.spark.sql.functions.col("text"), 256))
      .count().where("count > 1")
      .agg(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.sum("count"),
        org.apache.spark.sql.functions.lit(0L))).collect()
      .head.getLong(0)
    rows.foreach { case ((a, b), (na, nb, nboth)) =>
      assert(nboth <= math.min(na, nb), s"overlap bound for ($a, $b)")
    }
    // identical text ⇒ identical token set ⇒ identical MinHash sigs AND
    // identical SimHash ⇒ band collisions in every band: exact ⊆ both
    assert(rows(("exact", "minhash"))._1 == nExact)
    assert(rows(("exact", "minhash"))._3 == nExact,
      "every exact dup must be minhash-flagged")
    assert(rows(("exact", "simhash"))._3 == nExact,
      "every exact dup must be simhash-flagged")
    // the hash stages must flag SOMETHING on this near-dup-rich fixture
    assert(rows(("minhash", "simhash"))._1 > 0 &&
      rows(("minhash", "simhash"))._2 > 0)
  }

  test("bag-of-words digest is order-invariant and multiset-exact (r12)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // (doc_id, token, tf) for: base doc, a word-SHUFFLED twin, a
    // tf-changed doc, and a token-changed doc
    val toks = Seq(
      (1L, "alpha", 1L), (1L, "beta", 2L), (1L, "gamma", 1L),
      (2L, "gamma", 1L), (2L, "beta", 2L), (2L, "alpha", 1L), // reorder of 1
      (3L, "alpha", 2L), (3L, "beta", 1L), (3L, "gamma", 1L), // tf swapped
      (4L, "alpha", 1L), (4L, "beta", 2L), (4L, "delta", 1L)  // token changed
    ).toDF("doc_id", "token", "tf")
    val keys = graft.ops.LlmOps.bagKeys(toks.withColumn("lang", lit("en")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(keys(1L) == keys(2L), "word order must not change the bag key")
    assert(keys(1L) != keys(3L), "term frequencies are part of the multiset")
    assert(keys(1L) != keys(4L), "different vocabulary must split keys")
  }

  test("bow dedup per-source report satisfies the containment identities") {
    val rows = q("q_llm_bow_dedup").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val nDocs = ops.table(spark, sfDir, "documents").count()
    assert(rows.map(_._2).sum == nDocs, "every doc attributed to a source")
    rows.foreach { case (src, n, bag, ex, reo, cl, rate) =>
      // identical text ⇒ identical bag, so exact-dup ⊆ bag-dup and the
      // reorder-only slice is EXACTLY the difference
      assert(ex <= bag, s"$src: exact dups must be bag dups")
      assert(reo == bag - ex, s"$src: reorder_only identity")
      assert(cl <= bag, s"$src: a flagged cluster needs >= 1 flagged doc")
      assert(rate == bag.toDouble / n, s"$src: rate readback")
    }
  }

  test("product quantization: occupancy partitions the corpus, codes stay in range (r12)") {
    import graft.ops.AnnOps.{PqSub, PqK}
    val rows = q("q_llm_emb_pq").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nVec = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    // every vector gets exactly one code per subspace
    val bySub = rows.groupBy(_._1)
    assert(bySub.keySet == (0 until PqSub).map(_.toLong).toSet, "all subspaces present")
    bySub.foreach { case (j, rs) =>
      assert(rs.map(_._3).sum == nVec, s"subspace $j occupancy partitions the corpus")
      assert(rs.forall(r => r._2 >= 0 && r._2 < PqK), s"subspace $j code range")
      assert(rs.map(_._2).distinct.length == rs.length, s"subspace $j one row per code")
    }
    // joint-code stats are corpus-consistent and constant across rows
    val (nj, mc) = (rows.map(_._4).distinct, rows.map(_._5).distinct)
    assert(nj.length == 1 && mc.length == 1, "joint stats broadcast uniformly")
    assert(nj.head <= nVec && nj.head >= 1 && mc.head >= 1 &&
      nj.head <= math.pow(PqK, PqSub).toLong, "joint-code cardinality bounds")
    // pigeonhole: max_cell * n_joint_codes >= nVec
    assert(mc.head * nj.head >= nVec, "largest cell covers the pigeonhole bound")
    // the codebook memo makes the encode deterministic run-to-run
    val again = q("q_llm_emb_pq").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == again.toSeq, "re-run equality (memoized codebooks)")
  }

  test("dup-vs-lang chi2 equals a driver-side contingency replay (r12)") {
    val rows = q("q_llm_dup_lang_chi2").collect().map(r =>
      (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(rows.nonEmpty)
    val docs = docsDf.select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val famSize = docs.groupBy(_._2).map { case (t, xs) => (t, xs.length) }
    val byLang = docs.groupBy(_._1).map { case (l, ds) =>
      (l, (ds.length.toLong, ds.count(d => famSize(d._2) > 1).toLong))
    }
    val totN = byLang.values.map(_._1).sum
    val totDup = byLang.values.map(_._2).sum
    byLang.foreach { case (l, (n, nd)) =>
      val (gn, gnd, rate, eDup, chi) = {
        val r = rows(l); (r._1, r._2, r._3, r._4, r._5)
      }
      assert((gn, gnd) == ((n, nd)), s"$l contingency")
      assert(rate == nd.toDouble / n, s"$l rate")
      val e1 = (n * totDup).toDouble / totN
      val e0 = (n * (totN - totDup)).toDouble / totN
      assert(eDup == e1, s"$l expected dups")
      val d1 = nd.toDouble - e1
      val d2 = (n - nd).toDouble - e0
      val expect = if (e1 > 0 && e0 > 0) d1 * d1 / e1 + d2 * d2 / e0 else 0.0
      assert(chi == expect, s"$l staged chi2 contribution")
    }
    // driver-side TOTAL (the engine deliberately emits none — FP-order):
    // with 5 langs, df = 4, critical value at 5% is 9.488; the statistic
    // is data, not a pin — just require it finite and non-negative
    val total = rows.values.map(_._5).sum
    assert(total >= 0.0 && !total.isNaN && !total.isInfinite)
  }

  test("ADC search: shortlist-then-rerank equals an exact rerank of the shortlist (r12)") {
    val rows = q("q_llm_pq_adc").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.length == 10, "exactly ten reranked survivors")
    // rerank order is exact-cosine descending with the vec_id tie-break
    val ec = rows.sortBy(_._1).map(_._4).toSeq
    assert(ec == ec.sorted.reverse, "rerank is exact-cosine ordered")
    // recall@10 is the hit-count readback and is uniform across rows
    val recalls = rows.map(_._6).distinct
    assert(recalls.length == 1 &&
      recalls.head == rows.map(_._5).sum.toDouble / 10, "recall readback")
    // exact top-1 always survives a 100-deep shortlist ONLY if ADC kept
    // it — pin the measured fixture floor instead of a universal claim:
    // 0.7 at sf0.001 (random near-orthogonal vectors, 16-code codebooks —
    // the semdedup regime note; the floor quantifies the ADC trade)
    assert(recalls.head >= 0.5, s"recall@10 ${recalls.head} under the 0.5 floor")
    // every reranked survivor came from the ADC shortlist: its adc_cos is
    // a sum of 4 cosines, hence within [-4, 4]
    assert(rows.forall(r => r._3 >= -4.0 && r._3 <= 4.0), "ADC score range")
  }
}
