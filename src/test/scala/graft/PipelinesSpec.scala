package graft

import org.apache.spark.sql.functions._

/** The public library facade works on arbitrary conforming DataFrames and
  * agrees with the declared queries that run the same primitives. */
class PipelinesSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("exactDedup groups identical texts and keeps the lowest id") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma")
    ).toDF("doc_id", "text")
    val got = Pipelines.exactDedup(tiny).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("dupClusters handles empty and NULL-text inputs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Pipelines.dupClusters(spark, empty).isEmpty)

    // NULL-text docs stay singleton clusters (never dropped, never merged
    // with each other) — matching the oracle's text-equality edge semantics
    val mixed = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, null), (3L, null)).toDF("doc_id", "text")
    val got = Pipelines.dupClusters(spark, mixed).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("facade primitives agree with the declared queries on the fixture") {
    val viaFacade = Pipelines.dedupKeepBest(spark, docs).collect()
      .map(_.getLong(0)).toSet
    val viaQuery = SparkEntry.queries("q_llm_dedup_keep_best")(spark, sfDir)
      .collect().map(_.getLong(1)).toSet
    assert(viaFacade == viaQuery)

    val cands = Pipelines.minhashCandidates(docs).limit(5).collect()
    assert(cands.nonEmpty && cands.forall(r => r.getLong(0) < r.getLong(1)))

    val sims = Pipelines.simhash(docs, 16).collect().map(_.getLong(1))
    assert(sims.forall(s => s >= 0L && s < (1L << 16)))
  }

  test("r5 facade primitives agree with their declared queries") {
    val viaNorm = Pipelines.normalize(docs)
      .select("doc_id", "n_same_norm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val qNorm = SparkEntry.queries("q_text_normalize")(spark, sfDir)
      .select("doc_id", "n_same_norm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaNorm == qNorm)

    val viaNov = Pipelines.noveltyScore(docs)
      .select("doc_id", "novelty_rate").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val qNov = SparkEntry.queries("q_llm_doc_lm_score")(spark, sfDir)
      .select("doc_id", "novelty_rate").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(viaNov == qNov)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val viaCls = Pipelines.classify(spark, emb)
      .select("vec_id", "pred_label").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val qCls = SparkEntry.queries("q_llm_emb_classify")(spark, sfDir)
      .select("vec_id", "pred_label").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaCls == qCls)

    // centroid relation is one row per label, arrays of equal length
    val cents = Pipelines.classCentroids(emb).collect()
    assert(cents.length == emb.select("label").distinct().count())
    assert(cents.map(_.getSeq[Double](1).length).distinct.length == 1)
  }

  test("r6 facade primitives agree with their declared queries") {
    val viaSplit = Pipelines.splitAssign(docs)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val qSplit = SparkEntry.queries("q_llm_split_assign")(spark, sfDir)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(viaSplit == qSplit)

    val viaMix = Pipelines.domainMix(docs)
      .select("source", "share").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    val qMix = SparkEntry.queries("q_llm_domain_mix")(spark, sfDir)
      .select("source", "share").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(viaMix == qMix)

    val viaPack = Pipelines.packChunks(docs)
      .select("doc_id", "start_off").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val qPack = SparkEntry.queries("q_llm_pack_chunks")(spark, sfDir)
      .select("doc_id", "start_off").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaPack == qPack)

    // a non-default chunk size changes spans but preserves contiguity
    val packed256 = Pipelines.packChunks(docs, 256L)
      .orderBy("doc_id").collect()
    var off = 0L
    packed256.foreach { r =>
      assert(r.getLong(2) == off); off += r.getLong(1)
      assert(r.getLong(3) == r.getLong(2) / 256)
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val viaQ = Pipelines.quantizeEmbeddings(emb)
      .select("vec_id", "q_sum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val qQ = SparkEntry.queries("q_llm_emb_quantize")(spark, sfDir)
      .select("vec_id", "q_sum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaQ == qQ)

    val viaBp = Pipelines.boilerplate(spark, docs)
      .select("doc_id", "n_boiler").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val qBp = SparkEntry.queries("q_text_boilerplate")(spark, sfDir)
      .select("doc_id", "n_boiler").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaBp == qBp)

    val ev = graft.ops.table(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val viaW = Pipelines.winsorize(ev)
      .select("event_id", "value_w").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val qW = SparkEntry.queries("q_win_winsorize")(spark, sfDir)
      .select("event_id", "value_w").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(viaW == qW)
  }

  test("knn returns the same neighbors as the declared brute-force query") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val probe = emb.where(col("vec_id") === 0)
      .select(transform(col("embedding"), _.cast("double")))
      .head().getSeq[Double](0)
    val got = Pipelines.knn(spark, emb.where(col("vec_id") =!= 0), probe, 10)
      .collect().map(_.getLong(0)).toSeq
    val want = SparkEntry.queries("q_llm_sim_knn")(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("scrub, chunkOverlap and stratifiedSample work on arbitrary frames") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "the customer saw a vector of keys", "s1"),
      (2L, "no sensitive words here at all today", "s1"),
      (3L, "customer customer vector", "s2")
    ).toDF("doc_id", "text", "source")

    val sc = Pipelines.scrub(tiny).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "keys" does not match \bkey\b; "customer customer vector" matches 3
    assert(sc == Map(1L -> 2L, 2L -> 0L, 3L -> 3L))

    val ch = Pipelines.chunkOverlap(tiny, win = 4L, stride = 3L).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 1: 7 tokens -> chunks at 0 (len 4), 3 (len 4), 6 (len 1)
    assert(ch.filter(_._1 == 1L).toSet ==
      Set((1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 1L)))

    val st = Pipelines.stratifiedSample(tiny, k = 1).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(st.keySet == Set("s1", "s2") && st("s2") == 3L)
  }

  test("datasetDiff classifies all four statuses") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = Pipelines.datasetDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("r8 facade primitives agree with their declared queries") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bd = Pipelines.blockDedup(spark, docs).orderBy("doc_id").collect()
    val bdQ = SparkEntry.queries("q_llm_block_dedup")(spark, sfDir).collect()
    assert(bd.map(_.toSeq).toSeq == bdQ.map(_.toSeq).toSeq)

    val pa = Pipelines.piiAudit(docs).orderBy("source").collect()
    val paQ = SparkEntry.queries("q_text_pii_audit")(spark, sfDir).collect()
    assert(pa.map(_.toSeq).toSeq == paQ.map(_.toSeq).toSeq)

    val at = Pipelines.attribution(ops.table(spark, sfDir, "events"))
      .orderBy("channel").collect()
    val atQ = SparkEntry.queries("q_analytics_attribution")(spark, sfDir).collect()
    assert(at.map(_.toSeq).toSeq == atQ.map(_.toSeq).toSeq)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val sd = Pipelines.semdedup(spark, emb).orderBy("vec_id").collect()
    val sdQ = SparkEntry.queries("q_llm_emb_semdedup")(spark, sfDir).collect()
    assert(sd.map(_.toSeq).toSeq == sdQ.map(_.toSeq).toSeq)
  }

  test("r12 facade primitives agree with their declared queries") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sd = Pipelines.spanDedup(spark, docs).orderBy("doc_id").collect()
    val sdQ = SparkEntry.queries("q_llm_span_dedup")(spark, sfDir).collect()
    assert(sd.map(_.toSeq).toSeq == sdQ.map(_.toSeq).toSeq)
  }

  test("r9 facade primitives agree with their declared queries") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bt = Pipelines.bpeTrain(spark, docs).orderBy("merge_rank").collect()
    val btQ = SparkEntry.queries("q_llm_bpe_train")(spark, sfDir).collect()
    assert(bt.map(_.toSeq).toSeq == btQ.map(_.toSeq).toSeq)

    val be = Pipelines.bpeEncode(spark, docs).orderBy("doc_id").collect()
    val beQ = SparkEntry.queries("q_llm_bpe_encode")(spark, sfDir).collect()
    assert(be.map(_.toSeq).toSeq == beQ.map(_.toSeq).toSeq)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val mp = Pipelines.semdedupMultiProbe(spark, emb).orderBy("vec_id").collect()
    val mpQ = SparkEntry.queries("q_llm_emb_semdedup_mp")(spark, sfDir).collect()
    assert(mp.map(_.toSeq).toSeq == mpQ.map(_.toSeq).toSeq)
  }

  test("r9-continuation facade primitives agree with their declared queries") {
    val events = ops.table(spark, sfDir, "events")
    val sp = Pipelines.seasonalProfile(events).collect()
    val spQ = SparkEntry.queries("q_ts_seasonal")(spark, sfDir).collect()
    assert(sp.map(_.toSeq).toSeq == spQ.map(_.toSeq).toSeq)

    val ew = Pipelines.ewmaSmooth(events).collect()
    val ewQ = SparkEntry.queries("q_ts_ewma")(spark, sfDir).collect()
    assert(ew.map(_.toSeq).toSeq == ewQ.map(_.toSeq).toSeq)

    val br = Pipelines.basketRules(ops.table(spark, sfDir, "lineitem")).collect()
    val brQ = SparkEntry.queries("q_analytics_basket")(spark, sfDir).collect()
    assert(br.map(_.toSeq).toSeq == brQ.map(_.toSeq).toSeq)

    val docs = ops.table(spark, sfDir, "documents")
    val bm = Pipelines.bm25(docs)
      .orderBy(desc("bm25"), asc("doc_id")).limit(20).collect()
    val bmQ = SparkEntry.queries("q_text_bm25")(spark, sfDir).collect()
    assert(bm.map(_.toSeq).toSeq == bmQ.map(_.toSeq).toSeq)

    // rrfFuse on two hand-built bounded lists: a doc on both lists with
    // middling ranks outscores single-list rank-1 docs (the RRF point)
    import spark.implicits._
    val a = Seq((1L, 1L), (3L, 2L)).toDF("doc_id", "ra")
    val b = Seq((2L, 1L), (3L, 3L)).toDF("doc_id", "rb")
    val fused = Pipelines.rrfFuse(a, b, topK = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(fused.head._1 == 3L, "both-list doc must lead")
    assert(math.abs(fused.head._2 - (1.0 / 62 + 1.0 / 63)) < 1e-15)
  }

  test("hourlyGrid/adf/hurstProfile equal the declared grid-analytics queries (r13)") {
    import org.apache.spark.sql.functions._
    val ev = graft.ops.table(spark, sfDir, "events")
      .select(col("event_type"), col("ts"), col("value"))
    val viaGrid = Pipelines.hourlyGrid(ev).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val direct = graft.ops.DiagOps.hourlyCentGrid(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(viaGrid == direct, "facade grid differs from the fixture grid")
    val viaAdf = Pipelines.adf(Pipelines.hourlyGrid(ev)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    val qAdf = SparkEntry.queries("q_ts_adf")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(viaAdf == qAdf)
    val viaH = Pipelines.hurstProfile(Pipelines.hourlyGrid(ev)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val qH = SparkEntry.queries("q_ts_hurst")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(viaH == qH)
  }
}
