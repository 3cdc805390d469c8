package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property tests for the training-data curation family (CurationOps).
  * `q_llm_dup_clusters` and `q_llm_simhash_neardup` are additionally pinned
  * here against independent driver-side reimplementations (union-find /
  * all-pairs hamming) on the sf0.001 fixtures; the other three queries are
  * DuckDB-oracled, so tests here cover invariants the hash gate can't.
  */
class CurationSpec extends SparkTestBase {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

  private lazy val docTexts: Array[(Long, String)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)

  test("bpe training matches a driver-side symbol-level BPE replay") {
    // independent reimplementation: token counts, then 3 iterations of
    // (count adjacent symbol pairs weighted by n, merge the argmax with
    // the (count DESC, p1, p2) tie-break left-to-right non-overlapping)
    // — pure Scala lists, no string-replace encoding shared with the query
    val tc = collection.mutable.Map.empty[String, Long]
    docTexts.foreach { case (_, text) =>
      text.split(' ').filter(_.nonEmpty).foreach(t => tc(t) = tc.getOrElse(t, 0L) + 1L)
    }
    // CODE-POINT symbols + UTF-8 binary tie-break, matching both engines
    // (String.split("")/String ordering are UTF-16 — they diverge on
    // astral/private-use chars even though the current fixture is ASCII)
    def cps(t: String): Vector[String] =
      t.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
    implicit val utf8Order: Ordering[String] = (a: String, b: String) =>
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var syms: Map[Vector[String], Long] =
      tc.toMap.map { case (t, n) => cps(t) -> n }
    def mergeOnce(): Option[(String, String, Long)] = {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (ss, n) =>
        ss.indices.dropRight(1).foreach { i =>
          val k = (ss(i), ss(i + 1)); counts(k) = counts.getOrElse(k, 0L) + n
        }
      }
      if (counts.isEmpty) return None // engine skips an empty iteration
      val ((p1, p2), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      syms = syms.toSeq.map { case (ss, n) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < ss.length) {
          if (i + 1 < ss.length && ss(i) == p1 && ss(i + 1) == p2) {
            out += p1 + p2; i += 2 // left-to-right non-overlapping
          } else { out += ss(i); i += 1 }
        }
        out.result() -> n
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      Some((p1, p2, c))
    }
    val expected = (1 to 3).flatMap { k =>
      mergeOnce().map { case (p1, p2, c) => (k.toLong, p1, p2, c) }
    }
    val got = q("q_llm_bpe_train").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected)
    // merge counts are monotone non-increasing: any pair created by a
    // merge occurs at most as often as some pre-merge pair did
    assert(got.map(_._4) == got.map(_._4).sortBy(-_))

    // the ENCODE side: per-token post-merge symbol counts from the same
    // replay (replay tracks merged symbol vectors per ORIGINAL token via
    // a fresh single-token application), rolled up per doc
    val mergeList = expected.map { case (_, p1, p2, _) => (p1, p2) }
    def encodeTok(t: String): Int = {
      var ss = cps(t)
      mergeList.foreach { case (p1, p2) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < ss.length) {
          if (i + 1 < ss.length && ss(i) == p1 && ss(i + 1) == p2) {
            out += p1 + p2; i += 2
          } else { out += ss(i); i += 1 }
        }
        ss = out.result()
      }
      ss.length
    }
    val encExpected = docTexts.map { case (id, text) =>
      val ts = text.split(' ').filter(_.nonEmpty)
      // code-point length = the engines' character length()
      val chars = ts.map(t => t.codePointCount(0, t.length).toLong).sum
      val nsyms = ts.map(t => encodeTok(t).toLong).sum
      (id, ts.length.toLong, chars, nsyms, chars.toDouble / nsyms)
    }.filter(_._2 > 0).toSeq
    val encGot = q("q_llm_bpe_encode").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(encGot == encExpected)
    // merges only ever shrink the symbol stream
    assert(encGot.forall(r => r._4 <= r._3))
  }

  test("dup clusters match a driver-side union-find over the same edge rule") {
    // independent reimplementation: 5-word shingles, <=50-doc stop filter,
    // union-find — no Spark code shared with the query
    val shingleDocs = collection.mutable.Map.empty[String, List[Long]]
    docTexts.foreach { case (id, text) =>
      val toks = text.split(' ').filter(_.nonEmpty)
      toks.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
        .foreach((sh: String) => shingleDocs(sh) = id :: shingleDocs.getOrElse(sh, Nil))
    }
    val parent = collection.mutable.Map(docTexts.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    shingleDocs.values.filter(_.size <= 50).foreach { ds =>
      ds.tail.foreach { d =>
        val (ra, rb) = (find(ds.head), find(d))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    // identical text is an edge in its own right (exact dups always cluster)
    docTexts.groupBy(_._2).values.filter(_.length > 1).foreach { g =>
      g.tail.foreach { case (d, _) =>
        val (ra, rb) = (find(g.head._1), find(d))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val expected = docTexts.map { case (id, _) => id -> find(id) }.toMap
    val sizes = expected.values.groupBy(identity).map { case (k, v) => k -> v.size }

    val got = q("q_llm_dup_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == docTexts.length)
    got.foreach { case (id, cl, sz) =>
      assert(cl == expected(id), s"doc $id: cluster $cl, expected ${expected(id)}")
      assert(sz == sizes(expected(id)).toLong, s"doc $id: size $sz")
    }
    val nClusters = expected.values.toSet.size
    info(s"docs=${got.length} clusters=$nClusters largest=${sizes.values.max}")
    assert(nClusters < docTexts.length, "fixture sanity: some docs cluster together")
  }

  test("simhash near-dup pairs: sound, hamming-exact, and complete under the bucket cap") {
    val sigs = graft.ops.LlmOps
      .simhashSigs(spark.read.parquet(s"$sfDir/documents.parquet"), 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val sigOf = sigs.toMap
    def hamming(a: Long, b: Long): Long =
      java.lang.Long.bitCount(sigOf(a) ^ sigOf(b)).toLong

    // driver-side replication of the full operator: 4 x 16-bit band
    // blocking, first-50-by-doc_id cap per (band, value) bucket, pairs from
    // capped buckets, hamming filter — independent code path, same rule
    val expected = (for {
      band <- (0 until 4).iterator
      (_, members) <- sigs.groupBy { case (_, sh) => (sh >>> (16 * band)) & 0xFFFFL }.iterator
      capped = members.map(_._1).sorted.take(50)
      i <- capped.indices.iterator
      j <- (i + 1) until capped.length
      h = hamming(capped(i), capped(j))
      if h <= 3
    } yield ((capped(i), capped(j)), h)).toMap
    assert(expected.nonEmpty, "fixture sanity: near-identical fingerprints exist")

    val got = q("q_llm_simhash_neardup").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // soundness: every reported pair is genuinely hamming-close, value exact
    got.foreach { case ((a, b), h) =>
      assert(h == hamming(a, b) && h <= 3, s"pair ($a,$b): hamming $h")
    }
    // completeness w.r.t. the capped band rule
    assert(got.keySet == expected.keySet,
      s"missing=${(expected.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- expected.keySet).take(5)}")
    // the cap trades recall on this duplicate-heavy fixture — quantify it
    val uncapped = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      if java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) <= 3
    } yield 1).sum
    info(s"pairs reported=${got.size}, uncapped hamming<=3 pairs=$uncapped")
  }

  test("dedup keep-best picks the highest-quality member of each cluster") {
    val clusters = q("q_llm_dup_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val quality = SparkEntry.queries("q_text_quality")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(4))).toMap
    val expected = clusters.groupBy(_._2).map { case (cl, ms) =>
      val members = ms.map(_._1)
      val best = members.minBy(id => (-quality(id), id))
      (cl, (best, members.length.toLong, members.map(quality).max))
    }
    val got = q("q_llm_dedup_keep_best").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (cl, (keep, n, bq)) =>
      val (gKeep, gN, gBq) = got(cl)
      assert(gKeep == keep && gN == n, s"cluster $cl: got ${got(cl)}, want ($keep,$n)")
      assert(math.abs(gBq - bq) < 1e-12)
    }
  }

  test("corpus-curate pipeline = keep-best ∘ quality gate ∘ sample, per lang") {
    val rates = Map("en" -> 50, "fr" -> 30, "es" -> 20, "zh" -> 10).withDefaultValue(5)
    val keepIds = q("q_llm_dedup_keep_best").collect().map(_.getLong(1)).toSet
    val quality = SparkEntry.queries("q_text_quality")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(4))).toMap
    val meta = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val kept = meta.filter { case (id, l, _) =>
      keepIds(id) && quality(id) >= 0.25 && id % 100 < rates(l)
    }
    val expected = kept.groupBy(_._2).map { case (l, ds) =>
      // split(text, " ", -1): Spark's size(split(...)) keeps empty tokens
      l -> (ds.length.toLong, ds.map(_._3.split(" ", -1).length.toLong).sum)
    }
    val got = q("q_llm_corpus_curate").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (l, e) => assert(got(l) == e, s"lang $l: ${got(l)} vs $e") }
    assert(kept.nonEmpty && kept.length < meta.length)
  }

  test("tfidf ranks rarer tokens above common ones within a doc") {
    val rows = q("q_text_tfidf").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val n = docTexts.length.toLong
    rows.foreach { case (_, _, tf, df, tfidf) =>
      assert(math.abs(tfidf - tf.toDouble * (n + 1) / (df + 1)) < 1e-12)
      assert(df >= 1 && df <= n && tf >= 1)
    }
    assert(rows.groupBy(_._1).forall(_._2.length <= 3), "top-3 per doc")
  }

  test("vocabulary counts are consistent (tf >= df, df <= corpus size)") {
    val rows = q("q_text_vocab").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val vocabSize = docTexts.flatMap(_._2.split(' ').filter(_.nonEmpty)).distinct.length
    assert(rows.length == math.min(100, vocabSize))
    rows.foreach { case (_, tf, df) =>
      assert(tf >= df && df >= 1 && df <= docTexts.length.toLong)
    }
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq, "ordered by tf desc")
  }

  test("bigram LM stats: counts match a driver-side recount, p is the exact rational") {
    val c12 = collection.mutable.Map.empty[(String, String), Long]
    val c1 = collection.mutable.Map.empty[String, Long]
    docTexts.foreach { case (_, text) =>
      val toks = text.split(' ').filter(_.nonEmpty)
      toks.sliding(2).filter(_.length == 2).foreach { w =>
        c12((w(0), w(1))) = c12.getOrElse((w(0), w(1)), 0L) + 1
        c1(w(0)) = c1.getOrElse(w(0), 0L) + 1
      }
    }
    val got = q("q_llm_ngram_lm").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.length == math.min(100, c12.size))
    got.foreach { case (w1, w2, n12, n1, p) =>
      assert(n12 == c12((w1, w2)), s"c12($w1,$w2)")
      assert(n1 == c1(w1), s"c1($w1)")
      assert(p == n12.toDouble / n1, s"p($w1,$w2)")
    }
    // descending by pair count, and nothing outside the result beats the cut
    assert(got.map(_._3).toSeq == got.map(_._3).sortBy(-_).toSeq)
    val cut = got.last._3
    val returned = got.map(g => (g._1, g._2)).toSet
    assert(c12.forall { case (k, n) => returned(k) || n <= cut })
  }

  test("doc LM novelty score matches a driver-side recount of singleton bigrams") {
    val corpus = collection.mutable.Map.empty[(String, String), Long]
    val perDoc = collection.mutable.Map.empty[Long, Seq[(String, String)]]
    docTexts.foreach { case (id, text) =>
      val bgs = text.split(' ').filter(_.nonEmpty)
        .sliding(2).filter(_.length == 2).map(w => (w(0), w(1))).toSeq
      if (bgs.nonEmpty) perDoc(id) = bgs
      bgs.foreach(b => corpus(b) = corpus.getOrElse(b, 0L) + 1)
    }
    val got = q("q_llm_doc_lm_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.length == perDoc.size)
    got.foreach { case (id, n, k, singles, rate) =>
      val bgs = perDoc(id)
      assert(n == bgs.length.toLong, s"doc $id n_bigrams")
      assert(k == bgs.distinct.length.toLong, s"doc $id n_distinct")
      assert(singles == bgs.count(corpus(_) == 1L).toLong, s"doc $id n_singleton")
      assert(rate == singles.toDouble / n, s"doc $id novelty_rate")
    }
  }

  test("split leakage matches a driver-side naive recomputation") {
    // independent ground truth: shingles, df cap, salt-6 buckets and the
    // test×train intersection all recomputed from raw text in plain Scala
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val shingleSets: Map[Long, Set[String]] = docs.map { case (id, text) =>
      id -> text.split(' ').filter(_.nonEmpty)
        .sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    }.toMap
    val df = shingleSets.values.flatten
      .groupBy(identity).map { case (sh, xs) => sh -> xs.size }
    val kept = shingleSets.map { case (id, ss) =>
      id -> ss.filter(df(_) <= 50)
    }
    val P = graft.functions.ReplayableHash.P
    val (a, b) = graft.functions.ReplayableHash.params(1, salt = 6).head
    def bucket(id: Long): Long = ((a * (id % P) + b) % P) % 100
    val testIds = kept.keySet.filter(bucket(_) >= 95)
    val trainIds = kept.keySet.filter(bucket(_) < 90)
    val expected = testIds.toSeq.flatMap { t =>
      val hits = trainIds.toSeq
        .flatMap(tr => kept(t).intersect(kept(tr)).toSeq.map((_, tr)))
      if (hits.isEmpty) None
      else Some((t, hits.size.toLong,
        hits.map(_._1).distinct.size.toLong, hits.map(_._2).min))
    }.sortBy(_._1)
    val got = q("q_llm_split_leakage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.nonEmpty, "fixture produced no leakage rows — weak fixture")
    assert(got == expected)
  }

  test("stratified sample keeps exactly the mod-rule rows") {
    val rates = Map("en" -> 50, "fr" -> 30, "es" -> 20, "zh" -> 10).withDefaultValue(5)
    val langs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = langs.collect { case (id, l) if id % 100 < rates(l) => id }.toSet
    val got = q("q_llm_curation_sample").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < langs.length)
  }

  // ---- q_llm_cdc_chunks (r9): content-defined chunking -------------------

  private def cdc(t: String): Array[(Long, Int)] =
    graft.functions.ContentChunkers.cdcChunks(
      org.apache.spark.unsafe.types.UTF8String.fromString(t),
      graft.ops.CurationOps.CdcK, graft.ops.CurationOps.CdcMod)

  private def cdcB(t: String): Array[Int] =
    graft.functions.ContentChunkers.cdcBoundaries(
      t.codePoints().toArray, graft.ops.CurationOps.CdcK,
      graft.ops.CurationOps.CdcMod)

  test("cdc chunks partition the text and digest each span exactly") {
    val rnd = new scala.util.Random(21)
    val samples = Seq("", "a", "abcdefg", "abcdefgh") ++
      (1 to 15).map(_ => rnd.alphanumeric.take(20 + rnd.nextInt(400)).mkString)
    for (t <- samples) {
      val b = cdcB(t)
      assert(b.head == 0)
      if (t.nonEmpty) assert(b.last == t.length)
      assert(b.sameElements(b.distinct.sorted), "boundaries not increasing")
      val chunks = cdc(t)
      assert(chunks.length == b.length - 1 || (t.isEmpty && chunks.isEmpty))
      assert(chunks.map(_._2).sum == t.length, "chunks do not partition")
      chunks.zipWithIndex.foreach { case ((h, len), j) =>
        val span = t.substring(b(j), b(j + 1))
        assert(len == span.length)
        assert(h == graft.functions.TextHashes.shingleKey(
          org.apache.spark.unsafe.types.UTF8String.fromString(span)),
          s"chunk digest is not the span's pairing digest")
      }
    }
  }

  test("cdc edit locality: a same-length substitution only redraws chunks near the edit") {
    val rnd = new scala.util.Random(22)
    val k = graft.ops.CurationOps.CdcK
    for (_ <- 1 to 10) {
      val t1 = rnd.alphanumeric.take(400).mkString
      val e = 150 + rnd.nextInt(100)
      val t2 = t1.substring(0, e) + (if (t1(e) == 'Q') 'R' else 'Q') +
        t1.substring(e + 1)
      // every k-gram starting at ≥ e+1 is untouched, so every cut offset
      // > e+k is present in both boundary sets; chunks from the first such
      // shared cut onward are identical
      val b1 = cdcB(t1).filter(_ > e + k)
      val b2 = cdcB(t2).filter(_ > e + k)
      assert(b1.sameElements(b2), "far boundaries moved under a local edit")
      val c1 = cdc(t1); val c2 = cdc(t2)
      val tail1 = c1.takeRight(b1.length - 1)
      val tail2 = c2.takeRight(b2.length - 1)
      assert(tail1.sameElements(tail2), "far chunks redrawn under a local edit")
      assert(c1.map(_._1).toSet != c2.map(_._1).toSet,
        "edit did not change any chunk digest (vacuous)")
    }
  }

  test("q_llm_cdc_chunks per-source report matches a driver-side replay") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val chunks = rows.flatMap(r => cdc(r._2))
      val n = chunks.length.toLong
      val nd = chunks.map(_._1).distinct.length.toLong
      (src, (rows.length.toLong, n, nd,
        chunks.map(_._2.toLong).sum.toDouble / n,
        (n - nd).toDouble / n))
    }
    val got = q("q_llm_cdc_chunks").collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, e) =>
      assert(got(src) == e, s"source $src: got ${got(src)}, expected $e")
    }
    // fixture sanity: sub-document redundancy must exist (dup families)
    assert(expected.values.exists(_._5 > 0), "no duplicate chunks at all")
  }

  test("tok_fertility reconciles with the per-doc encode and orders sanely") {
    val perDoc = q("q_llm_bpe_encode").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val langOf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    // summing q_llm_bpe_encode's per-doc counts by lang must reproduce the
    // fertility report exactly (same vocab, same token explode)
    val expected = perDoc.groupBy(d => langOf(d._1)).map { case (lang, ds) =>
      val (nt, nc, ns) = (ds.map(_._2).sum, ds.map(_._3).sum, ds.map(_._4).sum)
      (lang, nt, ns, nc, ns.toDouble / nt, nc.toDouble / ns)
    }.toSeq.sortBy(_._1)
    val got = q("q_llm_tok_fertility").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected, "fertility report does not reconcile with encode")
    // fertility ≥ 1 (a token is at least one symbol) and compression ≥ 1
    got.foreach { r =>
      assert(r._5 >= 1.0, s"${r._1}: fertility ${r._5} < 1")
      assert(r._6 >= 1.0, s"${r._1}: chars/sym ${r._6} < 1")
    }
  }

  test("curriculum is the exact (ppm, doc_id) permutation, two-level numbering included") {
    val rows = q("q_llm_curriculum").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // train_order is a permutation 1..n
    assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    // and enumerates exactly the (ppm, doc_id) total order
    val byOrder = rows.sortBy(_._3).map(t => (t._2, t._1)).toSeq
    assert(byOrder == byOrder.sorted,
      "train_order does not follow the (ppm ASC, doc_id) total order")
    // scope = docs with a bigram distribution (same row set as doc_lm_score)
    assert(rows.length == q("q_llm_doc_lm_score").count())
  }

  test("shard_pack equals a driver snake replay and balances within one max doc") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ranked = docs.sortBy { case (id, nc) => (-nc, id) }.zipWithIndex
    val expected = ranked.map { case ((_, nc), rk) =>
      val pos = rk % 8
      val shard = if ((rk / 8) % 2 == 0) pos else 7 - pos
      (shard.toLong, nc)
    }.groupBy(_._1).map { case (s, xs) =>
      (s, (xs.length.toLong, xs.map(_._2).sum, xs.map(_._2).max, xs.map(_._2).min))
    }
    val got = q("q_llm_shard_pack").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == expected, "shard report differs from the snake replay")
    // the balance the snake draft exists for: spread ≤ one largest doc
    val sums = got.values.map(_._2)
    val maxDoc = docs.map(_._2).max
    assert(sums.max - sums.min <= maxDoc,
      s"shard spread ${sums.max - sums.min} exceeds the largest doc $maxDoc")
  }

  test("quality_buckets equal a driver-side tertile replay") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    // corpus bigram counts, then per-doc singleton-rate ppm
    val bgOf: ((Long, String, Long, String)) => Seq[String] = { case (_, _, _, t) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      if (toks.length < 2) Seq.empty
      else toks.sliding(2).map(w => w(0) + " " + w(1)).toSeq
    }
    val c12 = docs.flatMap(bgOf).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val scored = docs.flatMap { d =>
      val bgs = bgOf(d)
      if (bgs.isEmpty) None
      else {
        val singles = bgs.count(b => c12(b) == 1L).toLong
        Some((d._2, d._3, singles * 1000000L / bgs.length))
      }
    }
    val expected = scored.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      val ppms = rows.map(_._3).sorted
      val n = ppms.length
      val c1 = ppms((n + 2) / 3 - 1)
      val c2 = ppms((2 * n + 2) / 3 - 1)
      rows.groupBy { case (_, _, p) =>
        if (p <= c1) "head" else if (p <= c2) "middle" else "tail"
      }.map { case (bucket, bs) =>
        (lang, bucket, bs.length.toLong, bs.map(_._2).sum,
          bs.map(_._3).min, bs.map(_._3).max)
      }
    }.sortBy(t => (t._1, t._2))
    val got = q("q_llm_quality_buckets").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, "bucket rows differ from the driver tertile replay")
    // bucket boundaries are consistent: head ⩽ middle ⩽ tail by ppm range
    got.groupBy(_._1).foreach { case (lang, rows) =>
      val m = rows.map(r => r._2 -> (r._5, r._6)).toMap
      for (h <- m.get("head"); mid <- m.get("middle"))
        assert(h._2 <= mid._1, s"$lang: head max above middle min")
      for (mid <- m.get("middle"); t <- m.get("tail"))
        assert(mid._2 <= t._1, s"$lang: middle max above tail min")
    }
  }

  test("collocations equal a driver-side integer-lift replay on raw strings") {
    // replay groups by the bigram STRING, so digest collisions would
    // surface here as a mismatch (the engine counts by 60-bit digest)
    val bgs = docTexts.flatMap { case (_, t) =>
      val toks = t.split(' ').filter(_.nonEmpty)
      if (toks.length < 2) Seq.empty
      else toks.sliding(2).map(w => (w(0), w(1))).toSeq
    }
    val n = BigInt(bgs.length)
    def key(s: String): Long = graft.functions.TextHashes.shingleKey(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    val c12 = bgs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = bgs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val c2 = bgs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected = c12.toSeq.filter(_._2 >= 5L).map { case ((w1, w2), c) =>
      val lift = (BigInt(c) * n * 1000000 / (BigInt(c1(w1)) * c2(w2))).toLong
      (w1 + " " + w2, key(w1 + " " + w2), c, c1(w1), c2(w2), lift)
    }.sortBy { case (_, kb, _, _, _, l) => (-l, kb) }.take(100)
    val got = q("q_llm_collocations").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, "top collocations differ from the string replay")
    assert(got.nonEmpty, "fixture should surface supported collocations")
  }

  test("pareto_prune equals brute-force 2-D dominance, and nothing on the frontier is dominated") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val bgOf: String => Seq[String] = { t =>
      val toks = t.split(" ").filter(_.nonEmpty)
      if (toks.length < 2) Seq.empty
      else toks.sliding(2).map(w => w(0) + " " + w(1)).toSeq
    }
    val c12 = docs.flatMap(d => bgOf(d._4)).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val scored = docs.flatMap { case (id, lang, len, t) =>
      val bgs = bgOf(t)
      if (bgs.isEmpty) None
      else Some((id, lang, bgs.count(b => c12(b) == 1L).toLong * 1000000L
        / bgs.length, len))
    }
    // O(n²) dominance at fixture scale: (ppm ≤, len ≥, one strict)
    val expected = scored.filter { case (i, _, pi, li) =>
      !scored.exists { case (j, _, pj, lj) =>
        j != i && pj <= pi && lj >= li && (pj < pi || lj > li)
      }
    }.sortBy(t => (t._3, t._1)).toSeq
    val got = q("q_llm_pareto_prune").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, "frontier differs from brute-force dominance")
    assert(got.nonEmpty && got.size < scored.size,
      "frontier should be a strict non-empty subset on the fixture")
    // frontier is a staircase: strictly increasing ppm ⇒ strictly decreasing
    // max-length, and ties in ppm share one length (the per-ppm gmax)
    got.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._4).distinct.size == 1) }
  }

  test("importance_weights equals a driver-side quantized-DSIR replay") {
    // independent replay on bigram STRINGS (no digest): equality also pins
    // that the 60-bit shingle_key join introduced no collisions here
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bigrams(t: String): Seq[String] = {
      val toks = t.split(" ").filter(_.nonEmpty)
      if (toks.length < 2) Seq.empty
      else toks.sliding(2).map(w => w(0) + " " + w(1)).toSeq
    }
    val all = docs.flatMap { case (id, src, t) =>
      bigrams(t).map(b => (id, src, b)) }
    val cAll = all.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val cTgt = all.filter(_._2 == "src0").groupBy(_._3).view
      .mapValues(_.length.toLong).toMap
    def ilog2(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)
    val perDoc = all.groupBy(_._1).view.mapValues { occ =>
      (occ.length.toLong, occ.map { case (_, _, b) =>
        ilog2(cTgt.getOrElse(b, 0L) + 1) - ilog2(cAll(b) + 1) }.sum)
    }.toMap
    val expected = docs.map { case (id, src, _) =>
      val (n, s) = perDoc.getOrElse(id, (0L, 0L))
      (id, src, n, s)
    }.sortBy(_._1).toSeq
    val got = q("q_llm_importance_weights").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the signal the weights exist for: target-domain docs must score
    // higher on average than the rest (their bigrams are what c_tgt counts)
    val tgt = got.filter(_._2 == "src0").map(_._4.toDouble)
    val rest = got.filterNot(_._2 == "src0").map(_._4.toDouble)
    assert(tgt.sum / tgt.length > rest.sum / rest.length,
      "src0 docs do not score above the rest on average")
  }

  test("dataset card equals a driver-side corpus summary replay") {
    val r = q("q_llm_dataset_card").collect().head
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text", "lang", "source", "n_chars").collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2), x.getLong(3)))
    val nDocs = docs.length.toLong
    val nTokens = docs.map(_._1.split(' ').count(_.nonEmpty).toLong).sum
    val groups = docs.groupBy(_._1)
    val nDistinct = groups.size.toLong
    val inDup = groups.valuesIterator.map(_.length.toLong).filter(_ > 1).sum
    assert(r.getLong(0) == nDocs)
    assert(r.getLong(1) == docs.map(_._2).distinct.length.toLong)
    assert(r.getLong(2) == docs.map(_._3).distinct.length.toLong)
    assert(r.getLong(3) == nTokens)
    assert(r.getLong(4) == nDistinct && r.getLong(5) == nDocs - nDistinct)
    assert(r.getDouble(6) == inDup.toDouble / nDocs)
    assert(r.getDouble(7) == nTokens.toDouble / nDocs)
    assert(r.getDouble(8) == docs.map(_._4).sum.toDouble / nDocs)
    // internal consistency: duplicate mass covers at least the dup docs
    assert(r.getDouble(6) * nDocs >= r.getLong(5))
  }

  test("rank fusion equals a driver-side RRF over the two engine lists") {
    val bm = graft.ops.TextOps.bm25Doc(graft.ops.table(spark, sfDir, "documents"))
      .select("doc_id", "bm25").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val ra = bm.sortBy { case (id, s) => (-s, id) }.take(100)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val ppm = graft.ops.CurationOps.qbScoreFor(
        graft.ops.table(spark, sfDir, "documents"), None)
      .select("doc_id", "ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rb = ppm.sortBy { case (id, p) => (p, id) }.take(100)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val expected = (ra.keySet ++ rb.keySet).toSeq.map { id =>
      val a = ra.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      val b = rb.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, ra.get(id), rb.get(id), a + b)
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(20)
    val got = q("q_text_rank_fusion").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3))).toSeq
    assert(got == expected, "fusion differs from the driver-side RRF")
    // docs on BOTH lists outrank equal-rank single-list docs by design
    assert(got.head._4 <= 2.0 / 61.0 + 1e-12)
  }

  test("13-gram decontamination equals a brute-force driver replay") {
    // independent reimplementation on raw strings: distinct 13-token
    // windows per doc, df-capped stop-shingle hygiene, train docs
    // (source != src0) x eval docs (src0) sharing any kept shingle
    val meta = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val n = ops.CurationOps.DecontamN
    val docSh: Map[Long, Set[String]] = docTexts.map { case (id, t) =>
      val toks = Option(t).getOrElse("").split(' ').filter(_.nonEmpty)
      id -> toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
    }.toMap
    val df = docSh.toSeq.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val kept = df.collect { case (sh, d) if d <= 50 => sh }.toSet
    val evalOwners: Map[String, Seq[Long]] = docSh.toSeq
      .filter { case (id, _) => meta(id) == "src0" }
      .flatMap { case (id, ss) => (ss & kept).map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = docSh.toSeq
      .filter { case (id, _) => meta(id) != "src0" }
      .flatMap { case (id, ss) =>
        val hits = (ss & kept).toSeq.flatMap(sh =>
          evalOwners.getOrElse(sh, Nil).map(ev => (sh, ev)))
        if (hits.isEmpty) Nil
        else Seq((id, hits.size.toLong, hits.map(_._1).distinct.size.toLong,
          hits.map(_._2).min))
      }.sortBy(_._1)
    val got = q("q_llm_contamination13").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, "13-gram contamination differs from brute force")
    // the fixture's exact/near duplicates make the audit non-vacuous, and
    // the 13-gram hit set is a subset of the 5-gram one doc-wise (a shared
    // 13-gram implies shared 5-grams; df caps can only shrink the looser set
    // further on pathological corpora, so assert on this fixture only)
    assert(got.nonEmpty, "fixture yields no 13-gram contamination — weak test")
    val g5 = q("q_llm_contamination").collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet.subsetOf(g5),
      "13-gram-flagged docs must be 5-gram-flagged on this fixture")
  }

  test("quality logit replays the staged sigmoid exactly (r12c3)") {
    // kernel sanity: the staged sigmoid tracks libm's within the A-S
    // Taylor truncation budget across the clamp range, saturates beyond
    for (z <- Seq(-16.5, -16.0, -8.0, -2.0, -0.5, 0.0, 0.5, 2.0, 8.0, 16.0, 20.0)) {
      val got = graft.ops.CurationOps.sigmoidReplay(z)
      val zc = math.max(-16.0, math.min(16.0, z))
      val ref = 1.0 / (1.0 + math.exp(-zc))
      assert(math.abs(got - ref) < 1e-9, s"sigmoid($z) = $got, ref $ref")
    }
    // monotone in z on a grid (the kernel never inverts an order)
    val grid = (-160 to 160).map(_ / 10.0)
      .map(graft.ops.CurationOps.sigmoidReplay)
    assert(grid.zip(grid.tail).forall { case (a, b) => a <= b })

    val rows = q("q_llm_quality_logit").collect()
    assert(rows.nonEmpty)
    val docs = ops.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    rows.foreach { r =>
      val (id, dl, types, chars) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val toks = docs(id).split(" ").filter(_.nonEmpty)
      assert(dl == toks.length.toLong, s"dl for $id")
      assert(types == toks.distinct.length.toLong, s"types for $id")
      assert(chars == toks.map(_.length.toLong).sum, s"chars for $id")
      val ttr = types.toDouble / dl.toDouble
      val mwl = chars.toDouble / dl.toDouble
      val z = -2.0 + 4.0 * ttr + 0.5 * (mwl - 4.0) + dl.toDouble / 256.0
      val zc = if (z > 16) 16.0 else if (z < -16) -16.0 else z
      assert(r.getDouble(4) == ttr && r.getDouble(5) == mwl, s"features $id")
      assert(r.getDouble(6) == zc, s"logit for $id")
      assert(r.getDouble(7) == graft.ops.CurationOps.sigmoidReplay(z),
        s"score for $id")
    }
    // the fixture should spread scores, not collapse to one value
    assert(rows.map(_.getDouble(7)).distinct.length > 10)
  }

  test("gopher rules replay exactly against a brute-force driver pass") {
    val rows = q("q_llm_gopher_quality").collect()
    val docs = ops.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size, "one row per (tokenized) doc")
    var kept = 0
    rows.foreach { r =>
      val toks = docs(r.getLong(0)).split(" ").filter(_.nonEmpty)
      val n = toks.length.toLong
      val sl = toks.map(_.length.toLong).sum
      val al = toks.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
      val bgs = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val cnt = bgs.groupBy(identity).view.mapValues(_.size.toLong)
      val (mx, tot) = (if (cnt.isEmpty) 0L else cnt.values.max, bgs.size.toLong)
      val dup = cnt.values.filter(_ >= 2).sum
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == sl.toDouble / n)
      assert(r.getDouble(3) == al.toDouble / n)
      if (tot > 0) {
        assert(r.getDouble(4) == mx.toDouble / tot)
        assert(r.getDouble(5) == dup.toDouble / tot)
      } else assert(r.isNullAt(4) && r.isNullAt(5))
      val keep = n >= 20 && n <= 80 && 3 * n <= sl && 5 * sl <= 24 * n &&
        5 * al >= 4 * n && 10 * mx <= tot && 8 * dup <= tot
      assert(r.getLong(6) == (if (keep) 1L else 0L), s"keep at doc ${r.getLong(0)}")
      if (keep) kept += 1
    }
    // every rule must have teeth on the fixture: both classes non-empty
    assert(kept > 0 && kept < rows.length)
  }
}
