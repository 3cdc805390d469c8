package graft

import org.apache.spark.sql.DataFrame
import graft.ops.TextOps

/** Property tests for the text-analysis family, centered on the oracle-less
  * `q_text_fingerprint` (SURVEY §2B): determinism, content sensitivity, and
  * the winnowing monotonicity of the min-shingle hash.
  */
class TextSpec extends SparkTestBase {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

  // ---- hash-function unit properties (pure driver-side) ------------------

  test("fullHash is deterministic and positionally sensitive") {
    val t = "the quick brown fox jumps over the lazy dog"
    assert(TextOps.fullHashFn(t) == TextOps.fullHashFn(t))
    // single-char substitution changes the hash
    assert(TextOps.fullHashFn(t) != TextOps.fullHashFn(t.replace('q', 'x')))
    // same multiset of chars, different order (shift sensitivity)
    val rotated = t.substring(1) + t.charAt(0)
    assert(TextOps.fullHashFn(t) != TextOps.fullHashFn(rotated))
    // appending changes the hash
    assert(TextOps.fullHashFn(t) != TextOps.fullHashFn(t + "."))
  }

  test("minShingle equals the minimum rolling hash over all 8-char windows") {
    val t = "abcdefghijklmnopqrstuvwxyz0123456789"
    val windows = (0 to t.length - 8).map(i => TextOps.fullHashFn(t.substring(i, i + 8)))
    assert(TextOps.minShingleFn(t) == windows.min)
    // short inputs fall back to the whole-text hash
    assert(TextOps.minShingleFn("abc") == TextOps.fullHashFn("abc"))
  }

  test("minShingle is monotone under appends (windows only ever get added)") {
    val base = "the quick brown fox jumps over the lazy dog"
    var t = base
    var prev = TextOps.minShingleFn(t)
    for (suffix <- Seq(" again", " and again", " 0123456789")) {
      t += suffix
      val cur = TextOps.minShingleFn(t)
      assert(cur <= prev, s"append raised min-shingle: $prev -> $cur")
      prev = cur
    }
    // the winnowing property that makes it near-dup-robust: an append only
    // changes the fingerprint if one of the NEW boundary/suffix windows
    // hashes below the current minimum
    val min0 = TextOps.minShingleFn(base)
    val appended = base + " zz"
    val addedWindows = (base.length - 7 to appended.length - 8)
      .map(i => TextOps.fullHashFn(appended.substring(i, i + 8)))
    assert(TextOps.minShingleFn(appended) == math.min(min0, addedWindows.min))
  }

  // ---- query-level properties on the fixture -----------------------------

  test("q_text_fingerprint is deterministic across runs and matches the exposed functions") {
    val run1 = q("q_text_fingerprint").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val run2 = q("q_text_fingerprint").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(run1.toSeq == run2.toSeq)

    val textOf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    run1.foreach { case (id, full, shingle) =>
      assert(full == TextOps.fullHashFn(textOf(id)))
      assert(shingle == TextOps.minShingleFn(textOf(id)))
    }
  }

  test("repetition score is the exact Simpson concentration of each token distribution") {
    val textOf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rows = q("q_text_repetition").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, k, simpson, ratio) =>
      val tfs = textOf(id).split(' ').filter(_.nonEmpty)
        .groupBy(identity).map(_._2.length.toLong)
      assert(n == tfs.sum && k == tfs.size.toLong, s"doc $id counts")
      assert(simpson == tfs.map(t => t * t).sum.toDouble / (n * n), s"doc $id simpson")
      assert(ratio == k.toDouble / n, s"doc $id ratio")
      // Simpson bounds: 1/k (perfectly even) <= s <= 1 (single token)
      assert(simpson >= 1.0 / k - 1e-15 && simpson <= 1.0)
    }
  }

  test("normalization is idempotent and its dup-group sizes partition the corpus") {
    val rows = q("q_text_normalize").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val textOf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows.length == textOf.size)
    def normalize(t: String) = t.toLowerCase.trim.replaceAll(" +", " ")
    rows.foreach { case (id, len, _, n) =>
      val norm = normalize(textOf(id))
      assert(len == norm.length.toLong, s"doc $id norm_len")
      assert(normalize(norm) == norm, s"doc $id not idempotent")
      assert(n >= 1)
    }
    // group sizes partition the corpus: each distinct nhash contributes its
    // size exactly once, and the sizes sum back to the doc count
    val bySize = rows.groupBy(_._3).values.map { g =>
      assert(g.map(_._4).distinct.length == 1); g.head._4
    }
    assert(bySize.sum == rows.length.toLong)
  }

  test("fingerprints separate distinct texts and unite identical ones on the fixture") {
    val rows = q("q_text_fingerprint").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val textOf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val byText = rows.groupBy { case (id, _) => textOf(id) }
    // identical text -> identical fingerprint (trivially true — same input —
    // but guards against nondeterministic UDF evaluation across partitions)
    byText.foreach { case (_, g) => assert(g.map(_._2).distinct.length == 1) }
    // distinct texts -> distinct fingerprints (collision-free on the corpus)
    val distinctTexts = byText.size
    val distinctPrints = rows.map(_._2).distinct.length
    info(s"distinct texts: $distinctTexts, distinct fingerprints: $distinctPrints")
    assert(distinctPrints == distinctTexts)
  }

  test("scrub removes every sensitive term and counts match a driver-side recount") {
    val pattern = graft.ops.TextOps.SensitivePattern.r
    val textOf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rows = q("q_text_scrub").collect()
    assert(rows.nonEmpty)
    var sawMatch = false
    rows.foreach { r =>
      val (id, n, len, sha) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val text = textOf(id)
      val matches = pattern.findAllIn(text).size
      assert(n == matches, s"doc $id: engine counted $n, driver $matches")
      if (matches > 0) sawMatch = true
      val redacted = pattern.replaceAllIn(text,
        java.util.regex.Matcher.quoteReplacement(graft.ops.TextOps.Redaction))
      assert(len == redacted.length)
      // redacted text matches nothing anymore
      assert(pattern.findFirstIn(redacted).isEmpty)
      val driverSha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(redacted.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(sha == driverSha)
    }
    assert(sawMatch, "fixture must exercise at least one redaction")
  }

  test("pii audit per-source counts match a driver-side regex replay") {
    val pattern = graft.ops.TextOps.SensitivePattern.r
    val bySource = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), pattern.findAllIn(r.getString(1)).size))
      .groupBy(_._1)
    val expected = bySource.map { case (src, hits) =>
      (src, (hits.length.toLong, hits.count(_._2 > 0).toLong,
        hits.map(_._2.toLong).sum, hits.map(_._2.toLong).max))
    }
    val got = q("q_text_pii_audit").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, e) =>
      assert(got(src) == e, s"source $src: got ${got(src)}, expected $e")
    }
    assert(expected.values.exists(_._3 > 0), "fixture sanity: expected hits")
  }

  // ---- q_text_winnow (r9): winnowing fingerprint selection ---------------

  private def winnowRef(t: String, k: Int, w: Int): Seq[Long] = {
    val RH = graft.functions.ReplayableHash
    if (t.length < k) Seq(RH.tokenHash(t))
    else {
      val kg = (0 to t.length - k).map(i => RH.tokenHash(t.substring(i, i + k)))
      if (kg.length < w) Seq(kg.min)
      else (0 to kg.length - w).map(p => kg.slice(p, p + w).min)
        .distinct.sorted
    }
  }

  private def winnowSel(t: String): Seq[Long] =
    graft.functions.ContentChunkers.winnowSelect(
      org.apache.spark.unsafe.types.UTF8String.fromString(t),
      TextOps.WinnowK, TextOps.WinnowW).toSeq

  test("winnowSelect matches a brute-force reference across input regimes") {
    val rnd = new scala.util.Random(7)
    val samples = Seq("", "a", "abcdefg", "abcdefgh", "abcdefghij",
      "aaaaaaaaaaaaaaaaaaaa",
      "the quick brown fox jumps over the lazy dog") ++
      (1 to 20).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(80)).mkString)
    for (t <- samples)
      assert(winnowSel(t) == winnowRef(t, TextOps.WinnowK, TextOps.WinnowW),
        s"mismatch on ${t.take(30)}…")
  }

  test("winnowing guarantee: a shared substring of w+k-1 codepoints shares a fingerprint") {
    // SIGMOD'03: every window of w consecutive k-grams selects some hash,
    // and a shared substring of length ≥ w+k-1 contains a full such window,
    // so the two documents must select a common value from it.
    val rnd = new scala.util.Random(13)
    val t = TextOps.WinnowW + TextOps.WinnowK - 1 // = 11
    for (i <- 1 to 20) {
      val shared = rnd.alphanumeric.take(t).mkString
      val d1 = rnd.alphanumeric.take(rnd.nextInt(40)).mkString + shared +
        rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      val d2 = rnd.alphanumeric.take(rnd.nextInt(40)).mkString + shared +
        rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      assert(winnowSel(d1).intersect(winnowSel(d2)).nonEmpty,
        s"trial $i: no shared fingerprint for shared substring '$shared'")
    }
  }

  test("q_text_winnow matches a full driver-side replay on the fixture") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sel = docs.map { case (id, t) => (id, winnowSel(t)) }
    val df = sel.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val expected = sel.map { case (id, hs) =>
      val nds = hs.map(df)
      (id, (hs.size.toLong, nds.count(_ > 1).toLong, nds.max.toLong))
    }.toMap
    val rows = q("q_text_winnow").collect()
    assert(rows.length == docs.length)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) == expected(id),
        s"doc $id winnow stats mismatch")
    }
    // fixture sanity: the near-dup families must actually share fingerprints
    assert(expected.values.exists(_._2 > 0), "no shared fingerprints at all")
  }

  test("entropy proxy equals a driver-side integer-log2 replay") {
    def ilog2(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, t) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else {
        val tf = toks.groupBy(identity).view.mapValues(_.length.toLong)
        val n = toks.length.toLong
        val ent = n * ilog2(n) - tf.values.map(c => c * ilog2(c)).sum
        Some(id -> ((n, tf.size.toLong, ent, ent.toDouble / n)))
      }
    }.toMap
    val got = q("q_text_entropy").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val id = r.getLong(0)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
        == expected(id), s"doc $id entropy mismatch")
      // quantized-entropy range: 0 ≤ ent_proxy ≤ n·ilog2(n)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(1) * ilog2(r.getLong(1)))
    }
    // the signal the score exists for: a repeated-token doc must score
    // below a same-length all-distinct doc (diversity ordering)
    val byId = got.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val rep = docs.collectFirst { case (id, t)
      if t.split(" ").count(_.nonEmpty) >= 8 &&
        t.split(" ").filter(_.nonEmpty).distinct.length * 2 <=
          t.split(" ").count(_.nonEmpty) => id }
    rep.foreach { id =>
      val maxRate = byId.values.max
      assert(byId(id) < maxRate, "a highly repetitive doc scored as most diverse")
    }
  }

  test("rake keyphrases equal a driver-side replay, including order") {
    val docs = graft.ops.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').filter(_.nonEmpty).toSeq))
    val dfc = docs.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val stops = dfc.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(10).map(_._1).toSet
    // phrase occurrences: maximal non-stop runs, as token seqs
    val occs = docs.flatMap { case (_, ts) =>
      val runs = collection.mutable.Buffer[Seq[String]]()
      var cur = collection.mutable.Buffer[String]()
      ts.foreach { t =>
        if (stops(t)) { if (cur.nonEmpty) { runs += cur.toSeq; cur = collection.mutable.Buffer() } }
        else cur += t
      }
      if (cur.nonEmpty) runs += cur.toSeq
      runs
    }
    val freq = occs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val deg = occs.flatMap(p => p.map(_ -> p.length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expected = occs
      .map(p => (p.mkString(" "), p.length.toLong,
        p.map(deg).sum, p.map(freq).sum))
      .groupBy(_._1).toSeq
      .map { case (ph, os) =>
        (ph, os.head._2, os.size.toLong, os.head._3 * 1000000L / os.head._4) }
      .filter(_._2 <= 4)
      .sortBy { case (ph, _, _, s) => (-s, ph) }.take(50)
      .map { case (ph, nw, sup, s) => (ph, nw, sup, s) }
    val got = q("q_text_rake").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, "keyphrase list or order differs from the replay")
    // structural sanity: no stopword inside any emitted phrase
    got.foreach { case (ph, nw, _, _) =>
      val ws = ph.split(' ')
      assert(ws.length == nw && ws.forall(!stops(_)), s"bad phrase '$ph'")
    }
  }

  test("bm25 top-20 equals a driver-side scoring replay, same FP order") {
    val terms = Seq("spark", "hash", "merge", "window")
    val docs = graft.ops.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').filter(_.nonEmpty)))
    val n = docs.length.toLong
    val sdl = docs.map(_._2.length.toLong).sum
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val scored = docs.map { case (id, toks) =>
      val dl = toks.length.toLong
      val parts = terms.map { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) 0.0
        else ((2.0 * n - 2.0 * df(t) + 1.0) / (2.0 * df(t) + 1.0)) *
          (tf.toDouble * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl.toDouble * n / sdl))))
      }
      // the FIXED term-order left-to-right add — part of the replay contract
      (id, dl, parts.count(_ != 0.0).toLong, parts.foldLeft(0.0)(_ + _))
    }.filter(_._3 > 0)
    val expected = scored.sortBy { case (id, _, _, s) => (-s, id) }.take(20).toSeq
    val got = q("q_text_bm25").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected, "bm25 ranking differs from the driver replay")
    // ranking sanity: scores are positive and non-increasing
    assert(got.forall(_._4 > 0.0))
    assert(got.map(_._4).sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
  }

  test("nfc_normalize: composition, idempotence, ASCII fixed point, digest discipline") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val decomposed = "e\u0301cole" // e + U+0301 combining acute
    val composed = "\u00e9cole"    // precomposed e-acute
    val rows = Seq(decomposed, composed, "plain ascii text",
      "ﬁle ligature", "Ώ astral 😀", "")
    val out = spark.createDataFrame(rows.map(Tuple1(_))).toDF("text")
      .select(col("text"),
        call_function("nfc_normalize", col("text")).as("nfc"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    // canonical composition unifies the two é forms
    assert(out(decomposed) == composed)
    assert(out(composed) == composed)
    // NFC (not NFKC): compatibility ligatures survive
    assert(out("ﬁle ligature") == "ﬁle ligature")
    // ASCII is a fixed point; engine output matches java.text.Normalizer
    rows.foreach { t =>
      val expected = java.text.Normalizer.normalize(
        t, java.text.Normalizer.Form.NFC)
      assert(out(t) == expected, s"nfc diverges from Normalizer on '$t'")
    }
    // idempotence: nfc(nfc(x)) == nfc(x)
    out.values.foreach { n =>
      assert(java.text.Normalizer.isNormalized(n, java.text.Normalizer.Form.NFC))
    }
    // the declared query unifies the digests of canonically-equal docs and
    // never ships normalized text: schema carries only flag/len/digest
    val g = q("q_text_unicode_norm")
    assert(g.columns.toSeq == Seq("doc_id", "changed", "len_nfc", "sha16"))
    val fixture = g.collect()
    assert(fixture.nonEmpty)
    // ASCII fixture: normalization must be a no-op everywhere
    assert(fixture.forall(r => !r.getBoolean(1)),
      "ASCII fixture rows must be NFC fixed points")
  }

  test("nfkc_normalize: compatibility folds, idempotence, NFC∘NFKC = NFKC (r11)") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val cases = Seq(
      "ﬁle ligature",          // U+FB01 LATIN SMALL LIGATURE FI → "fi"
      "Ｆｕｌｌｗｉｄｔｈ",      // full-width forms → ASCII
      "① circled ②",           // circled digits → 1, 2
      "x² + y³",               // superscripts → plain digits
      "école",           // canonical composition still applies
      "plain ascii text", "")
    val out = spark.createDataFrame(cases.map(Tuple1(_))).toDF("text")
      .select(col("text"),
        call_function("nfkc_normalize", col("text")).as("nfkc"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    // the canonical compatibility folds
    assert(out("ﬁle ligature") == "file ligature")
    assert(out("Ｆｕｌｌｗｉｄｔｈ") == "Fullwidth")
    assert(out("① circled ②") == "1 circled 2")
    assert(out("x² + y³") == "x2 + y3")
    assert(out("école") == "école")
    // engine output matches java.text.Normalizer everywhere
    cases.foreach { t =>
      val expected = java.text.Normalizer.normalize(
        t, java.text.Normalizer.Form.NFKC)
      assert(out(t) == expected, s"nfkc diverges from Normalizer on '$t'")
    }
    // idempotence + NFC∘NFKC = NFKC (NFKC output is already canonical)
    out.values.foreach { n =>
      assert(java.text.Normalizer.isNormalized(n, java.text.Normalizer.Form.NFKC))
      assert(java.text.Normalizer.normalize(
        n, java.text.Normalizer.Form.NFC) == n)
    }
    // the decorated query (r14 hash gate): same digest-discipline schema
    // as the NFC twin; the doc_id % |NfkcDeco| prefix drives `changed`
    // (index 0 is the fixed-point variant), and the engine digest equals
    // a driver-side replay of expected-prefix || ' ' || text
    val g = q("q_text_nfkc")
    assert(g.columns.toSeq == Seq("doc_id", "changed", "len_nfkc", "sha16"))
    val fixture = g.collect()
    assert(fixture.nonEmpty)
    val deco = graft.ops.TextOps.NfkcDeco
    val decoExp = graft.ops.TextOps.NfkcDecoExpected
    fixture.foreach { r =>
      val i = (r.getLong(0) % deco.size).toInt
      assert(r.getBoolean(1) == (deco(i) != decoExp(i)),
        s"doc ${r.getLong(0)}: changed flag vs decoration table")
    }
    assert(fixture.exists(_.getBoolean(1)) && fixture.exists(!_.getBoolean(1)),
      "both changed branches must occur")
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val md = java.security.MessageDigest.getInstance("SHA-256")
    fixture.take(50).foreach { r =>
      val expect = decoExp((r.getLong(0) % deco.size).toInt) + " " +
        texts(r.getLong(0))
      assert(r.getLong(2) == expect.codePointCount(0, expect.length),
        s"doc ${r.getLong(0)}: len_nfkc")
      val sha = md.digest(expect.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
      assert(r.getString(3) == sha, s"doc ${r.getLong(0)}: sha16 replay")
    }
  }

  test("lexicon scores equal a driver-side token recount (r14)") {
    val lex = graft.ops.TextOps.Lexicons
    val rows = q("q_text_lexicon_score").collect()
      .map(r => (r.getLong(0), r.toSeq.drop(1))).toMap
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    var covered = 0
    docs.foreach { case (id, t) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) assert(!rows.contains(id))
      else {
        val n = toks.length.toLong
        val expect: Seq[Any] = n +: lex.flatMap { case (_, ws) =>
          val hits = toks.count(ws.contains).toLong
          Seq(hits, hits.toDouble / n)
        }
        assert(rows(id) == expect, s"doc $id lexicon scores")
        covered += 1
      }
    }
    assert(covered == rows.size)
    // the fixture's DB-themed vocabulary must actually exercise hits
    assert(rows.values.exists(_.exists {
      case h: Long => h > 0L
      case _ => false
    }), "lexicons must hit on the fixture")
  }

  test("source-MI equals a driver-side integer-log2 replay") {
    def ilog2(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val joint = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byTok = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val bySrc = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = toks.length.toLong
    val nl = n * ilog2(n)
    val hs = nl - bySrc.values.map(c => c * ilog2(c)).sum
    val ht = nl - byTok.values.map(c => c * ilog2(c)).sum
    val hj = nl - joint.values.map(c => c * ilog2(c)).sum
    val r = q("q_text_source_mi").collect().head
    assert(r.getLong(0) == n, "n_tokens differs")
    assert(r.getLong(1) == bySrc.size.toLong, "n_sources differs")
    assert(r.getLong(2) == byTok.size.toLong, "n_vocab differs")
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((hs, ht, hj)),
      "entropy quanta differ from the replay")
    assert(r.getLong(6) == hs + ht - hj, "mi_q is not the entropy identity")
    assert(r.getDouble(7) == (hs + ht - hj).toDouble / n)
    // H(S,T) ≥ max(H(S), H(T)) holds EXACTLY in quanta (splitting a count
    // can only lower Σ c·ilog2(c), since ilog2 is monotone), so
    // mi_q ≤ min(H_q(S), H_q(T)) with no slack; only the ≥0 side of true
    // MI is lost to floor-log quantization
    assert(r.getLong(6) <= math.min(hs, ht),
      "mi exceeds the marginal-entropy bound")
  }

  test("langid confusion matrix reconciles exactly with the predictor output") {
    val pred = q("q_text_langid").collect()
      .map(r => (r.getString(1), if (r.isNullAt(2)) "none" else r.getString(2)))
    val expect = pred.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val langTotals = pred.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val rows = q("q_text_langid_eval").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))))
    assert(rows.map(_._1).distinct.length == rows.length, "one row per cell")
    assert(rows.map(_._1).toSet == expect.keySet)
    rows.foreach { case ((lang, guess), (n, tot, share, hit)) =>
      assert(n == expect((lang, guess)))
      assert(tot == langTotals(lang))
      assert(share == n.toDouble / tot)
      assert(hit == (if (lang == guess) 1L else 0L))
    }
    // shares per lang partition the lang's docs
    rows.groupBy(_._1._1).foreach { case (_, cells) =>
      assert(cells.map(_._2._1).sum == cells.head._2._2)
    }
    // the harness has teeth: accuracy above the 1/|langs| chance level.
    // The fixture's langs share most vocabulary, so the top-20-token
    // profile only reaches 0.226 at sf0.001 — that WEAKNESS is exactly
    // what the report exists to surface (the semdedup-recall precedent:
    // don't tune the floor to flatter the predictor).
    val hits = rows.collect { case ((l, g), (n, _, _, _)) if l == g => n }.sum
    val nLangs = rows.map(_._1._1).distinct.length
    assert(hits.toDouble / pred.length > 1.0 / nLangs,
      "langid collapsed to (or below) chance")
  }

  test("source jsd replays exactly against a driver-side quanta computation") {
    val rows = q("q_text_source_jsd").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // driver replay over token STRINGS (the digest is injective on the
    // fixture — the engine's own shingle-key discipline)
    val toks = graft.ops.table(spark, sfDir, "documents")
      .selectExpr("source", "explode(split(text, ' ')) AS t")
      .where("length(t) > 0").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def ilog2(c: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(c)
    def hq(counts: Iterable[Long]): Long = {
      val n = counts.sum
      n * ilog2(n) - counts.map(c => c * ilog2(c)).sum
    }
    val bySrc = toks.groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val pairs = for (i <- srcs.indices; j <- i + 1 until srcs.length)
      yield (srcs(i), srcs(j))
    assert(rows.keySet == pairs.toSet, "one row per source pair")
    pairs.foreach { case (a, b) =>
      val (ca, cb) = (bySrc(a), bySrc(b))
      val pool = (ca.keySet ++ cb.keySet).toSeq
        .map(t => ca.getOrElse(t, 0L) + cb.getOrElse(t, 0L))
      val (ha, hb, hp) = (hq(ca.values), hq(cb.values), hq(pool))
      val n = ca.values.sum + cb.values.sum
      assert(rows((a, b)) == ((n, hp, ha, hb, hp - ha - hb)),
        s"jsd mismatch for ($a, $b)")
    }
    // NOTE: no quanta-order invariants here — H_q(pool) ≥ H_q(part) is
    // FALSE under floor-log (brute-force counterexample [1,4]/[1,7]);
    // the exact replay above is the whole contract
  }

  test("hapax profile equals a driver-side token recount (r12)") {
    val rows = q("q_text_hapax").collect().map(r =>
      (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(rows.nonEmpty)
    val docs = ops.table(spark, sfDir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val counts = scala.collection.mutable.Map.empty[String, Long]
      ds.foreach(_._2.split(" ").filter(_.nonEmpty)
        .foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1L))
      val vocab = counts.size.toLong
      val nTok = counts.values.sum
      val hapax = counts.values.count(_ == 1L).toLong
      val dis = counts.values.count(_ == 2L).toLong
      val (v, n, h, d2, ttr, hs) = {
        val t = rows(src); (t._1, t._2, t._3, t._4, t._5, t._6)
      }
      assert((v, n, h, d2) == ((vocab, nTok, hapax, dis)), s"counts for $src")
      assert(ttr == vocab.toDouble / nTok && hs == hapax.toDouble / vocab,
        s"ratios for $src")
      // NOTE: no hapax ≥ dis "Zipf shape" pin — the fixture's templated
      // ~31-type vocabulary is NOT Zipfian (src14 at sf0.001 has dis=1,
      // hapax=0); the exact recount above is the whole contract
    }
  }

  test("stem vocab equals a driver-side stemmer replay (r12c3)") {
    def stem(t: String): String = {
      val s1 =
        if (t.length > 4 && t.endsWith("sses")) t.dropRight(2)
        else if (t.length > 4 && t.endsWith("ies")) t.dropRight(2)
        else if (t.endsWith("ss")) t
        else if (t.length > 3 && t.endsWith("s")) t.dropRight(1)
        else t
      if (s1.length > 5 && s1.endsWith("ing")) s1.dropRight(3)
      else if (s1.length > 4 && s1.endsWith("ed")) s1.dropRight(2)
      else s1
    }
    // rule pins: each stage's branches on canonical cases
    assert(stem("glasses") == "glass" && stem("flies") == "fli")
    assert(stem("class") == "class" && stem("dogs") == "dog")
    assert(stem("its") == "its" && stem("is") == "is") // >3 length guard
    assert(stem("running") == "run" + "n" && stem("doing") == "doing")
    assert(stem("walked") == "walk" && stem("used") == "used")

    val rows = q("q_text_stem_vocab").collect().map(r =>
      (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(rows.nonEmpty)
    val docs = ops.table(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val counts = scala.collection.mutable.Map.empty[String, Long]
      ds.foreach(_._2.split(" ").filter(_.nonEmpty)
        .foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1L))
      val fam = counts.toSeq.groupBy { case (t, _) => stem(t) }
      val nTypes = counts.size.toLong
      val nStems = fam.size.toLong
      val nChanged = counts.keys.count(t => stem(t) != t).toLong
      val maxFam = fam.values.map(_.size).max.toLong
      val tokTotal = counts.values.sum
      val (gt, gs, gc, gm, gn, gr) = {
        val t = rows(lang); (t._1, t._2, t._3, t._4, t._5, t._6)
      }
      assert((gt, gs, gc, gm, gn) ==
        ((nTypes, nStems, nChanged, maxFam, tokTotal)), s"counts for $lang")
      assert(gr == nTypes.toDouble / nStems.toDouble, s"ratio for $lang")
      assert(gs <= gt, s"stem count cannot exceed type count for $lang")
    }
  }

  test("truncation audit equals a driver-side token recount (r12)") {
    val rows = q("q_llm_truncation").collect().map(r =>
      (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(rows.nonEmpty)
    val docs = ops.table(spark, sfDir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val MaxCtx = 64L
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val dls = ds.map(_._2.split(" ").count(_.nonEmpty).toLong)
      val (n, nTr, tot, lost, share) = {
        val r = rows(src); (r._1, r._2, r._3, r._4, r._5)
      }
      assert(n == dls.length.toLong, s"$src doc count")
      assert(nTr == dls.count(_ > MaxCtx).toLong, s"$src truncated count")
      assert(tot == dls.sum, s"$src token total")
      assert(lost == dls.map(d => math.max(0L, d - MaxCtx)).sum, s"$src lost")
      assert(share == lost.toDouble / tot, s"$src share readback")
    }
    // the cap bites but does not swallow: both sides populated corpus-wide
    val all = rows.values
    assert(all.map(_._2).sum > 0 && all.map(_._2).sum < all.map(_._1).sum,
      "MaxCtx must split the corpus")
  }

  test("zipf log2-bin curve equals a driver-side exact replay (r12)") {
    val rows = q("q_text_zipf").collect().map(r =>
      (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.nonEmpty)
    val docs = ops.table(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach(_.split(" ").filter(_.nonEmpty)
      .foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1L))
    def ilog2(x: Long): Long = (63 - java.lang.Long.numberOfLeadingZeros(x)).toLong
    val bins = counts.values.groupBy(c => ilog2(c))
      .map { case (b, cs) => (b, (cs.size.toLong, cs.sum)) }
    val pts = bins.map { case (b, (nt, _)) => (b, ilog2(nt)) }.toSeq
    val m = pts.length.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val den = m * sxx - sx * sx
    val slope = if (den > 0) (m * sxy - sx * sy).toDouble / den.toDouble else 0.0
    assert(rows.keySet == bins.keySet, "log2 bin set")
    bins.foreach { case (b, (nt, no)) =>
      val (gn, go, gs) = rows(b)
      assert((gn, go) == ((nt, no)), s"bin $b type/occurrence counts")
      assert(gs == slope, s"slope readback at bin $b")
    }
    // the slope is a real fit: the fixture has ≥ 2 occupied bins
    assert(bins.size >= 2, "fixture collapsed to one tf bin — fit is degenerate")
  }

  test("burstiness equals a driver-side VMR replay, including order (r15)") {
    val rows = q("q_text_burstiness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val docs = ops.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length.toLong
    val tf = docs.flatMap { case (id, t) =>
      t.split(' ').filter(_.nonEmpty).groupBy(identity)
        .map { case (tok, occ) => (tok, id, occ.length.toLong) }
    }
    val expected = tf.groupBy(_._1).view.mapValues { xs =>
      val tfs = xs.map(_._3)
      (tfs.length.toLong, tfs.sum, tfs.map(x => x * x).sum, tfs.max)
    }.toMap.collect { case (tok, (df, s1, s2, mx)) if df >= 5 =>
      (tok, df, s1, mx, (n * s2 - s1 * s1).toDouble / (n * s1).toDouble)
    }.toSeq
      .sortBy { case (tok, _, _, _, b) => (-b, tok) }
      .take(50)
    assert(rows.toSeq == expected,
      "burstiness top-50 must equal the driver replay, in order")
    // non-vacuous: template words are bursty (VMR > 1), and the fixture
    // also has near-Poisson tokens below the cut
    assert(rows.head._5 > 1.0, "no bursty token — weak fixture signal")
  }

  test("conditional bigram entropy equals a driver quanta replay; cond_q >= 0 (r15)") {
    val rows = q("q_text_cond_entropy").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))).toMap
    val docs = ops.table(spark, sfDir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def ilog2(c: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(c)
    val bigrams = docs.flatMap { case (src, t) =>
      val ts = t.split(' ').filter(_.nonEmpty)
      ts.sliding(2).filter(_.length == 2).map(p => (src, p(0), p(0) + " " + p(1)))
    }
    val expected = bigrams.groupBy(_._1).view.mapValues { xs =>
      val cj = xs.groupBy(_._3).view.mapValues(_.length.toLong).values.toSeq
      val cp = xs.groupBy(_._2).view.mapValues(_.length.toLong).values.toSeq
      val n = cj.sum
      val sj = cj.map(c => c * ilog2(c)).sum
      val sp = cp.map(c => c * ilog2(c)).sum
      (n, cj.length.toLong, cp.length.toLong,
        n * ilog2(n) - sp, n * ilog2(n) - sj, sp - sj,
        (sp - sj).toDouble / n)
    }.toMap
    assert(rows == expected, "cond entropy must equal the driver replay")
    // the one SAFE quanta order relation (r10): splitting a count can
    // only lower Σ c·ilog2(c) ⇒ cond_q >= 0 EXACTLY, no slack
    rows.foreach { case (src, (_, _, _, _, hb, cq, _)) =>
      assert(cq >= 0, s"cond_q negative for $src")
      assert(cq <= hb, s"cond_q exceeds h_bigram_q for $src")
    }
    assert(rows.nonEmpty)
  }
}
