package graft

import org.apache.spark.sql.functions._

import graft.ops.LlmOps

/** q_llm_span_dedup (r12): span-granular exact-substring dedup — the
  * sliding-window digest + gaps-and-islands merge must reconstruct the
  * exact maximal repeated spans a brute-force string reimplementation
  * finds, at any alignment. */
class SpanDedupSpec extends SparkTestBase {

  private val W = LlmOps.SpanW // 8

  /** Brute-force ground truth over w-gram STRINGS (no hashing): dup window
    * = w-gram occurring ≥2× in the corpus (multiplicity, incl. within one
    * doc); islands merged while pos ≤ prev + W. Returns per-doc merged
    * [s, e) spans. */
  private def bruteSpans(docs: Seq[(Long, String)]): Map[Long, Seq[(Int, Int)]] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split(' ').filter(_.nonEmpty).toSeq }.toMap
    val grams = toks.toSeq.flatMap { case (id, ts) =>
      (0 to ts.length - W).map(p => (id, p, ts.slice(p, p + W).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val dupPos = grams.filter(g => counts(g._3) > 1)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    dupPos.map { case (id, ps) =>
      val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      ps.foreach { p =>
        if (spans.nonEmpty && p <= spans.last._2) {
          val (s0, _) = spans.last
          spans(spans.length - 1) = (s0, p + W)
        } else spans += ((p, p + W))
      }
      id -> spans.toSeq
    }
  }

  private def runReport(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    LlmOps.spanDedupReport(spark, df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
  }

  test("maximal repeated spans reconstruct exactly, at unaligned offsets") {
    val core = (1 to 12).map(i => s"dup$i").mkString(" ") // 12-token repeated span
    val docs = Seq(
      // span embedded at offset 3 in doc 1, offset 7 in doc 2 (unaligned)
      1L -> s"a1 a2 a3 $core t1 t2 t3 t4 t5",
      2L -> s"b1 b2 b3 b4 b5 b6 b7 $core c1 c2",
      // clean doc: nothing repeated
      3L -> (1 to 30).map(i => s"u$i").mkString(" "),
      // shorter than W: emits no windows at all
      4L -> "x1 x2 x3",
      // within-doc repeat: same 9-token run twice inside one doc
      5L -> ((1 to 9).map(i => s"r$i") ++ Seq("mid1", "mid2", "mid3") ++
        (1 to 9).map(i => s"r$i")).mkString(" "))
    val expect = bruteSpans(docs)
    val got = runReport(docs)

    // doc 1: exactly the 12-token span, at token offset 3
    assert(expect(1L) == Seq((3, 15)))
    // doc 5: two islands (offsets 0 and 12), each 9 tokens
    assert(expect(5L) == Seq((0, 9), (12, 21)))
    docs.foreach { case (id, text) =>
      val n = text.split(' ').count(_.nonEmpty)
      val spans = expect.getOrElse(id, Seq.empty)
      val (nTok, nSpans, removed, kept, fp) = got(id)
      assert(nTok == n, s"n_tokens of $id")
      assert(nSpans == spans.length, s"n_spans of $id")
      assert(removed == spans.map { case (s, e) => e - s }.sum, s"removed of $id")
      assert(kept == n - removed, s"kept of $id")
      val P = graft.functions.ReplayableHash.P
      val B = graft.functions.ReplayableHash.BlockBase
      val expFp = spans.map { case (s, e) => ((s + 1).toLong * B + e) % P }
        .sum % P
      assert(fp == expFp, s"span_fp of $id")
    }
  }

  test("adjacent islands merge; a full-doc duplicate removes everything") {
    // two copies of the same 20-token doc: every window dup, one span [0,20)
    val body = (1 to 20).map(i => s"w$i").mkString(" ")
    val got = runReport(Seq(10L -> body, 11L -> body))
    Seq(10L, 11L).foreach { id =>
      val (nTok, nSpans, removed, kept, _) = got(id)
      assert(nTok == 20 && nSpans == 1 && removed == 20 && kept == 0,
        s"full-doc dup of $id")
    }
  }

  test("per-source rollup equals a driver-side fold of the per-doc report (r12)") {
    val perDoc = SparkEntry.queries("q_llm_span_dedup")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val src = ops.table(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = src.groupBy(_._2).view.mapValues { ds =>
      val reps = ds.map(d => perDoc(d._1))
      (ds.length.toLong, reps.count(_._2 > 0).toLong,
        reps.map(_._1).sum, reps.map(_._3).sum)
    }.toMap
    val got = SparkEntry.queries("q_llm_span_dedup_by_source")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1.0 else r.getDouble(5)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (s0, (nd, dws, tt, rt, rate)) =>
      val (en, edws, ett, ert) = expect(s0)
      assert((nd, dws, tt, rt) == ((en, edws, ett, ert)), s"rollup of $s0")
      if (ett > 0) assert(rate == ert.toDouble / ett.toDouble)
    }
  }

  test("randomized: report matches brute force on a template-heavy corpus") {
    val rnd = new scala.util.Random(42)
    val template = (1 to 15).map(i => s"tpl$i")
    val docs = (0L until 40L).map { id =>
      val n = 10 + rnd.nextInt(30)
      val base = (0 until n).map(_ => s"z${rnd.nextInt(50)}")
      val withTpl =
        if (id % 3 == 0) {
          val at = rnd.nextInt(base.length)
          (base.take(at) ++ template ++ base.drop(at))
        } else base
      id -> withTpl.mkString(" ")
    }
    val expect = bruteSpans(docs)
    val got = runReport(docs)
    docs.foreach { case (id, text) =>
      val spans = expect.getOrElse(id, Seq.empty)
      val (_, nSpans, removed, _, _) = got(id)
      assert(nSpans == spans.length, s"n_spans of $id")
      assert(removed == spans.map { case (s, e) => e - s }.sum, s"removed of $id")
    }
  }

  test("multi-width sweep: per-width rows equal the single-width reports; " +
      "removed_tokens non-increasing in w (r15)") {
    val docs = ops.table(spark, sfDir, "documents")
    val multi = SparkEntry.queries("q_llm_span_dedup_multi")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val nDocs = docs.count()
    assert(multi.size == nDocs * LlmOps.SpanWidths.size,
      "one row per (doc, width)")
    // each width slice is EXACTLY the single-width report at that width
    LlmOps.SpanWidths.foreach { w =>
      val single = LlmOps.spanDedupReport(spark, docs, w).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))).toMap
      single.foreach { case (id, rep) =>
        assert(multi((id, w.toLong)) == rep, s"width-$w slice of doc $id")
      }
    }
    // containment: a width-2w dup window implies dup windows at every
    // contained width-w offset, so removal coverage shrinks as w grows
    val byDoc = multi.groupBy(_._1._1)
    byDoc.foreach { case (id, rows) =>
      val removedByW = rows.map { case ((_, w), (_, _, rm, _, _)) => w -> rm }
        .toSeq.sortBy(_._1).map(_._2)
      assert(removedByW == removedByW.sorted.reverse,
        s"removed_tokens not non-increasing in w for doc $id")
    }
    // non-vacuous: the fixture's template corpus has spans at w = 8
    assert(byDoc.exists { case (_, rows) =>
      rows.exists { case ((_, w), (_, ns, _, _, _)) => w == 8L && ns > 0 } })
  }
}
