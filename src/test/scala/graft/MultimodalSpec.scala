package graft

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.{MediaAsset, StubCodec}

/** Multimodal plumbing: schema, per-partition batch shape, determinism of
  * the stubbed codec layer. */
class MultimodalSpec extends SparkTestBase {

  test("assets carry typed kind + binary payload for every document") {
    val a = MultimodalOps.assets(spark, sfDir)
    assert(a.schema.fieldNames.toSeq == Seq("asset_id", "kind", "content"))
    assert(a.schema("content").dataType.typeName == "binary")
    val kinds = a.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(kinds.values.sum == 500)
  }

  test("decode metadata is consistent with the payload") {
    val rows = MultimodalOps.decoded(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { d =>
      assert(d.width == 1 + d.n_bytes % 320)
      assert(d.height == 1 + (d.n_bytes * 7) % 200)
      assert(d.kind != "video" || d.n_frames == 1 + d.n_bytes / 100)
    }
  }

  test("feature extraction is deterministic with fixed shape and bounds") {
    val a = MediaAsset(1L, "image", "hello-world".getBytes)
    val f1 = StubCodec.features(a)
    val f2 = StubCodec.features(a)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 8)
    assert(f1.forall(v => v >= 0f && v < 1f))

    val df = SparkEntry.queries("q_mm_embed")(spark, sfDir)
    assert(df.where(col("dim") =!= 8).count() == 0)
    val twice = SparkEntry.queries("q_mm_embed")(spark, sfDir)
    assert(df.select("asset_id", "f1").collect().toSeq ==
      twice.select("asset_id", "f1").collect().toSeq)
  }

  test("lattice kNN matches a driver-side exact cosine reimplementation") {
    import graft.multimodal.MultimodalOps
    val lattices = MultimodalOps.assets(spark, sfDir).collect()
      .map(a => (a.asset_id, MultimodalOps.StubCodec.featureLattice(a)))
      .sortBy(_._1)
    val probe = lattices.find(_._1 == 0L).get._2
    val nb = math.sqrt(probe.map(x => x.toDouble * x).sum)
    val expected = lattices.filter(_._1 != 0L).map { case (id, ms) =>
      val dot = ms.zip(probe).map { case (x, y) => x * y }.sum
      val na = math.sqrt(ms.map(x => x.toDouble * x).sum)
      (id, if (na == 0.0 || nb == 0.0) 0.0 else dot.toDouble / (na * nb))
    }.sortBy { case (id, c) => (-c, id) }.take(10)
    val got = SparkEntry.queries("q_mm_embed_knn")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.map(_._1).toSeq == expected.map(_._1).toSeq)
    got.zip(expected).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-12)
    }
  }

  test("frame sampling fans out only videos, stepping by 5") {
    val df = SparkEntry.queries("q_mm_frame_sample")(spark, sfDir)
    val byAsset = df.groupBy("asset_id").agg(
      max("frame_idx").as("max_idx"), count(lit(1)).as("n")).collect()
    assert(byAsset.nonEmpty)
    byAsset.foreach { r =>
      assert(r.getAs[Long]("max_idx") % 5 == 0)
      assert(r.getAs[Long]("n") == r.getAs[Long]("max_idx") / 5 + 1)
    }
  }

  test("audio chunking tiles each asset: 30s/25s windows at the PARSED WAV rate") {
    val rows = SparkEntry.queries("q_mm_audio_chunks")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    // driver replay of the encode-side ground truth (16-bit mono: len // 2)
    val nBytes = graft.ops.table(spark, sfDir, "documents")
      .where("doc_id % 3 = 1") // audio slot of the round-robin kind
      .selectExpr("doc_id", "CAST(length(text) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.map(_._1).toSet == nBytes.filter(_._2 / 2 > 0).keySet,
      "one group per audio asset with at least one whole sample frame")
    rows.groupBy(_._1).foreach { case (aid, cs) =>
      val n = nBytes(aid) / 2
      val rate = MultimodalOps.AudioRates(((aid % 4) + 4).toInt % 4).toLong
      val (win, hop) = (30 * rate, 25 * rate)
      assert(cs.forall(_._2 == rate), s"parsed rate of $aid")
      val sorted = cs.sortBy(_._3)
      assert(sorted.map(_._4).toSeq == (0L until n by hop).toSeq,
        s"chunk starts of $aid")
      sorted.foreach { case (_, _, cid, start, len, ssec, dsec) =>
        assert(cid == start / hop)
        assert(len == math.min(win, n - start))
        assert(ssec == start.toDouble / rate && dsec == len.toDouble / rate)
      }
      // every sample is covered: consecutive full windows overlap by 5s
      assert(sorted.last._4 + sorted.last._5 == n, s"tail coverage of $aid")
    }
  }

  test("audio payloads are genuine RIFF/WAV containers the parser reads back") {
    import graft.multimodal.RiffWav
    val some = MultimodalOps.audioWavAssets(spark, sfDir).take(20)
    assert(some.nonEmpty)
    some.foreach { a =>
      val m = RiffWav.parse(a.content).get
      assert(new String(a.content.take(4), "US-ASCII") == "RIFF")
      assert(m.audioFormat == 1 && m.channels == 1 && m.bitsPerSample == 16)
      assert(m.sampleRate ==
        MultimodalOps.AudioRates(((a.asset_id % 4) + 4).toInt % 4))
      assert(m.dataBytes == a.content.length - 44L)
      assert(m.nSamples == m.dataBytes / 2)
    }
  }

  test("phash near-dup equals a driver-side dhash-over-text replay (r12)") {
    val rows = SparkEntry.queries("q_mm_phash")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // driver replay: payload bytes ARE the ASCII text (the assets()
    // contract), so dhash over text bytes must equal the engine's
    // dhash over the PARSED container payload
    val imgs = ops.table(spark, sfDir, "documents")
      .where(col("doc_id") % 3 === 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        MultimodalOps.dhash63(r.getString(1)
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))))
    val hs = imgs.toMap
    val imgsSeq: Seq[(Long, Long)] = imgs.toSeq
    val pairs = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (bk <- 0 until 4) {
      imgsSeq.groupBy { case (_, h) => (h >>> (bk * 16)) & 0xFFFFL }
        .values.foreach { g =>
          val kept = g.sortBy(_._1).take(200)
          for (x <- kept; y <- kept if x._1 < y._1)
            pairs((x._1, y._1)) = java.lang.Long.bitCount(x._2 ^ y._2).toLong
        }
    }
    val expect = pairs.toSeq
      .map { case ((a, b), hm) => (a, b, hm, if (hm <= 3) 1L else 0L) }
      .sortBy { case (a, b, hm, _) => (hm, a, b) }.take(100)
    assert(rows.toSeq == expect,
      "engine container-parsed hashes must equal the text-byte replay")
    // every flagged pair is genuinely close; the hash is non-constant
    assert(hs.values.toSeq.distinct.length > 1, "hashes collapsed")
    rows.filter(_._4 == 1L).foreach { case (a, b, hm, _) =>
      assert(java.lang.Long.bitCount(hs(a) ^ hs(b)) == hm && hm <= 3)
    }
  }

  test("image channel stats equal a driver replay over text bytes; " +
      "the unsigned branch decodes >= 0x80 payloads (r15)") {
    val rows = SparkEntry.queries("q_mm_image_channel_stats")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getDouble(8)))).toMap
    val texts = ops.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, t) => id % 3 == 0 && t.length >= 3 }
    assert(texts.nonEmpty && rows.size == texts.length)
    texts.foreach { case (id, t) =>
      val b = t.getBytes("UTF-8")
      val n = b.length / 3
      val sb = (0 until n).map(i => (b(3 * i) & 0xFF).toLong).sum
      val sg = (0 until n).map(i => (b(3 * i + 1) & 0xFF).toLong).sum
      val sr = (0 until n).map(i => (b(3 * i + 2) & 0xFF).toLong).sum
      val lum = 299 * sr + 587 * sg + 114 * sb
      val exp = (1L + b.length % 320, 1L + (b.length.toLong * 7) % 200,
        n.toLong, sb, sg, sr, lum, lum.toDouble / (1000.0 * n))
      assert(rows(id) == exp, s"channel stats of asset $id")
    }
    // the engine decodes UNSIGNED bytes — a crafted payload with the
    // high bit set (never produced by the ASCII fixture or the oracle)
    // must sum as 0xFF = 255, not -1
    val hot = graft.multimodal.Bmp.encode(1, 1,
      Array(0xFF.toByte, 0x80.toByte, 0x01.toByte))
    val m = graft.multimodal.Bmp.parse(hot).get
    val p = java.util.Arrays.copyOfRange(hot, m.dataOffset.toInt,
      (m.dataOffset + m.dataBytes).toInt)
    assert((p(0) & 0xFF) == 255 && (p(1) & 0xFF) == 128)
  }

  test("image exposure histogram recounts the parsed payload; high bytes " +
      "land in the top buckets (r15)") {
    val rows = SparkEntry.queries("q_mm_image_hist")(spark, sfDir)
      .collect()
      .map(r => ((r.getLong(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getDouble(4)))).toMap
    val texts = ops.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, t) => id % 3 == 0 && t.length >= 3 }
    assert(rows.size == texts.length * 12, "12 rows per asset")
    texts.foreach { case (id, t) =>
      val b = t.getBytes("UTF-8")
      val n = b.length / 3
      Seq(("b", 0), ("g", 1), ("r", 2)).foreach { case (ch, off) =>
        val cs = Array.fill(4)(0L)
        (0 until n).foreach(i => cs((b(3 * i + off) & 0xFF) >> 6) += 1)
        (0 until 4).foreach { bkt =>
          val (cnt, share) = rows((id, ch, bkt.toLong))
          assert(cnt == cs(bkt), s"asset $id $ch bucket $bkt count")
          assert(share == cnt.toDouble / n.toDouble, s"asset $id share ops")
        }
        assert(cs.sum == n.toLong, s"asset $id $ch buckets partition pixels")
      }
    }
    // ASCII fixture ⇒ the top half of the range is dark in EVERY asset;
    // the bucket arithmetic for >= 0x80 bytes still exercises via the
    // unsigned shift: 0xFF >> 6 = 3, 0x80 >> 6 = 2
    assert(rows.collect { case ((_, _, b), (c, _)) if b >= 2 => c }.sum == 0L)
    assert((0xFF & 0xFF) >> 6 == 3 && (0x80 & 0xFF) >> 6 == 2)
  }
}
