package graft

import java.nio.charset.StandardCharsets

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.{DeliverySettings, RetryPolicy}
import graft.streaming.{DeliverySink, MockDeliveryService}

/** Property-based invariants (SURVEY §5.2): batchify cap, framing
  * round-trip, retry accounting, dedup idempotence, cosine bounds.
  * (Plain ScalaCheck Gen sampling — the scalatest+scalacheck bridge
  * artifact is not available offline.)
  */
class PropertySpec extends SparkTestBase {

  /** Deterministic sampling driver over a generator. */
  private def forSamples[A](gen: Gen[A], n: Int = 25)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  test("every delivery request respects the batch-size cap and loses nothing") {
    forSamples(Gen.zip(Gen.chooseNum(1, 1200), Gen.chooseNum(1, 500))) {
      case (n, cap) =>
        val svc = new MockDeliveryService()
        val batchified = (1 to n).map(i => s"r-$i".getBytes(StandardCharsets.UTF_8))
          .grouped(cap).toSeq
        val results = batchified.map(b => DeliverySink.putWithRetry(svc, "s", b, None))
        assert(svc.batchSizes.forall(_ <= cap))
        assert(results.map(_._1).sum == n)
        assert(svc.delivered.size == n)
    }
  }

  test("putWithRetry accounting: delivered + residual == batch size") {
    forSamples(Gen.zip(Gen.chooseNum(1, 300), Gen.chooseNum(2, 10))) {
      case (n, nth) =>
        val svc = new MockDeliveryService(failEveryNth = nth, failFirstAttempts = 2)
        val batch = (1 to n).map(i => s"p-$i".getBytes(StandardCharsets.UTF_8))
        val (delivered, residual, _) = DeliverySink.putWithRetry(
          svc, "s", batch, Some(RetryPolicy(0, 6)))
        assert(delivered + residual == n)
        assert(residual == 0) // 2 failing attempts < 6 retries → all delivered
    }
  }

  test("framing round-trip: payloads split on the separator parse back") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    forSamples(Gen.listOfN(20, Gen.identifier), n = 5) { xs =>
      val settings = DeliverySettings("s")
      val df = xs.toDF("v")
      val framed = DeliverySink.payloads(df, settings, col("v"))
        .collect().map(r => new String(r.getAs[Array[Byte]](0), StandardCharsets.UTF_8))
      assert(framed.forall(_.endsWith("\n")))
      val parsed = framed.map(_.stripSuffix("\n")).toSeq
      assert(parsed.map(jsonV).sorted == xs.sorted)
    }
  }

  private def jsonV(s: String): String = {
    // payload is {"v":"<value>"} — extract without a JSON lib
    val prefix = "{\"v\":\""
    assert(s.startsWith(prefix) && s.endsWith("\"}"), s"unexpected payload: $s")
    s.substring(prefix.length, s.length - 2)
  }

  test("dedup is idempotent") {
    val dedup1 = SparkEntry.queries("q_stream_dedup")(spark, sfDir)
    assert(dedup1.count() == dedup1.distinct().count())
    assert(dedup1.groupBy("event_id").count().filter("count > 1").count() == 0)
  }

  test("dupClusters equals brute-force union-find on random near-dup corpora") {
    import spark.implicits._
    val word = Gen.oneOf("spark", "scan", "merge", "sort", "hash", "join", "row", "batch")
    val baseGen = Gen.chooseNum(6, 10).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpusGen = for {
      bases <- Gen.chooseNum(2, 4).flatMap(k => Gen.listOfN(k, baseGen))
      n <- Gen.chooseNum(8, 16)
      docs <- Gen.listOfN(n, for {
        b <- Gen.oneOf(bases)
        extra <- Gen.chooseNum(0, 2).flatMap(m => Gen.listOfN(m, word))
      } yield (b +: extra).mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

    forSamples(corpusGen, n = 6) { docs =>
      // ground truth: union-find over "share a 5-gram" OR "identical text"
      val parent = collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      def grams(t: String): Set[String] =
        t.split(' ').filter(_.nonEmpty).sliding(5).filter(_.length == 5)
          .map(_.mkString(" ")).toSet
      for {
        (ida, ta) <- docs; (idb, tb) <- docs if ida < idb
        if ta == tb || grams(ta).exists(grams(tb).contains)
      } union(ida, idb)
      val expected = docs.map { case (id, _) => id -> find(id) }.toMap

      val got = graft.ops.CurationOps
        .dupClusters(spark, docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expected, s"docs=$docs")
    }
  }

  test("Misra-Gries insert preserves mass accounting, capacity, and the decrement bound") {
    import graft.streaming.StreamingTopK
    val genCase = for {
      cap <- Gen.chooseNum(1, 6)
      nOps <- Gen.chooseNum(1, 60)
      ops <- Gen.listOfN(nOps,
        Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(1L, 12L)))
    } yield (cap, ops)
    forSamples(genCase) { case (cap, ops) =>
      var m = Map.empty[Long, Long]
      var decrs = 0L
      var n = 0L
      ops.foreach { case (k, w) =>
        val before = m.values.sum
        val (m2, d) = StreamingTopK.mgInsert(m, cap, k, w)
        // mass accounting: each decrement unit removes one unit from every
        // surviving-or-vacating counter AND absorbs one unit of the
        // arriving weight — total stored mass moves by w − d·(|table|+1)
        assert(m2.values.sum == before + w - d * (cap + 1),
          s"mass equation violated: $m + ($k,$w) -> $m2 d=$d")
        assert(m2.size <= cap)
        assert(m2.values.forall(_ > 0))
        m = m2; decrs += d; n += w
      }
      // MG guarantee: total decrements ≤ n/(capacity+1), so every key with
      // true count above that bound survives
      assert(decrs <= n / (cap + 1),
        s"decrement total $decrs exceeds n/(cap+1) = ${n / (cap + 1)}")
    }
  }

  test("knn cosine similarities are bounded and sorted descending") {
    val knn = SparkEntry.queries("q_llm_sim_knn")(spark, sfDir).collect()
    assert(knn.nonEmpty)
    assert(knn.forall { r =>
      val c = r.getAs[Double]("cos_sim"); c >= -1.0001 && c <= 1.0001
    })
    val sims = knn.map(_.getAs[Double]("cos_sim")).toSeq
    assert(sims == sims.sorted.reverse)
  }
}
