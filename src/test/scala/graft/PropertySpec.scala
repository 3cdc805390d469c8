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
