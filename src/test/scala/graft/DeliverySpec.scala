package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DeliverySettings, RetryPolicy}
import graft.streaming.{BatchResult, DeliveryService, DeliverySink,
  MockDeliveryService, RecordResult}

/** Seeded flaky-network wrapper (r11): deterministic per-call latency plus
  * whole-call failure bursts on scheduled call indexes — the reference's
  * reason to exist (delivery under a flaky network, `Firehose.scala:70-105`)
  * exercised without real egress. Call `n` (1-based) sleeps
  * `Random(seed + n).nextInt(maxLatencyMs + 1)` ms, then fails EVERY record
  * with ServiceUnavailableException when `(n - 1) % burstEvery < burstLen`,
  * else delegates to an inner [[MockDeliveryService]]. Same
  * serializable-id + static-state pattern as the mock (executor-side
  * copies and the test driver observe one shared state in local[n]). */
final class JitteryDeliveryService(
    seed: Long, maxLatencyMs: Int, burstEvery: Int, burstLen: Int)
  extends DeliveryService {

  val id: String = java.util.UUID.randomUUID().toString
  JitteryDeliveryService.states.putIfAbsent(id, new JitteryDeliveryService.State)
  val inner = new MockDeliveryService()

  private def state: JitteryDeliveryService.State =
    JitteryDeliveryService.states.get(id)

  override def putBatch(streamName: String,
      records: Seq[Array[Byte]]): BatchResult = {
    val st = state
    val n = st.calls.incrementAndGet()
    st.callNanos.add(System.nanoTime())
    val lat = new scala.util.Random(seed + n).nextInt(maxLatencyMs + 1)
    if (lat > 0) { Thread.sleep(lat.toLong); st.sleptMs.addAndGet(lat.toLong) }
    if (burstEvery > 0 && (n - 1) % burstEvery < burstLen)
      BatchResult(records.map(_ =>
        RecordResult(null, "ServiceUnavailableException")))
    else inner.putBatch(streamName, records)
  }

  def callNanos: Seq[Long] =
    { import scala.jdk.CollectionConverters._
      state.callNanos.asScala.map(_.longValue).toSeq }
  def sleptMs: Long = state.sleptMs.get()
}

object JitteryDeliveryService {
  private[graft] final class State {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val callNanos = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val sleptMs = new java.util.concurrent.atomic.AtomicLong(0L)
  }
  private val states =
    new java.util.concurrent.ConcurrentHashMap[String, State]()
}

/** R3 retry semantics (reference `Firehose.scala:70-105`): only failed
  * records are resubmitted, bounded retries, residual failures reported,
  * thrown errors not retried.
  */
class DeliverySpec extends SparkTestBase {

  private val fastRetry = Some(RetryPolicy(baseDelayMs = 1, maxRetries = 6))

  private def recs(ss: String*): Seq[Array[Byte]] =
    ss.map(_.getBytes(StandardCharsets.UTF_8))

  test("putWithRetry resubmits only the failed records") {
    // every record fails its first attempt, succeeds on resubmission
    val svc = new MockDeliveryService(failEveryNth = 1, failFirstAttempts = 1)
    val batch = recs("a", "b", "c", "d")
    val (delivered, residual, retried) =
      DeliverySink.putWithRetry(svc, "s", batch, fastRetry)
    assert(delivered == 4 && residual == 0 && retried == 4)
    assert(svc.batchSizes == Seq(4, 4)) // first attempt + one full resubmission
    assert(svc.deliveredStrings.sorted == Seq("a", "b", "c", "d"))
    batch.foreach(r => assert(svc.attemptsFor(new String(r)) == 2))
  }

  test("putWithRetry leaves residual failures after exhausting retries") {
    val svc = new MockDeliveryService(alwaysFailMarker = "poison")
    val batch = recs("ok-1", "poison-2", "ok-3", "poison-4")
    val (delivered, residual, retried) =
      DeliverySink.putWithRetry(svc, "s", batch, fastRetry)
    assert(delivered == 2 && residual == 2)
    assert(retried == 2L * 6) // the two poison records resubmitted 6 times
    // resubmissions shrink to only the failed records
    assert(svc.batchSizes == Seq(4, 2, 2, 2, 2, 2, 2))
    assert(svc.deliveredStrings.sorted == Seq("ok-1", "ok-3"))
  }

  test("putWithRetry without a policy does not retry") {
    val svc = new MockDeliveryService(failEveryNth = 1, failFirstAttempts = 1)
    val (delivered, residual, retried) =
      DeliverySink.putWithRetry(svc, "s", recs("a", "b"), None)
    assert(delivered == 0 && residual == 2 && retried == 0)
    assert(svc.batchSizes == Seq(2))
  }

  test("thrown service errors are not retried") {
    val svc = new MockDeliveryService(throwMarker = "boom")
    assertThrows[RuntimeException] {
      DeliverySink.putWithRetry(svc, "s", recs("a", "boom", "c"), fastRetry)
    }
    assert(svc.batchSizes == Seq(3)) // single attempt, no retry loop
  }

  test("retry backoff paces resubmissions through a failure burst (r11)") {
    // calls 1-2 fail entirely (burst), call 3 succeeds; policy base 40 ms.
    // The resubmission gaps must respect the exponential backoff schedule:
    // >= delayMs(1) = 40 ms before the 1st retry, >= delayMs(2) = 80 ms
    // before the 2nd — the reference's backoff contract
    // (ProducerSettings.scala:82) under an actual outage window.
    val svc = new JitteryDeliveryService(seed = 7L, maxLatencyMs = 0,
      burstEvery = 1000, burstLen = 2)
    val policy = Some(RetryPolicy(baseDelayMs = 40L, maxRetries = 6))
    val batch = recs("j-1", "j-2", "j-3")
    val (delivered, residual, retried) =
      DeliverySink.putWithRetry(svc, "s", batch, policy)
    assert(delivered == 3 && residual == 0)
    assert(retried == 6L, "both burst calls resubmit the full batch")
    val t = svc.callNanos
    assert(t.length == 3, s"expected 3 calls, saw ${t.length}")
    val g1 = (t(1) - t(0)) / 1e6
    val g2 = (t(2) - t(1)) / 1e6
    // Thread.sleep guarantees at-least semantics; 5 ms granularity slack
    assert(g1 >= 35.0, s"1st retry after $g1 ms, backoff says >= 40")
    assert(g2 >= 75.0, s"2nd retry after $g2 ms, backoff says >= 80")
    assert(svc.inner.deliveredStrings.sorted == Seq("j-1", "j-2", "j-3"))
  }

  test("deliver() under seeded jitter + bursts: all records land, bounded degradation (r11)") {
    import spark.implicits._
    // every 7th call is an outage, every call carries 0-5 ms seeded
    // latency — the flaky-network regime the reference exists for
    val svc = new JitteryDeliveryService(seed = 42L, maxLatencyMs = 5,
      burstEvery = 7, burstLen = 1)
    val settings = DeliverySettings("s", batchSize = 100, parallelism = 4,
      retryPolicy = Some(RetryPolicy(baseDelayMs = 5L, maxRetries = 6)))
    val df = (1 to 2000).map(i => s"jit-$i").toDF("v")
    val t0 = System.nanoTime()
    val stats = DeliverySink.deliver(
      DeliverySink.payloads(df, settings), settings, svc)
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    // nothing lost: bursts are transient, retries drain them completely
    assert(stats.records == 2000 && stats.residualFailures == 0)
    assert(stats.retriedRecords > 0, "bursts never hit — scenario is vacuous")
    assert(svc.inner.delivered.size == 2000)
    // degradation bound: the injected latency budget is ~25 x 2.5 ms plus
    // a few 5-10 ms backoffs — throughput must stay above a conservative
    // floor even on a contended box (idle this is < 1 s end to end)
    assert(elapsedSec < 20.0, s"took $elapsedSec s for 2000 records")
    assert(2000.0 / elapsedSec >= 100.0,
      s"throughput ${2000.0 / elapsedSec}/s under jitter below floor")
  }

  test("deliver() chunks a DataFrame into <=batchSize requests across tasks") {
    import spark.implicits._
    val svc = new MockDeliveryService()
    val settings = DeliverySettings("s", batchSize = 100, parallelism = 2,
      retryPolicy = fastRetry)
    val df = (1 to 1050).map(i => s"rec-$i").toDF("v")
    val stats = DeliverySink.deliver(
      DeliverySink.payloads(df, settings), settings, svc)
    assert(stats.records == 1050 && stats.residualFailures == 0)
    assert(svc.batchSizes.forall(_ <= 100))
    assert(svc.batchSizes.sum == 1050)
    assert(stats.batches == svc.batchSizes.size.toLong)
    assert(svc.delivered.size == 1050)
    // framing: every payload ends with the separator
    assert(svc.deliveredStrings.forall(_.endsWith("\n")))
  }
}
