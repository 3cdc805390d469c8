package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DeliverySettings, RetryPolicy}
import graft.streaming.{DeliverySink, MockDeliveryService}

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
