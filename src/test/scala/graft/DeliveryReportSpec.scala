package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.{DeliverySettings, RetryPolicy}
import graft.streaming.{DeliverySink, MockDeliveryService}

/** Per-record delivery reports (the reference pipe's result-stream analog),
  * the R1 ForeachWriter path, and AvailableNow batch-drain semantics. */
class DeliveryReportSpec extends SparkTestBase {

  test("deliverWithReport emits one terminal outcome row per record") {
    import spark.implicits._
    val svc = new MockDeliveryService(alwaysFailMarker = "poison")
    val settings = DeliverySettings("s", batchSize = 10,
      retryPolicy = Some(RetryPolicy(0, 2)))
    val df = ((1 to 23).map(i => s"ok-$i") :+ "poison-x").toDF("v")
    val report = DeliverySink.deliverWithReport(
      DeliverySink.payloads(df, settings, col("v")), settings, svc)
    val rows = report.collect()
    assert(rows.length == 24)
    assert(rows.count(_.getAs[Boolean]("delivered")) == 23)
    val failed = rows.filter(!_.getAs[Boolean]("delivered"))
    assert(failed.length == 1)
    assert(failed.head.getAs[String]("error") == "ServiceUnavailableException")
    assert(rows.forall(_.getAs[String]("payload_sha").length == 64))
    assert(rows.forall(_.getAs[Int]("payload_len") > 0))
  }

  test("ForeachWriter path delivers row-at-a-time with retry") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val svc = new MockDeliveryService(failEveryNth = 1, failFirstAttempts = 1)
    val settings = DeliverySettings("s", retryPolicy = Some(RetryPolicy(1, 3)))
    val framed = DeliverySink.payloads(input.toDF(), settings)
    val query = framed.writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-fw").toString)
      .foreach(DeliverySink.foreachWriter(settings, svc))
      .start()
    try {
      input.addData("a", "b", "c")
      query.processAllAvailable()
      assert(svc.delivered.size == 3)
      assert(svc.batchSizes.forall(_ == 1)) // single-record puts (R1)
    } finally query.stop()
  }

  test("Trigger.AvailableNow drains the source then stops") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    input.addData((1 to 7).map(i => s"d-$i"): _*)
    val svc = new MockDeliveryService()
    val settings = DeliverySettings("s", batchSize = 3,
      retryPolicy = Some(RetryPolicy(1, 2)))
    val query = DeliverySink.payloads(input.toDF(), settings).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("graft-an").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        DeliverySink.deliver(batch, settings, svc): Unit
      }
      .start()
    query.awaitTermination(60000)
    assert(!query.isActive) // AvailableNow terminates after draining
    assert(svc.delivered.size == 7)
    assert(svc.batchSizes.forall(_ <= 3))
  }
}
