package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.util.LongAccumulator

import graft.core.{DeliverySettings, RetryPolicy, Serializers}

/** Streaming delivery pipeline — the engine's realization of the reference's
  * flagship `produce(settings)` pipe (reference `firehose.scala:67-80`):
  *
  *   - micro-batch boundary: Spark's Structured Streaming planner +
  *     `Trigger.ProcessingTime(triggerIntervalMs)` replaces fs2
  *     `groupWithin(batchSize, timeWindow)` (`firehose.scala:71`);
  *   - serialization/framing: Catalyst expressions (Serializers.framedRow ≙
  *     `firehose.scala:58-60`), evaluated on executors inside codegen;
  *   - ≤500-record request assembly: `grouped(batchSize)` per partition
  *     (`ProducerSettings.scala:61` cap);
  *   - bounded parallel submission: `repartition(parallelism)` + one
  *     in-flight request per task ≙ `mapAsync(parallelism)`
  *     (`firehose.scala:41`);
  *   - partial-failure retry: `putWithRetry` below ≙ `Firehose.scala:70-105`.
  *
  * At cluster scale nothing here is driver-bound: each executor task owns
  * its partition's chunking, submission and retries; the driver only sees
  * accumulator totals.
  */
object DeliverySink {

  /** Totals for one delivery (driver-visible via accumulators). */
  final case class DeliveryStats(
      records: Long, batches: Long, retriedRecords: Long, residualFailures: Long)

  /** R3 `putWithRetry` semantics (reference `Firehose.scala:70-105`):
    * submit; while `failedPutCount > 0` and retries remain, back off and
    * resubmit ONLY the failed records (zip request records with per-record
    * responses, keep those with null record id — `Firehose.scala:86-97`).
    * Thrown service errors are NOT retried (`Firehose.scala:81`); residual
    * failures after exhaustion are reported, never silently dropped
    * (`Firehose.scala:103`).
    *
    * @return (delivered, residualFailures, retriedRecords)
    */
  def putWithRetry(
      service: DeliveryService,
      streamName: String,
      batch: Seq[Array[Byte]],
      policy: Option[RetryPolicy]): (Long, Long, Long) = {
    val (outcomes, retried) = putWithRetryOutcomes(service, streamName, batch, policy)
    val residual = outcomes.count(_.failed).toLong
    ((batch.size - residual), residual, retried)
  }

  /** As [[putWithRetry]], but returns every record's terminal outcome
    * (plus the retried-record count) — the single implementation of the R3
    * loop; totals and per-record reports both derive from it. */
  def putWithRetryOutcomes(
      service: DeliveryService,
      streamName: String,
      batch: Seq[Array[Byte]],
      policy: Option[RetryPolicy]): (Array[RecordResult], Long) = {
    var current: Seq[(Array[Byte], Int)] = batch.zipWithIndex
    val outcome = new Array[RecordResult](batch.size)
    var res = service.putBatch(streamName, current.map(_._1))
    current.zip(res.results).foreach { case ((_, i), r) => outcome(i) = r }
    var retried = 0L
    policy.foreach { p =>
      var attempt = 0
      while (res.failedPutCount > 0 && attempt < p.maxRetries) {
        attempt += 1
        if (p.delayMs(attempt) > 0) Thread.sleep(p.delayMs(attempt))
        current = current.zip(res.results).collect { case (rec, rr) if rr.failed => rec }
        retried += current.size
        res = service.putBatch(streamName, current.map(_._1))
        current.zip(res.results).foreach { case ((_, i), r) => outcome(i) = r }
      }
    }
    (outcome, retried)
  }

  /** Deliver a bounded DataFrame of framed payloads. `df` must expose a
    * single BinaryType column (use [[payloads]] to build it). Distributed:
    * repartition to `settings.parallelism` in-flight lanes, then each task
    * chunks and submits its own partition.
    */
  def deliver(df: DataFrame, settings: DeliverySettings, service: DeliveryService): DeliveryStats = {
    val spark = df.sparkSession
    val recordsAcc = spark.sparkContext.longAccumulator("delivery.records")
    val batchesAcc = spark.sparkContext.longAccumulator("delivery.batches")
    val retriedAcc = spark.sparkContext.longAccumulator("delivery.retried")
    val residualAcc = spark.sparkContext.longAccumulator("delivery.residual")
    deliverInto(df, settings, service, recordsAcc, batchesAcc, retriedAcc, residualAcc)
    DeliveryStats(recordsAcc.value, batchesAcc.value, retriedAcc.value, residualAcc.value)
  }

  private def deliverInto(
      df: DataFrame,
      settings: DeliverySettings,
      service: DeliveryService,
      recordsAcc: LongAccumulator,
      batchesAcc: LongAccumulator,
      retriedAcc: LongAccumulator,
      residualAcc: LongAccumulator): Unit = {
    val name = settings.streamName
    val batchSize = settings.batchSize
    val policy = settings.retryPolicy
    df.repartition(settings.parallelism).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.map(_.getAs[Array[Byte]](0)).grouped(batchSize).foreach { chunk =>
          val (delivered, residual, retried) = putWithRetry(service, name, chunk, policy)
          recordsAcc.add(delivered)
          batchesAcc.add(1L)
          retriedAcc.add(retried)
          residualAcc.add(residual)
        }
    }
  }

  /** Per-record delivery outcome row — the engine's analog of the
    * reference pipe's `PutRecordBatchResult` output stream
    * (`firehose.scala:67-69`: the producer pipe *emits* results, it doesn't
    * just count them). */
  final case class DeliveryReportRow(
      payload_sha: String, payload_len: Int, delivered: Boolean, error: String)

  /** Deliver and emit one report row per record. Delivery runs inside a
    * `mapPartitions` transformation so per-record outcomes never funnel
    * through the driver; the result is eagerly materialized and persisted —
    * otherwise every downstream action (or stage recomputation) would
    * re-deliver the records. Delivery is therefore at-least-once under
    * task retry, like any side-effecting Spark stage; callers should
    * `unpersist()` the report when done.
    */
  def deliverWithReport(
      df: DataFrame,
      settings: DeliverySettings,
      service: DeliveryService): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val name = settings.streamName
    val batchSize = settings.batchSize
    val policy = settings.retryPolicy
    val report = df.repartition(settings.parallelism)
      .mapPartitions { rows =>
        rows.map(_.getAs[Array[Byte]](0)).grouped(batchSize).flatMap { chunk =>
          val (outcome, _) = putWithRetryOutcomes(service, name, chunk, policy)
          chunk.zipWithIndex.map { case (rec, i) =>
            val sha = java.security.MessageDigest.getInstance("SHA-256")
              .digest(rec).map("%02x".format(_)).mkString
            DeliveryReportRow(sha, rec.length, !outcome(i).failed,
              Option(outcome(i).errorCode).getOrElse(""))
          }
        }
      }.toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    report.count() // materialize exactly one delivery pass
    report
  }

  /** Serialize + frame source columns into the single payload column
    * expected by [[deliver]]. */
  def payloads(df: DataFrame, settings: DeliverySettings, cols: Column*): DataFrame = {
    val selected =
      if (cols.nonEmpty) cols
      else df.columns.toSeq.map(org.apache.spark.sql.functions.col)
    df.select(Serializers.framedRow(settings.separator, selected: _*).as("payload"))
  }

  /** R1 analog: per-row streaming sink via `ForeachWriter` (reference
    * `Firehose.scala:30/:65` — one synchronous `put` per record). Use only
    * for low-volume streams; the batched [[run]] path is the default. */
  def foreachWriter(settings: DeliverySettings,
      service: DeliveryService): org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] =
    new org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
      override def open(partitionId: Long, epochId: Long): Boolean = true
      override def process(row: org.apache.spark.sql.Row): Unit = {
        val payload = row.getAs[Array[Byte]](0)
        val (_, residual, _) = DeliverySink.putWithRetry(service,
          settings.streamName, Seq(payload), settings.retryPolicy)
        // a ForeachWriter has no report channel: surfacing the residual
        // failure means failing the task (Spark will retry the epoch)
        if (residual > 0)
          throw new RuntimeException(
            s"record not delivered to '${settings.streamName}' after retries")
      }
      override def close(errorOrNull: Throwable): Unit = ()
    }

  /** Run the full streaming pipeline: micro-batch the source per
    * `triggerIntervalMs` (≙ `groupWithin` time dimension), frame rows, and
    * deliver each micro-batch with retry. Stats accumulate across batches.
    */
  def run(
      source: DataFrame,
      settings: DeliverySettings,
      service: DeliveryService,
      checkpointDir: String): (StreamingQuery, () => DeliveryStats) = {
    val spark = source.sparkSession
    val recordsAcc = spark.sparkContext.longAccumulator("delivery.records")
    val batchesAcc = spark.sparkContext.longAccumulator("delivery.batches")
    val retriedAcc = spark.sparkContext.longAccumulator("delivery.retried")
    val residualAcc = spark.sparkContext.longAccumulator("delivery.residual")
    val query = source.writeStream
      .trigger(Trigger.ProcessingTime(settings.triggerIntervalMs))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        deliverInto(payloads(batch, settings), settings, service,
          recordsAcc, batchesAcc, retriedAcc, residualAcc)
      }
      .start()
    (query, () => DeliveryStats(
      recordsAcc.value, batchesAcc.value, retriedAcc.value, residualAcc.value))
  }
}
