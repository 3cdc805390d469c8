package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.core.{DeliverySettings, RetryPolicy}
import graft.streaming.{DeliverySink, MockDeliveryService}

/** End-to-end file-source streaming: a JSON drop directory consumed by
  * readStream, deduplicated under a watermark, framed and delivered with
  * retry — the full reference pipeline (source → groupWithin-style
  * micro-batches → serialize ⧺ separator → ≤500 batches → retry) against a
  * real file source instead of MemoryStream.
  */
class FileStreamSpec extends SparkTestBase {

  test("json drop directory → dedup → framed delivery with retry") {
    val srcDir = Files.createTempDirectory("graft-drop").toString
    val ckpt = Files.createTempDirectory("graft-fs-ckpt").toString

    def drop(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(srcDir, name),
        lines.mkString("\n").getBytes("UTF-8"))

    // first file: 30 events, ids 0..29, with id 5 duplicated at-least-once
    drop("batch1.json",
      (0 to 29).map(i => s"""{"event_id":$i,"ts":"2024-01-01 00:0${i % 10}:00","v":${i * 1.5}}""")
        :+ """{"event_id":5,"ts":"2024-01-01 00:05:00","v":7.5}""")

    val source = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, v DOUBLE")
      .json(srcDir)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")

    val svc = new MockDeliveryService(failEveryNth = 3, failFirstAttempts = 1)
    val settings = DeliverySettings("file-stream", batchSize = 25,
      triggerIntervalMs = 0L, retryPolicy = Some(RetryPolicy(1, 6)))
    val (query, stats) = DeliverySink.run(source, settings, svc, ckpt)
    try {
      query.processAllAvailable()
      val st1 = stats()
      assert(st1.records == 30, s"expected 30 deduped records, got $st1")
      assert(st1.residualFailures == 0)

      // second file arrives: 10 more events plus a replay of id 7
      drop("batch2.json",
        (30 to 39).map(i => s"""{"event_id":$i,"ts":"2024-01-01 00:30:00","v":$i}""")
          :+ """{"event_id":7,"ts":"2024-01-01 00:07:00","v":10.5}""")
      query.processAllAvailable()
      val st2 = stats()
      assert(st2.records == 40, s"expected 40 total after second file, got $st2")
      assert(svc.batchSizes.forall(_ <= 25))
      assert(svc.deliveredStrings.forall(_.endsWith("\n")))
    } finally query.stop()
  }

  test("streaming curation: content-hash dedup + quality gate before delivery") {
    val srcDir = Files.createTempDirectory("graft-cur-drop").toString
    val ckpt = Files.createTempDirectory("graft-cur-ckpt").toString
    def doc(id: Long, text: String) =
      s"""{"doc_id":$id,"text":"$text","n_chars":${text.length}}"""
    // two exact duplicates (same text), one low-quality doc (no stopwords,
    // short), two good docs
    val good1 = "the quick brown fox jumps over the lazy dog and runs to the hills " * 8
    val good2 = "a stitch in time saves nine and the early bird catches the worm here " * 8
    Files.write(Paths.get(srcDir, "d1.json"), Seq(
      doc(1, good1.trim), doc(2, good1.trim), doc(3, "xyzzy plugh"),
      doc(4, good2.trim)
    ).mkString("\n").getBytes("UTF-8"))

    val quality =
      expr("size(filter(split(text, ' '), t -> t IN ('the','a','and','of','to')))")
        .cast("double") / size(split(col("text"), " ")) * 0.5 +
        least(lit(1.0), col("n_chars") / 500.0) * 0.5
    val source = spark.readStream
      .schema("doc_id LONG, text STRING, n_chars LONG")
      .json(srcDir)
      .withColumn("text_sha", sha2(col("text"), 256))
      .dropDuplicates("text_sha")
      .where(quality >= 0.25)
      .select("doc_id", "text")

    val svc = new MockDeliveryService()
    val settings = DeliverySettings("curated", batchSize = 100,
      triggerIntervalMs = 0L, retryPolicy = Some(RetryPolicy(1, 3)))
    val (query, stats) = DeliverySink.run(source, settings, svc, ckpt)
    try {
      query.processAllAvailable()
      val st = stats()
      // doc 2 collapses into doc 1 (same sha), doc 3 fails the gate
      assert(st.records == 2, s"expected 2 curated records, got $st")
      assert(st.residualFailures == 0)
      assert(svc.delivered.size == 2)
    } finally query.stop()
  }

  test("streaming scrub: sensitive terms are redacted before delivery") {
    val srcDir = Files.createTempDirectory("graft-scrub-drop").toString
    val ckpt = Files.createTempDirectory("graft-scrub-ckpt").toString
    Files.write(Paths.get(srcDir, "d1.json"), Seq(
      """{"doc_id":1,"text":"the customer bought a vector of things"}""",
      """{"doc_id":2,"text":"nothing to hide here"}""",
      """{"doc_id":3,"text":"key customer key"}"""
    ).mkString("\n").getBytes("UTF-8"))

    // the same scan-side scrub expression the batch q_text_scrub runs,
    // applied inside readStream before framing — redaction composes with
    // the delivery pipeline because it is pure column math
    val source = spark.readStream
      .schema("doc_id LONG, text STRING")
      .json(srcDir)
      .withColumn("text",
        regexp_replace(col("text"),
          graft.ops.TextOps.SensitivePattern, graft.ops.TextOps.Redaction))
      .select("doc_id", "text")

    val svc = new MockDeliveryService()
    val settings = DeliverySettings("scrubbed", batchSize = 10,
      triggerIntervalMs = 0L, retryPolicy = Some(RetryPolicy(1, 3)))
    val (query, stats) = DeliverySink.run(source, settings, svc, ckpt)
    try {
      query.processAllAvailable()
      assert(stats().records == 3)
      val payloads = svc.deliveredStrings
      assert(payloads.size == 3)
      // no sensitive term survives into any delivered payload
      val pat = graft.ops.TextOps.SensitivePattern.r
      payloads.foreach(p => assert(pat.findFirstIn(p).isEmpty, s"leak in: $p"))
      assert(payloads.exists(_.contains("[REDACTED]")))
      assert(payloads.exists(_.contains("nothing to hide here")))
    } finally query.stop()
  }

  test("checkpoint restart does not re-deliver committed files") {
    val srcDir = Files.createTempDirectory("graft-drop2").toString
    val ckpt = Files.createTempDirectory("graft-rs-ckpt").toString

    def drop(name: String, ids: Range): Unit =
      Files.write(Paths.get(srcDir, name),
        ids.map(i => s"""{"event_id":$i,"v":$i}""").mkString("\n").getBytes("UTF-8"))

    def source = spark.readStream.schema("event_id LONG, v DOUBLE").json(srcDir)
    val svc = new MockDeliveryService()
    val settings = DeliverySettings("restart", batchSize = 100,
      triggerIntervalMs = 0L, retryPolicy = Some(RetryPolicy(1, 3)))

    drop("f1.json", 0 until 50)
    val (q1, _) = DeliverySink.run(source, settings, svc, ckpt)
    try { q1.processAllAvailable() } finally q1.stop()
    assert(svc.delivered.size == 50)

    // new file arrives while the query is down; restart from the same
    // checkpoint must deliver ONLY the new file (source offsets committed)
    drop("f2.json", 50 until 70)
    val (q2, _) = DeliverySink.run(source, settings, svc, ckpt)
    try { q2.processAllAvailable() } finally q2.stop()
    assert(svc.delivered.size == 70,
      s"expected 70 after restart (no re-delivery), got ${svc.delivered.size}")
  }
}
