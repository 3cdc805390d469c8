package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale-up probe: materializes a key-shifted ×10 copy of the sf0.1
  * fixtures (≈6M lineitem rows, 1M events, 50k docs with 10 exact
  * duplicates each) under /tmp and re-runs the heavy queries, so "would
  * this plan survive a scale-up" is measured, not asserted. Results are
  * recorded in SCALING.md.
  *
  * Key shifting keeps referential integrity: copy i shifts o_orderkey /
  * l_orderkey by i·KeyStride (join keys still match), custkeys/partkeys
  * untouched (dims unchanged, join fan-in grows ×10 — deliberately the
  * harder case). events get new event_ids per copy but keep user_ids;
  * documents get new doc_ids so the near-dup path faces real duplicates.
  */
object ScaleProbe {
  private val KeyStride = 100000000L

  def main(args: Array[String]): Unit = {
    val srcDir = "/root/testdata/sf0.1"
    val outDir = args.headOption.getOrElse("/tmp/graft-sfbig")
    val copies = 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame, shift: Map[String, Long]): DataFrame =
      (0 until copies).map { i =>
        shift.foldLeft(df) { case (d, (c, stride)) =>
          d.withColumn(c, col(c) + lit(i * stride))
        }
      }.reduce(_.union(_))

    // completion marker written only after ALL tables land — a run killed
    // mid-generation regenerates from scratch instead of probing stale
    // data; the marker carries a content key over EVERY source table (the
    // probe copies all ten), so regenerating any of them invalidates the
    // ×10 copy
    val srcKey = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      .map(t => graft.ops.SourceSinkOps.fixtureKey(srcDir, s"$t.parquet"))
      .mkString("-")
    val doneMarker = new java.io.File(s"$outDir/_GRAFT_ALL_TABLES")
    val fresh = doneMarker.exists() &&
      java.nio.file.Files.readString(doneMarker.toPath) == srcKey
    if (!fresh) {
      println(s"[scale] generating ×$copies fixtures under $outDir")
      val t0 = System.nanoTime()
      replicate(ops.table(spark, srcDir, "lineitem"), Map("l_orderkey" -> KeyStride))
        .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
      replicate(ops.table(spark, srcDir, "orders"), Map("o_orderkey" -> KeyStride))
        .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
      // events: keep the raw-ns-long ts representation the loader expects
      replicate(
        ops.table(spark, srcDir, "events")
          .withColumn("ts", unix_micros(col("ts")) * 1000),
        Map("event_id" -> KeyStride))
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
      replicate(ops.table(spark, srcDir, "documents"), Map("doc_id" -> KeyStride))
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      replicate(ops.table(spark, srcDir, "embeddings"), Map("vec_id" -> KeyStride))
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      for (t <- Seq("region", "nation", "customer", "supplier", "part"))
        ops.table(spark, srcDir, t).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      java.nio.file.Files.writeString(doneMarker.toPath, srcKey)
      println(f"[scale] generated in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val probes = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q_agg_basic", "q_join_multiway", "q_join_asof", "q_join_asof_fwd",
      "q_join_interval", "q_topk_group", "q_win_running", "q_sub_scalar",
      "q_scan_parquet", "q_sink_batchify", "q_stream_session",
      "q_stream_delivery_report", "q_llm_exact_dedup", "q_llm_minhash",
      "q_llm_ngram_jaccard", "q_text_langid", "q_udtf_shingles",
      "q_llm_sim_knn", "q_llm_sim_knn_lsh", "q_llm_sim_knn_ivf",
      "q_llm_embed_neardup", "q_llm_dup_clusters", "q_llm_simhash_neardup",
      "q_text_tfidf", "q_llm_dedup_keep_best", "q_llm_corpus_curate",
      "q_mm_embed_knn", "q_mm_neardup", "q_llm_sim_knn_ivf2",
      "q_llm_contamination", "q_funnel_steps", "q_retention_cohort")
    // warmup
    SparkEntry.queries("q_agg_basic")(spark, outDir).count()
    val results = probes.map { name =>
      val t0 = System.nanoTime()
      val n = try SparkEntry.queries(name)(spark, outDir).count()
        catch { case e: Throwable =>
          println(s"[scale] $name FAILED: ${e.getMessage}"); -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $name%-28s ${dt}%7.2f s  rows=$n")
      (name, dt, n)
    }
    println(f"[scale] TOTAL ${results.map(_._2).sum}%.1f s over ${results.size} probes")
    streamingProbe(spark, outDir)
    spark.stop()
  }

  /** Streaming-path probe: the full DeliverySink.run pipeline (file source →
    * micro-batch → frame → ≤500-record chunks → submit) over the ×10 events
    * fixture (~1M records), against a no-op accepting service so the number
    * measures ENGINE throughput (serialization, chunking, lane repartition),
    * not mock bookkeeping. Records/s lands in SCALING.md.
    */
  private def streamingProbe(spark: SparkSession, outDir: String): Unit = {
    import graft.core.DeliverySettings
    import graft.streaming.{BatchResult, DeliveryService, DeliverySink, RecordResult}
    val evDir = s"$outDir/events.parquet"
    // direct parquet read is safe HERE only because this dir is ScaleProbe's
    // own output, written with ts as a raw µs-derived long (see the
    // generation step above) — the CLAUDE.md "events via ops.table only"
    // rule targets the driver fixtures, whose ts is ns-precision parquet
    val schema = spark.read.parquet(evDir).schema
    val source = spark.readStream.schema(schema).parquet(evDir)
      .select("event_id", "user_id", "event_type", "value")
    val acceptAll = new DeliveryService {
      override def putBatch(streamName: String,
          records: Seq[Array[Byte]]): BatchResult =
        BatchResult(records.map(_ => RecordResult("ok", null)))
    }
    val settings = DeliverySettings("scale-probe", triggerIntervalMs = 0L,
      parallelism = 32)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scale-ckpt").toString
    val t0 = System.nanoTime()
    val (query, stats) = DeliverySink.run(source, settings, acceptAll, ckpt)
    try query.processAllAvailable() finally query.stop()
    val dt = (System.nanoTime() - t0) / 1e9
    val st = stats()
    println(f"[scale] streaming_delivery          ${dt}%7.2f s  " +
      f"records=${st.records} batches=${st.batches} " +
      f"rate=${st.records / dt}%.0f rec/s residual=${st.residualFailures}")
  }
}
