package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-table sensitivity sweep for the LSH bucket caps (SURVEY §2B /
  * SCALING.md): the keep-first-K mega-bucket caps (MinHash `MaxBucket=50`,
  * embedding `MaxEmbBucket=200`) bound per-bucket pair work at K² on ANY
  * corpus, at the cost of recall inside over-cap buckets. This main
  * MEASURES that trade on the sf0.01 fixtures so the constants are an
  * engineering choice with a recorded curve, not folklore:
  *
  *   - MinHash: candidate-pair retention at each cap vs the uncapped
  *     candidate set (the pairs the cap throws away are exactly the
  *     over-cap-bucket ones);
  *   - semdedup (single- and multi-probe): retained drop-verdicts at each
  *     cap vs the uncapped verdict set — verdict-level, the relation a
  *     pipeline actually consumes.
  *
  * `runMain graft.CapSweep [sfDir]` — prints one table; takes ~a minute.
  */
object CapSweep {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val caps = Seq(10, 25, 50, 100, 200, 400)

    val docs = ops.table(spark, sfDir, "documents")
    val minhashFull = ops.LlmOps.candidatePairs(docs, Int.MaxValue)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[cap-sweep] minhash uncapped candidate pairs: ${minhashFull.size}")
    caps.foreach { cap =>
      val got = ops.LlmOps.candidatePairs(docs, cap)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[cap-sweep] minhash cap=$cap%4d pairs=${got.size}%6d " +
        f"retention=${if (minhashFull.isEmpty) 1.0 else got.size.toDouble / minhashFull.size}%.4f")
    }

    // candidate RETENTION above is a volume curve (what the cap discards
    // is dominated by mega-bucket noise pairs); TRUE-pair recall needs an
    // exact ground truth, affordable at sf0.001 (500 docs): fraction of
    // exact-Jaccard >= J pairs still emitted as candidates at each cap
    val gtDir = "/root/testdata/sf0.001"
    val toks = ops.table(spark, gtDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(' ').filter(_.nonEmpty).toSet))
      .sortBy(_._1)
    def truePairs(minJ: Double): Set[(Long, Long)] = (for {
      i <- toks.indices.iterator
      j <- (i + 1) until toks.length
      (ida, ta) = toks(i); (idb, tb) = toks(j)
      inter = ta.count(tb.contains)
      if inter > 0 && inter.toDouble / (ta.size + tb.size - inter) >= minJ
    } yield (ida, idb)).toSet
    val gtDocs = ops.table(spark, gtDir, "documents")
    for (minJ <- Seq(0.9, 0.7)) {
      val gt = truePairs(minJ)
      caps.foreach { cap =>
        val got = ops.LlmOps.candidatePairs(gtDocs, cap)
          .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val hit = gt.count(got.contains)
        println(f"[cap-sweep] minhash TRUE recall@J>=$minJ cap=$cap%4d " +
          f"${if (gt.isEmpty) 1.0 else hit.toDouble / gt.size}%.4f (${gt.size} true pairs)")
      }
    }

    val emb = ops.AnnOps.embDouble(spark, sfDir)
    def drops(mp: Boolean, cap: Int): Set[Long] = {
      val df = if (mp) ops.AnnOps.semdedupMultiProbeVerdicts(spark, emb, cap = cap)
        else ops.AnnOps.semdedupVerdicts(spark, emb, cap = cap)
      df.where(!col("keep")).collect().map(_.getLong(0)).toSet
    }
    for (mp <- Seq(false, true)) {
      val tag = if (mp) "semdedup-mp" else "semdedup"
      val full = drops(mp, Int.MaxValue)
      println(f"[cap-sweep] $tag uncapped drops: ${full.size}")
      caps.foreach { cap =>
        val got = drops(mp, cap)
        println(f"[cap-sweep] $tag%-11s cap=$cap%4d drops=${got.size}%5d " +
          f"retention=${if (full.isEmpty) 1.0 else got.size.toDouble / full.size}%.4f")
      }
    }
    spark.stop()
  }
}
