package graft

import org.apache.spark.sql.functions._

import graft.functions.MinHashAgg

/** One-pass MinHash typed aggregate: determinism, partition invariance
  * (merge correctness), and agreement with a driver-side reference. */
class MinHashAggSpec extends SparkTestBase {

  test("SimHashAgg equals the expression-based bit-sum formulation") {
    import org.apache.spark.sql.functions._
    val RH = graft.functions.ReplayableHash
    val thUdf = udf((t: String) => RH.tokenHash(t))
    for (bits <- Seq(16, 64)) {
      val toks = graft.ops.LlmOps
        .docTokens(ops.table(spark, sfDir, "documents"))
        .withColumn("h", thUdf(col("token")))
      val bitSums = (0 until bits).map { b =>
        val (a, bb) = RH.SimHashParams(b)
        sum(((col("h") * lit(a) + lit(bb)) % lit(RH.P) % 2) * 2 - 1).as(s"s$b")
      }
      val viaColumns = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"),
          (0 until bits).map { b =>
            when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
          }.reduce(_ + _).as("simhash"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val viaAgg = graft.ops.LlmOps
        .simhashSigs(ops.table(spark, sfDir, "documents"), bits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(viaAgg == viaColumns, s"bits=$bits")
    }
  }

  test("SimHashAgg is partition-invariant (merge is correct)") {
    import org.apache.spark.sql.functions._
    val a = graft.ops.LlmOps
      .simhashSigs(ops.table(spark, sfDir, "documents").repartition(1), 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = graft.ops.LlmOps
      .simhashSigs(ops.table(spark, sfDir, "documents").repartition(13), 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("signatures are partition-invariant (merge is correct)") {
    import spark.implicits._
    val sketch = udaf(new MinHashAgg(16))
    val toks = ops.table(spark, sfDir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
    def sigs(parts: Int) = toks.repartition(parts)
      .groupBy("doc_id").agg(sketch(col("token")).as("sig"))
      .select(col("doc_id"), col("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val a = sigs(2)
    val b = sigs(7)
    assert(a == b)
    assert(a.values.forall(_.length == 16))
  }

  test("aggregate matches a driver-side single-threaded reference") {
    val agg = new MinHashAgg(8)
    val tokens = Seq("spark", "join", "window", "spark", "batch")
    val viaReduce = tokens.foldLeft(agg.zero)((b, t) => agg.reduce(b, t)).toSeq
    // split + merge must give the same result
    val (l, r) = tokens.splitAt(2)
    val viaMerge = agg.merge(
      l.foldLeft(agg.zero)((b, t) => agg.reduce(b, t)),
      r.foldLeft(agg.zero)((b, t) => agg.reduce(b, t))).toSeq
    assert(viaReduce == viaMerge)
    // duplicate tokens do not change a min-sketch
    val dedup = tokens.distinct.foldLeft(agg.zero)((b, t) => agg.reduce(b, t)).toSeq
    assert(viaReduce == dedup)
  }

  test("q_llm_minhash_sketch produces a full signature per document") {
    val df = SparkEntry.queries("q_llm_minhash_sketch")(spark, sfDir)
    assert(df.where(col("k") =!= 16).count() == 0)
    assert(df.count() == 500)
  }
}
