package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Codegen'd vector expressions: agreement with the higher-order-function
  * formulation, null/edge handling, SQL registration. */
class VectorExpressionSpec extends SparkTestBase {

  private def hofCosine = {
    import org.apache.spark.sql.Column
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    (x: Column, y: Column) => dot(x, y) / (sqrt(dot(x, x)) * sqrt(dot(y, y)))
  }

  test("cosine_sim matches the aggregate/zip_with formulation on fixture vectors") {
    GraftFunctions.register(spark)
    val emb = ops.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
    val probe = emb.where(col("vec_id") === 1).select("e").head().getSeq[Double](0)
    val both = emb.select(
      call_function("cosine_sim", col("e"), typedlit(probe)).as("native"),
      hofCosine(col("e"), typedlit(probe)).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }

  test("vector_dot and cosine_sim handle nulls, zeros, and self-similarity") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(1.0, 2.0, 3.0))),
      (Some(Seq(0.0, 0.0)), Some(Seq(1.0, 1.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0)), None))
      .toDF("x", "y")
    val rows = df.select(
      call_function("vector_dot", col("x"), col("y")).as("d"),
      call_function("cosine_sim", col("x"), col("y")).as("c"))
      .collect()
    assert(rows(0).getDouble(0) == 32.0)
    assert(math.abs(rows(1).getDouble(1) - 1.0) < 1e-12)
    assert(rows(2).getDouble(1) == 0.0) // zero norm → 0.0, not NaN
    assert(rows(3).isNullAt(0) && rows(3).isNullAt(1))
    assert(rows(4).isNullAt(0) && rows(4).isNullAt(1))
  }

  test("text hash expressions: codegen/interpreted parity, kernels, nulls") {
    GraftFunctions.register(spark)
    import spark.implicits._
    import graft.functions.{ReplayableHash, TextHashes}
    import org.apache.spark.unsafe.types.UTF8String
    val samples = Seq("", "a", "hello world", "caf\u00e9 \u00fcber",
      "the quick brown fox jumps", "\ud83d\ude00 emoji pair test",
      "x" * 300)
    val df = samples.toDF("t")
    // whole-stage codegen path (the default local plan)
    def run(frame: org.apache.spark.sql.DataFrame) = frame.select(
      call_function("text_full_hash", col("t")).as("fh"),
      call_function("min_shingle_hash", col("t"), lit(8)).as("ms"),
      call_function("shingle_key", col("t")).as("sk")).collect()
    val codegen = run(df)
    // interpreted path: force codegen off for the same plan, restoring the
    // session's PRIOR values (not hardcoded defaults — the session is
    // shared across suites)
    val prevWs = spark.conf.get("spark.sql.codegen.wholeStage")
    val prevFm = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run(df) finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prevWs)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
    samples.indices.foreach { i =>
      assert(codegen(i) == interp(i), s"parity at '${samples(i).take(20)}'")
      // and both equal the static kernels / canonical constants
      val u = UTF8String.fromString(samples(i))
      assert(codegen(i).getLong(0) == ReplayableHash.tokenHash(samples(i)))
      assert(codegen(i).getLong(1) == TextHashes.minShingle(u, 8))
      assert(codegen(i).getLong(2) ==
        ReplayableHash.tokenHash(samples(i), ReplayableHash.Base) * ReplayableHash.P
          + ReplayableHash.tokenHash(samples(i), ReplayableHash.Base2))
    }
    // null propagates as null through all three
    val n = Seq(Option.empty[String]).toDF("t")
    val nr = run(n)(0)
    assert(nr.isNullAt(0) && nr.isNullAt(1) && nr.isNullAt(2))
  }

  test("expressions are registered for SQL and float arrays implicitly cast") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vector_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), array(2.0D, 3.0D)) AS d")
      .head().getDouble(0)
    assert(r == 9.0)
  }

  test("interpreted (non-codegen) eval path agrees with codegen results") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.{CosineSimilarity, VectorDot}
    val x = Literal.create(Seq(1.0, 2.0, 3.0))
    val y = Literal.create(Seq(4.0, 5.0, 6.0))
    assert(VectorDot(x, y).eval(null) == 32.0)
    val c = CosineSimilarity(x, y).eval(null).asInstanceOf[Double]
    assert(math.abs(c - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
    assert(VectorDot(Literal.create(null, x.dataType), y).eval(null) == null)
  }

  test("spark.sql.extensions injection registers the functions declaratively") {
    import org.apache.spark.sql.SparkSession
    // a fresh SparkSession over the same SparkContext, wired through the
    // same GraftExtensions class a cluster names in spark.sql.extensions
    // (the config-string path only applies at SparkContext creation, so the
    // public withExtensions hook is the testable equivalent here); no
    // imperative register() call anywhere
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]") // reuses the suite's live SparkContext
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val d = s2.sql("SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
        .head().getDouble(0)
      assert(math.abs(d - 1.0) < 1e-15)
      val sh = s2.sql("SELECT shingle FROM (SELECT 'a b c' AS t) LATERAL VIEW shingles(t, 2) AS pos, shingle")
        .collect().map(_.getString(0)).toSeq
      assert(sh == Seq("a b", "b c"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("the knn query plan uses the native expression, not HOF lambdas") {
    val plan = SparkEntry.queries("q_llm_sim_knn")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("cosine_sim"))
    assert(!plan.contains("aggregate(zip_with"))
  }
}
