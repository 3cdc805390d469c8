package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Custom Generator expression: row fan-out semantics and edge cases. */
class ShingleGeneratorSpec extends SparkTestBase {

  test("shingles(text, n) streams positional n-grams") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq("a b c d", "x y", "", "solo")
      .toDF("text")
      .select(col("text"), call_function("shingles", col("text"), lit(3)))
      .as[(String, Long, String)].collect().toSet
    assert(rows == Set(
      ("a b c d", 0L, "a b c"),
      ("a b c d", 1L, "b c d")))
    // "x y" (< n tokens), "" and "solo" generate nothing
  }

  test("shingles handles repeated separators and nulls") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Some("a  b   c"), None).toDF("text")
      .select(call_function("shingles", col("text"), lit(2)))
    val got = df.as[(Long, String)].collect().toSet
    assert(got == Set((0L, "a b"), (1L, "b c"))) // empty tokens dropped
  }

  test("generator agrees with the array-built-ins formulation on fixtures") {
    GraftFunctions.register(spark)
    val docs = ops.table(spark, sfDir, "documents")
    val viaGen = docs
      .select(col("doc_id"), call_function("shingles", col("text"), lit(3)))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val viaArrays = docs
      .withColumn("toks", expr("filter(split(text, ' '), x -> length(x) > 0)"))
      .select(col("doc_id"),
        greatest(size(col("toks")) - 2, lit(0)).cast("long").as("n_arr"))
    val joined = viaGen.join(viaArrays, "doc_id")
      .where(col("n") =!= col("n_arr"))
    assert(joined.count() == 0)
  }
}
