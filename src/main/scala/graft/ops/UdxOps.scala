package graft.ops

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** User-defined function surface (SURVEY §2B "UDF / UDAF / UDTF").
  *
  * - `q_udf_serializer`: the reference's `Serializer` typeclass
  *   (`Serializer.scala:24-34`) as a scalar UDF framing a row to a payload
  *   (upgrade path if UDF overhead ever shows in BENCH: a codegen'd Catalyst
  *   `Expression`, SURVEY §4.2).
  * - `q_udaf_weighted`: typed `Aggregator` registered via `udaf`; the buffer
  *   accumulates exact `BigDecimal`s so the result is order-independent and
  *   bit-matches the DuckDB decimal oracle.
  * - `q_udtf_explode`: generator (Catalyst `Generate`) via explode/split.
  */
object UdxOps extends QueryModule {

  /** Weighted average of price by quantity, exact-decimal buffer.
    * `private[graft]`, not `private`: Janino-generated encoder code lives in
    * the default package and cannot resolve methods on a JVM-private inner
    * class — `private` made every buffer (de)serialization fall back to the
    * interpreted projection (logged `compilerError` per task). `private[X]`
    * erases to public in bytecode, so codegen works.
    */
  private[graft] case class WBuf(sumPQ: BigDecimal, sumQ: BigDecimal)

  private object WeightedAvg extends Aggregator[(Double, Double), WBuf, Double] {
    def zero: WBuf = WBuf(BigDecimal(0), BigDecimal(0))
    def reduce(b: WBuf, pq: (Double, Double)): WBuf = {
      val (price, qty) = pq
      // 2-dec × 2-dec inputs → the exact product has ≤4 decimals, and
      // BigDecimal.valueOf(double) (shortest repr) recovers it exactly.
      WBuf(b.sumPQ + BigDecimal(java.math.BigDecimal.valueOf(price * qty)),
        b.sumQ + BigDecimal(java.math.BigDecimal.valueOf(qty)))
    }
    def merge(a: WBuf, b: WBuf): WBuf = WBuf(a.sumPQ + b.sumPQ, a.sumQ + b.sumQ)
    def finish(b: WBuf): Double =
      if (b.sumQ == 0) 0.0 else b.sumPQ.toDouble / b.sumQ.toDouble
    def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def queries: Seq[(String, Q)] = Seq(
    "q_udf_serializer" -> ((s: SparkSession, dir: String) => {
      val frame = udf { (id: Long, typ: String, props: String) =>
        s"$id|$typ|$props\n"
      }
      table(s, dir, "events")
        .withColumn("payload", frame(col("event_id"), col("event_type"), col("props")))
        .select(col("event_id"),
          asLong(length(col("payload"))).as("payload_len"),
          sha2(col("payload"), 256).as("payload_sha"))
        .orderBy("event_id")
    }),

    "q_udaf_weighted" -> ((s: SparkSession, dir: String) => {
      val wavg = udaf(WeightedAvg)
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("w_avg_price"))
        .orderBy("l_returnflag")
    }),

    "q_udtf_explode" -> ((s: SparkSession, dir: String) =>
      table(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .where(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("token"))
        .limit(50)),

    // Custom Catalyst Generator: word 3-gram shingles streamed per row
    // (graft.functions.ShingleGenerator), reduced to per-doc counts.
    "q_udtf_shingles" -> ((s: SparkSession, dir: String) => {
      graft.functions.GraftFunctions.register(s)
      table(s, dir, "documents")
        .select(col("doc_id"), call_function("shingles", col("text"), lit(3)))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          count_distinct(col("shingle")).as("n_distinct"))
        .orderBy("doc_id")
    })
  )

  def oracle: Seq[(String, String)] = Seq(
    "q_udf_serializer" ->
      """WITH f AS (
        |  SELECT event_id,
        |         concat_ws('|', event_id, event_type, props) || chr(10) AS payload
        |  FROM events)
        |SELECT event_id,
        |       CAST(length(payload) AS BIGINT) AS payload_len,
        |       sha256(payload) AS payload_sha
        |FROM f ORDER BY event_id""".stripMargin,

    "q_udaf_weighted" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |         / CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS w_avg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_udtf_explode" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 50""".stripMargin,

    "q_udtf_shingles" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, toks,
        |         unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
        |  FROM t),
        |g AS (
        |  SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
        |  FROM s)
        |SELECT doc_id, count(*) AS n_shingles,
        |       count(DISTINCT shingle) AS n_distinct
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
