package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (SURVEY "Optimize for scale": skewed keys →
  * salting or AQE skew-join).
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting is
  * the deterministic fallback when one key dominates so heavily that even a
  * split partition is one task's worth of a single key. The pattern:
  * replicate the build side S× (one copy per salt), spread the probe side
  * across salts with a deterministic hash of a row-unique column, join on
  * (key, salt). Row multiplicity is unchanged, so any downstream aggregate
  * is exactly the unsalted result.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `leftKey == rightKey`, salted `salts` ways.
    *
    * @param saltSource a row-unique (or near-unique) column on `left` used to
    *                   derive the deterministic salt — NOT `rand()`, so plans
    *                   stay reproducible and retry-safe.
    */
  /** Join types whose output multiplicity survives build-side replication:
    * an unmatched right row under right/full outer would otherwise emit one
    * null-padded row per salt replica. */
  private val SafeJoinTypes = Set("inner", "left", "left_outer", "leftouter")

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      saltSource: Column,
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports ${SafeJoinTypes.mkString("/")} only: " +
        "replicating the build side breaks right/full-outer multiplicity")
    val salted = left.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
        salted("__salt") === replicated("__salt")
          && salted(leftKey) === replicated(rightKey),
        joinType)
      .drop("__salt")
  }
}
