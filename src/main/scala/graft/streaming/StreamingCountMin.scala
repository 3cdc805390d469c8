package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.ReplayableHash
import graft.ops.DiagOps

/** Streaming Count-Min sketch over an unbounded keyed stream — the
  * streaming twin of batch `q_agg_countmin`, next to StreamingTopK in the
  * bounded-state summary family.
  *
  * Where StreamingTopK keeps the MG *candidate table* (which keys are
  * frequent), Count-Min answers point *frequency* queries for ANY key with
  * the textbook overestimate guarantee. State is one counter per touched
  * sketch cell: ≤ depth × (2·width − 1) = 4 × 1,023 groups FOREVER
  * (≤ depth × width = 2,048 when every key is non-negative — the column
  * hash is remainder-signed, see [[cellIds]]), regardless of stream length
  * or key cardinality — the same deterministic `ReplayableHash` affine
  * rows (salt 11) AND the same remainder arithmetic as the batch sketch,
  * so after any prefix of the stream the cell table EQUALS the batch
  * sketch of the rows seen so far and point estimates agree exactly for
  * any LONG key, negative included (StreamingCountMinSpec pins both
  * against q_agg_countmin and a mixed-sign driver replay).
  *
  * Each micro-batch pre-aggregates arrivals per cell (one state update per
  * touched cell, not per row) and emits the touched cells' running counts
  * under a bumped per-cell version; [[latestCells]] reduces an
  * append-everything sink to the current cell table, and [[estimates]]
  * answers point queries with the min-over-rows read.
  */
object StreamingCountMin {

  final case class CellCount(cell: Int, version: Long, cnt: Long)
  final case class CellState(version: Long, cnt: Long)

  /** Scan-side fan-out of a LONG key column to its [[DiagOps.CmDepth]]
    * cell ids — the SAME arithmetic as the batch sketch (and the % the
    * DuckDB twin replays): `((a·(key % P) + b) % P) % width` with the
    * REMAINDER operator, affine row params from salt 11, mod-P before
    * multiply. Remainder (not pmod) is load-bearing: for negative keys (a
    * key space the repo uses — round-8 synthetic ids are negative) the
    * batch formula yields a NEGATIVE column hash, and matching it exactly
    * is what keeps the cell table equal to the batch sketch for ANY key.
    * The flat encoding `h + (2r+1)·width` keeps per-row id ranges disjoint
    * over the full remainder range h ∈ (−width, width). */
  private[graft] def cellIds(key: Column): Column = {
    val P = ReplayableHash.P
    val cells = ReplayableHash.CountMinParams.take(DiagOps.CmDepth).zipWithIndex
      .map { case ((a, b), r) =>
        (((lit(a) * (key % lit(P)) + lit(b)) % lit(P)) % lit(DiagOps.CmWidth)
          + lit((2 * r + 1) * DiagOps.CmWidth)).cast("int")
      }
    array(cells: _*)
  }

  /** The per-cell state update behind [[cells]], exposed for deterministic
    * unit testing with `TestGroupState`: add the batch's arrival count,
    * bump the version, emit the running count. */
  private[graft] def cellUpdate(cell: Int, arrivals: Iterator[Long],
      state: GroupState[CellState]): Iterator[CellCount] = {
    val prev = state.getOption.getOrElse(CellState(0L, 0L))
    val add = arrivals.size.toLong
    val next = CellState(prev.version + 1, prev.cnt + add)
    state.update(next)
    Iterator.single(CellCount(cell, next.version, next.cnt))
  }

  /** Per-micro-batch touched-cell emissions over a streaming (or batch)
    * frame with a LONG `key` column. Update mode; state is bounded at
    * depth × width cells forever. */
  def cells(keyed: DataFrame): Dataset[CellCount] = {
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed
      .select(explode(cellIds(col("key"))).as("cell"))
      .as[Int]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (cell: Int, it: Iterator[Int], st: GroupState[CellState]) =>
          cellUpdate(cell, it.map(_.toLong), st))
  }

  /** Reduce an emitted-cells table (append-everything memory sink) to the
    * CURRENT cell table: the max-version row per cell — bounded 2,048
    * window partitions, the StreamingTopK.latestSummary shape. */
  def latestCells(emitted: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cell")
    emitted.withColumn("__mxv", max("version").over(w))
      .where(col("version") === col("__mxv"))
      .select("cell", "cnt")
  }

  /** Point-frequency estimates for a LONG `key` relation against a cell
    * table: fan each key to its cells, min over the sketch rows (absent
    * cells count 0 — the key's row was never touched). */
  def estimates(keys: DataFrame, cellTable: DataFrame): DataFrame =
    keys
      .withColumn("cell", explode(cellIds(col("key"))))
      .join(broadcast(cellTable), Seq("cell"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("c_est"))
}
