package graft.functions

/** SQL-replayable hash family for the MinHash / SimHash dedup operators.
  *
  * Round 3 left the MinHash/SimHash family oracle-less only because
  * `xxhash64` has no DuckDB twin. This object replaces it with arithmetic
  * BOTH engines compute bit-identically in 64-bit integers, so the whole
  * bucket/cap/pair/verify pipeline replays in SQL (the q_mm_neardup
  * pattern, generalized):
  *
  *   - token hash: polynomial rolling hash over code points,
  *     `h = (h * 131 + cp) % 1000000007` — DuckDB replays it with
  *     `list_reduce` over `ord(token[i])` (code points, same values Java's
  *     `codePointAt` yields for all BMP text);
  *   - family member k: affine map `(a_k * h + b_k) % P` with deterministic
  *     per-k constants. Everything stays < 2^63: `h < P ≈ 2^30`, `a_k < P`,
  *     so `a_k * h + b_k < ~2^60` — no overflow on either engine (DuckDB
  *     BIGINT overflow is an ERROR, not a wrap, so this bound is load-bearing);
  *   - LSH band key: `sig_even * P + sig_odd` — an injective pairing of two
  *     `[0, P)` values, max ≈ 1.0e18 < 2^63.
  *
  * This is standard "one base hash + k universal affine maps" MinHash
  * practice; the constants are fixed (not seeded per run) so results are
  * reproducible across engines, runs, and partitionings.
  *
  * Every SQL fragment the oracles need is GENERATED from the same constants
  * (single source of truth — the Spark expression and its SQL twin cannot
  * drift).
  */
object ReplayableHash extends Serializable {

  val P: Long = 1000000007L
  val Base: Long = 131L

  /** Second polynomial BASE for the 60-bit shingle pairing digest
    * ([[shingleKeySql]]): two independent-base rolling hashes of the same
    * string, paired injectively as `h131 * P + h137` (max ≈ 1.0e18 < 2^63,
    * replayable on DuckDB BIGINTs). A cross-string collision needs BOTH
    * polynomial hashes to collide (~P² ≈ 2^60 keyspace), so equi-joins on
    * the digest are collision-safe at any realistic corpus scale — vs the
    * ~2^30 keyspace of a single hash, which collides at ~50k distinct
    * shingles. NOTE: this is a second polynomial base, not a new affine
    * family — the no-salt-reuse rule tracks affine salts, which this does
    * not consume. */
  val Base2: Long = 137L

  /** Fold base for combining the token hashes of a fixed-width block
    * (BlockHashGenerator): `h = (h * BlockBase + th) % P`. `h, th < P`
    * and `BlockBase < P`, so every step stays < ~2^60 — replayable on
    * DuckDB BIGINTs. Fixed block width means the unsalted fold is
    * prefix-unambiguous; this is a combine constant, not a new affine
    * family, so the no-salt-reuse rule does not apply. */
  val BlockBase: Long = 1000003L

  /** Second fold base for the SLIDING-window span digest
    * (SlidingHashGenerator): two independent fold chains — BlockBase over
    * base-131 token hashes and BlockBase2 over base-137 token hashes —
    * paired injectively as `f1 * P + f2` (~2^60 keyspace), the ShingleKey
    * discipline applied to token windows: window equi-joins are
    * collision-safe where a single ~2^30 fold would birthday-collide at
    * ~50k distinct windows. A combine constant, not an affine salt. */
  val BlockBase2: Long = 1000033L

  /** Polynomial rolling hash over code points, in [0, P). */
  def tokenHash(s: String): Long = tokenHash(s, Base)

  /** As [[tokenHash]] with an explicit base (see [[Base2]]). */
  def tokenHash(s: String, base: Long): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Deterministic affine-map constants: a_k in [1, P), b_k in [0, P). */
  def params(n: Int, salt: Long): IndexedSeq[(Long, Long)] =
    (0 until n).map { k =>
      val a = ((2654435761L * (k + 1) + 97L * salt) % (P - 1)) + 1
      val b = (40503L * (k + 1) * (k + 1) + 1009L * salt) % P
      (a, b)
    }

  /** k-th member of a family applied to a base token hash. */
  def affine(a: Long, b: Long, th: Long): Long = (a * th + b) % P

  /** MinHash family (16 hashes → 8 bands of 2 rows). */
  val MinHashParams: IndexedSeq[(Long, Long)] = params(64, salt = 1)

  /** SimHash bit family (one parity per bit, up to 64 bits). */
  val SimHashParams: IndexedSeq[(Long, Long)] = params(64, salt = 2)

  /** Count-Min row-hash family (q_agg_countmin; salt 11 — see the salt
    * registry in CLAUDE.md). Depth 4: one affine hash per sketch row. */
  val CountMinParams: IndexedSeq[(Long, Long)] = params(4, salt = 11)

  /** A/B-arm assignment hash (q_analytics_abtest; salt 12). */
  val AbTestParams: IndexedSeq[(Long, Long)] = params(1, salt = 12)

  /** Bloom-prefilter row family (q_join_bloom_prefilter; salt 13 — see
    * the salt registry in CLAUDE.md). k = 4 probe rows. */
  val BloomParams: IndexedSeq[(Long, Long)] = params(4, salt = 13)

  /** KMV bottom-k distinct-sketch hash (q_agg_kmv_distinct; salt 14 — see
    * the salt registry in CLAUDE.md). One affine member: mod-prime affine
    * maps are bijections on [0, P), so distinct keys below P get distinct
    * hash values and the bottom-k set is collision-free by construction. */
  val KmvParams: IndexedSeq[(Long, Long)] = params(1, salt = 14)

  /** Random-walk step-priority family (q_graph_rw_sample; salt 15 — see
    * the salt registry in CLAUDE.md). One affine member per walk step:
    * each step picks the neighbor with the minimal hash, and the
    * mod-prime bijection makes the argmin tie-free on distinct ids. */
  val RwParams: IndexedSeq[(Long, Long)] = params(4, salt = 15)

  /** Deterministic-sample percentile priority (q_agg_approx_percentile;
    * salt 17 — see the salt registry in CLAUDE.md). One affine member:
    * the priority of a lineitem row's composite key; bottom-k by
    * (priority, key, cents) is a replayable uniform sample. */
  val SamplePctlParams: IndexedSeq[(Long, Long)] = params(1, salt = 17)

  /** Ingestion-jitter family (q_analytics_late_events /
    * StreamingLateEvents; salt 16 — see the salt registry in CLAUDE.md).
    * One member: each event's simulated network delay is its affine hash
    * in [0, P) µs ≈ 16.7 min, added to event time to form the arrival
    * time the watermark audit batches on. */
  val LateJitterParams: IndexedSeq[(Long, Long)] = params(1, salt = 16)

  // ---- DuckDB SQL twins (generated from the same constants) --------------

  /** SQL computing [[tokenHash]] of a string expression. */
  def tokenHashSql(col: String): String = tokenHashSql(col, Base)

  /** As [[tokenHashSql]] with an explicit base. `col` is parenthesized
    * before indexing (r15: `$col[i]` on a concat expression like
    * `a || ' ' || b` would index only the LAST term — `[]` binds tighter
    * than `||`), and callers must not alias any enclosing unnest/range
    * column `i` — the fold lambda binds `i` and would capture it. */
  def tokenHashSql(col: String, base: Long): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, length($col) + 1), i -> CAST(ord(($col)[i]) AS BIGINT))),
       |  (h, c) -> (h * $base + c) % $P)""".stripMargin

  /** SQL twin of the [[graft.functions.ShingleKey]] 60-bit pairing digest:
    * `tokenHash(s, 131) * P + tokenHash(s, 137)`. */
  def shingleKeySql(col: String): String =
    s"(${tokenHashSql(col, Base)} * $P + ${tokenHashSql(col, Base2)})"

  /** `(VALUES ...) name(k, a, b)` relation of the first `n` family params. */
  def paramsSql(ps: IndexedSeq[(Long, Long)], n: Int, name: String): String = {
    val rows = ps.take(n).zipWithIndex
      .map { case ((a, b), k) => s"($k, $a, $b)" }.mkString(", ")
    s"(SELECT * FROM (VALUES $rows) $name(k, a, b))"
  }

  /** Signed-decimal literal of `1L << j` (DuckDB rejects `1 << 63`; the
    * two's-complement min value is emitted as an arithmetic expression). */
  def bitWeightSql(j: Int): String =
    if (j == 63) "(-9223372036854775807 - 1)" else (1L << j).toString

  /** SQL computing the [[BlockHashGenerator]] fold over a BIGINT-list
    * expression of token hashes (list order = token order). */
  def blockFoldSql(listExpr: String): String = blockFoldSql(listExpr, BlockBase)

  /** As [[blockFoldSql]] with an explicit fold base (see [[BlockBase2]]). */
  def blockFoldSql(listExpr: String, base: Long): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), $listExpr),
       |  (h, x) -> (h * $base + x) % $P)""".stripMargin

  /** Shared oracle prelude over `documents`: distinct non-empty whitespace
    * tokens (the docTokens contract) and their base hashes.
    * Ends with `th(doc_id, token, th)`. */
  def tokenHashCte: String =
    s"""tok AS (
       |  SELECT DISTINCT doc_id, token FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE length(token) > 0),
       |th AS (SELECT doc_id, token, ${tokenHashSql("token")} AS th FROM tok)""".stripMargin

  /** MinHash signatures CTE: `sigs(doc_id, k, sig)` for k in [0, n). */
  def minhashSigsCte(n: Int): String =
    s"""mp AS ${paramsSql(MinHashParams, n, "v")},
       |sigs AS (
       |  SELECT doc_id, mp.k, min((mp.a * th.th + mp.b) % $P) AS sig
       |  FROM th CROSS JOIN mp GROUP BY doc_id, mp.k)""".stripMargin

  /** LSH band keys CTE over `sigs`: `bands(doc_id, band, bh)` with the same
    * injective pairing the Spark side uses. */
  def lshBandsCte: String =
    s"""bands AS (
       |  SELECT doc_id, CAST(k // 2 AS INT) AS band,
       |         max(CASE WHEN k % 2 = 0 THEN sig END) * $P
       |           + max(CASE WHEN k % 2 = 1 THEN sig END) AS bh
       |  FROM sigs GROUP BY doc_id, k // 2)""".stripMargin

  /** SimHash fingerprint CTE: `sh(doc_id, simhash)` over `bits` bit
    * parities (vote +1 when the affine hash is odd, -1 when even; bit set
    * iff the vote sum is positive — the SimHashAgg contract). */
  def simhashCte(bits: Int): String = {
    val weights = (0 until bits)
      .map(j => s"CASE WHEN v.j = $j AND v.v > 0 THEN ${bitWeightSql(j)} ELSE 0 END")
    s"""sp AS ${paramsSql(SimHashParams, bits, "v")},
       |votes AS (
       |  SELECT doc_id, sp.k AS j,
       |         sum(CASE WHEN ((sp.a * th.th + sp.b) % $P) % 2 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM th CROSS JOIN sp GROUP BY doc_id, sp.k),
       |sh AS (
       |  SELECT doc_id, CAST(sum(${weights.mkString(" + ")}) AS BIGINT) AS simhash
       |  FROM votes v GROUP BY doc_id)""".stripMargin
  }
}
