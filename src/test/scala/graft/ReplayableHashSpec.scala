package graft

import java.math.BigInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ReplayableHash

/** Unit properties of the SQL-replayable hash family that the DuckDB gate
  * depends on: overflow-freedom (DuckDB BIGINT overflow is an ERROR, so
  * every intermediate must provably fit), agreement with an independent
  * BigInteger reference (no silent Long wrap anywhere), code-point
  * semantics (DuckDB `ord` indexing), and enough dispersion that MinHash /
  * SimHash behave like hashes.
  */
class ReplayableHashSpec extends AnyFunSuite {

  private val P = ReplayableHash.P

  test("all family parameters keep every intermediate strictly below 2^63") {
    for (ps <- Seq(ReplayableHash.MinHashParams, ReplayableHash.SimHashParams)) {
      ps.foreach { case (a, b) =>
        assert(a >= 1 && a < P && b >= 0 && b < P)
        // a * th + b for th < P — the largest possible intermediate
        val worst = BigInteger.valueOf(a)
          .multiply(BigInteger.valueOf(P - 1))
          .add(BigInteger.valueOf(b))
        assert(worst.bitLength() <= 62,
          s"a=$a b=$b worst intermediate has ${worst.bitLength()} bits")
      }
    }
    // the LSH band pairing sig_even * P + sig_odd
    val bandWorst = BigInteger.valueOf(P - 1)
      .multiply(BigInteger.valueOf(P))
      .add(BigInteger.valueOf(P - 1))
    assert(bandWorst.bitLength() <= 62)
  }

  test("tokenHash agrees with a BigInteger reference on code points") {
    def ref(s: String): Long = {
      var h = BigInteger.ZERO
      val base = BigInteger.valueOf(ReplayableHash.Base)
      val p = BigInteger.valueOf(P)
      s.codePoints().forEach { cp =>
        h = h.multiply(base).add(BigInteger.valueOf(cp)).mod(p)
      }
      h.longValueExact()
    }
    val samples = Seq("", "a", "spark", "the quick brown fox",
      "tok" * 100, "naïve café", "emoji 😀 tail", "中文 text")
    samples.foreach { s =>
      assert(ReplayableHash.tokenHash(s) == ref(s), s"text: $s")
    }
    // surrogate pairs count ONCE (as their code point), not twice
    val single = ReplayableHash.tokenHash("😀")
    assert(single == 0x1F600L % P)
  }

  test("affine family members disperse: distinct tokens rarely collide per member") {
    val tokens = (1 to 2000).map(i => s"token$i")
    val base = tokens.map(ReplayableHash.tokenHash)
    assert(base.distinct.size == tokens.size, "base hash collided on tiny vocab")
    ReplayableHash.MinHashParams.take(16).zipWithIndex.foreach { case ((a, b), k) =>
      val vals = base.map(h => ReplayableHash.affine(a, b, h))
      assert(vals.distinct.size == tokens.size, s"member $k collided")
      assert(vals.forall(v => v >= 0 && v < P))
    }
    // different members order tokens differently (they are distinct hashes,
    // not relabelings — MinHash independence depends on this)
    val orders = ReplayableHash.MinHashParams.take(8).map { case (a, b) =>
      tokens.sortBy(t => ReplayableHash.affine(a, b, ReplayableHash.tokenHash(t)))
    }
    assert(orders.distinct.size == orders.size)
  }

  test("generated SQL fragments carry the same constants as the Scala side") {
    val sql = ReplayableHash.tokenHashSql("t")
    assert(sql.contains(ReplayableHash.Base.toString) && sql.contains(P.toString))
    val mp = ReplayableHash.paramsSql(ReplayableHash.MinHashParams, 16, "v")
    ReplayableHash.MinHashParams.take(16).foreach { case (a, b) =>
      assert(mp.contains(a.toString) && mp.contains(b.toString))
    }
    // the bit-63 weight must be the two's-complement-safe expression, never
    // a raw 1<<63 literal (DuckDB errors on the shift and the literal)
    assert(ReplayableHash.bitWeightSql(63) == "(-9223372036854775807 - 1)")
    assert(ReplayableHash.bitWeightSql(0) == "1")
    assert(ReplayableHash.bitWeightSql(62) == (1L << 62).toString)
  }

  test("mod-P-reduced affine map equals the unreduced map for ANY non-negative key") {
    // the round-7 overflow fix: (a·(k % P) + b) % P must equal
    // (a·k + b) % P for every 63-bit key, while keeping every Long
    // intermediate below 2^63 — checked against a BigInteger reference
    // at the key magnitudes where the UNREDUCED form would wrap
    // (doc_id ≳ 1.4e10, the documented 100 TB corpus scale)
    val rnd = new scala.util.Random(7)
    val keys = Seq(0L, 1L, P - 1, P, P + 1, 1400000000L * 10, Long.MaxValue) ++
      Seq.fill(2000)(rnd.nextLong() & Long.MaxValue)
    for (salt <- Seq(6L, 7L, 8L); (a, b) = ReplayableHash.params(1, salt).head;
         k <- keys) {
      val reduced = (a * (k % P) + b) % P // the engine/oracle formula
      val ref = BigInteger.valueOf(a)
        .multiply(BigInteger.valueOf(k))
        .add(BigInteger.valueOf(b))
        .mod(BigInteger.valueOf(P)).longValueExact()
      assert(reduced == ref, s"salt=$salt k=$k: $reduced != $ref")
      // the Long intermediate provably cannot wrap
      assert(BigInteger.valueOf(a)
        .multiply(BigInteger.valueOf(P - 1))
        .add(BigInteger.valueOf(b)).bitLength() <= 62)
    }
  }
}
