package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** COUNT-MIN frequency sketch as a typed `Aggregator` — the
  * point-frequency sibling of [[KmvDistinctAgg]] (cardinality) and
  * [[HeavyHittersAgg]] (Misra–Gries survivors): exact per-item counts
  * shuffle one row per DISTINCT item (billions at 100 TB token/URL
  * cardinality), while this aggregate's partial state is a fixed
  * `depth × width` counter matrix — `depth·width` longs per partition
  * on the exchange whatever the true cardinality — that afterwards
  * answers a frequency estimate for ANY item, not just the sketch's
  * own survivors (the capability Misra–Gries lacks; the price is an
  * OVERcount where MG undercounts).
  *
  * Classic guarantees (Cormode & Muthukrishnan 2005, "An improved
  * data stream summary: the count-min sketch and its applications"):
  * with est(x) = min over rows i of cell(i, hᵢ(x)),
  *  - est(x) ≥ true(x) always (each cell only ever adds);
  *  - est(x) ≤ true(x) + (e/width)·N with probability ≥ 1 − e^−depth
  *    over the hash draw (N = total items).
  *
  * DETERMINISM is the graft twist, same as the KMV sketch: `reduce`
  * is a counter increment and `merge` is element-wise addition —
  * commutative and associative — so any partitioning, any merge tree,
  * and any engine that agrees on the row hashes produces the
  * BIT-IDENTICAL matrix. The row hashes are plain integer arithmetic
  * over the engine-portable [[graft.operators.TextAnalysis
  * .fingerprint]] fold (two Lehmer-LCG scramble steps mod the
  * Mersenne prime 2³¹−1, row-salted by adding the row index before
  * scrambling; every product < 2⁶³ so the arithmetic is exact BIGINT
  * in any engine) — which is why a DuckDB oracle can reproduce the
  * ESTIMATES themselves, not just bound their error.
  *
  * Input is the base hash (the fingerprint), not the item: hashing
  * once upstream keeps the per-row reduce at `depth` multiply-mods
  * and lets callers reuse the same base hash the KMV/mirror ops key
  * on. The empty-array sentinel keeps `zero` allocation-free; the
  * matrix allocates once per partition buffer on first use.
  */
final class CountMinAgg(depth: Int, width: Int)
  extends Aggregator[Long, Array[Long], Array[Long]] {
  require(depth > 0, "depth must be positive")
  require(width > 0, "width must be positive")
  require(depth.toLong * width <= Int.MaxValue, "sketch too large")

  private val M = 2147483647L // Mersenne prime 2^31 - 1

  /** Cell index of base hash `h` in sketch row `i` — shared-formula
    * contract with the oracle SQL (see `Profiling.cmsCellSql`).
    */
  @inline private def cell(h: Long, i: Int): Int = {
    val g = (((h + i) * 48271L) % M) * 48271L % M
    (g % width).toInt
  }

  override def zero: Array[Long] = Array.empty

  override def reduce(buf0: Array[Long], h: Long): Array[Long] = {
    val buf = if (buf0.length == 0) new Array[Long](depth * width) else buf0
    var i = 0
    while (i < depth) {
      buf(i * width + cell(h, i)) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.length == 0) b
    else if (b.length == 0) a
    else {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def finish(buf: Array[Long]): Array[Long] =
    if (buf.length == 0) new Array[Long](depth * width) else buf

  override def bufferEncoder: Encoder[Array[Long]] = KmvDistinctAgg.arrEnc
  override def outputEncoder: Encoder[Array[Long]] = KmvDistinctAgg.arrEnc
}
