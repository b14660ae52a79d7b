package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** K-MINIMUM-VALUES distinct-count sketch as a typed `Aggregator` —
  * the bounded-state form of `countDistinct` for key spaces too large
  * to shuffle: exact distinct moves one row per DISTINCT value
  * (billions at 100 TB URL/token cardinality), while this aggregate's
  * partial state is the ≤ k smallest distinct hash values per
  * partition, so the exchange carries k·partitions longs whatever the
  * true cardinality. Classic KMV (Bar-Yossef et al. 2002; mergeable
  * per Agarwal et al., PODS'12): with the k-th smallest of n distinct
  * uniform hashes at h₍ₖ₎, n ≈ (k−1)·M / h₍ₖ₎ over hash space [0, M);
  * relative std error ≈ 1/√(k−2).
  *
  * DETERMINISM is the graft twist: the sketch state is the SET of the
  * k smallest distinct values — a set is order-independent, so any
  * partitioning, any merge tree, and any engine that agrees on the
  * hash (the engine-portable [[graft.operators.TextAnalysis
  * .fingerprint]] fold, not Spark's builtin hash) produces the
  * bit-identical sketch — which is why a DuckDB oracle can hash-match
  * the ESTIMATE itself, not just bound its error.
  *
  * reduce: binary-search insert, drop the max once past k — O(log k)
  * search + O(k) shift on hit, no-op for the common
  * value-above-current-max row. merge: sorted-merge two states, keep
  * the k smallest distinct. finish: the sorted state (callers derive
  * n_kept / k-th min / the estimate in plain SQL so the arithmetic is
  * shared with the oracle text).
  */
final class KmvDistinctAgg(k: Int)
  extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, "k must be positive")

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) buf // already present: a SET of distinct values
    else {
      val at = -i - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, at)
        out(at) = h
        System.arraycopy(buf, at, out, at + 1, buf.length - at)
        out
      } else if (at < k) {
        // displaces the current max; k-1 survivors keep their order
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, at)
        out(at) = h
        System.arraycopy(buf, at, out, at + 1, k - at - 1)
        out
      } else buf // h above the current k-th min: cannot be a minimum
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted-merge with dedup, cut at k
    val out = new Array[Long](math.min(a.length + b.length, k))
    var (i, j, n) = (0, 0, 0)
    var last = Long.MinValue
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          val v = a(i); i += 1; v
        } else { val v = b(j); j += 1; v }
      if (n == 0 || take != last) { out(n) = take; n = n + 1; last = take }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = KmvDistinctAgg.arrEnc
  override def outputEncoder: Encoder[Array[Long]] = KmvDistinctAgg.arrEnc
}

object KmvDistinctAgg {
  private[functions] val arrEnc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
