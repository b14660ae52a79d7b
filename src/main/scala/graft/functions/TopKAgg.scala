package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored corpus row inside a per-probe top-k buffer. */
final case class ScoredId(vec_id: Long, sim: Double)

/** Bounded top-k as a typed `Aggregator`: the scale-safe replacement
  * for `row_number() OVER (PARTITION BY probe_id)` top-k, which ships
  * every scored corpus row of a probe to ONE reducer. As an aggregate,
  * Catalyst plans partial (map-side) + final aggregation: each input
  * partition reduces to ≤ k rows per probe before the shuffle, so the
  * exchange carries k·partitions rows per probe instead of |corpus| —
  * the grouped analogue of `TakeOrderedAndProject`.
  *
  * Buffer is a sorted-descending array of ≤ k entries (insertion is
  * O(k) arraycopy; k is small). Ordering is (sim DESC, vec_id ASC) —
  * the same deterministic tie-break as the window formulation, so
  * results are identical row-for-row.
  *
  * NaN policy: `java.lang.Double.compare` total order — NaN ranks
  * ABOVE every real sim, exactly where Spark's `ORDER BY sim DESC`
  * (and DuckDB's) sorts it. A naive `>` would have false on every
  * NaN comparison and silently sink a zero-norm-embedding NaN to the
  * bottom, diverging from the window formulation. −0.0 is
  * canonicalized to 0.0 on insert so Double.compare's −0.0 < 0.0
  * never splits a SQL-equal tie.
  */
final class TopKAgg(k: Int)
  extends Aggregator[(Long, Double), Array[ScoredId], Array[ScoredId]] {
  require(k > 0, "k must be positive")

  private def beats(aSim: Double, aId: Long, bSim: Double, bId: Long): Boolean = {
    val c = java.lang.Double.compare(aSim, bSim)
    c > 0 || (c == 0 && aId < bId)
  }

  override def zero: Array[ScoredId] = Array.empty

  override def reduce(buf: Array[ScoredId], in: (Long, Double)): Array[ScoredId] = {
    val id = in._1
    val sim = if (in._2 == 0.0) 0.0 else in._2 // −0.0 → 0.0
    val n = buf.length
    if (n == k && !beats(sim, id, buf(n - 1).sim, buf(n - 1).vec_id)) buf
    else {
      var i = 0
      while (i < n && beats(buf(i).sim, buf(i).vec_id, sim, id)) i += 1
      val m = math.min(n + 1, k)
      val out = new Array[ScoredId](m)
      System.arraycopy(buf, 0, out, 0, i)
      out(i) = ScoredId(id, sim)
      if (i + 1 < m) System.arraycopy(buf, i, out, i + 1, m - i - 1)
      out
    }
  }

  override def merge(a: Array[ScoredId], b: Array[ScoredId]): Array[ScoredId] = {
    val m = math.min(a.length + b.length, k)
    val out = new Array[ScoredId](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      if (j >= b.length ||
          (i < a.length && beats(a(i).sim, a(i).vec_id, b(j).sim, b(j).vec_id))) {
        out(o) = a(i); i += 1
      } else {
        out(o) = b(j); j += 1
      }
      o += 1
    }
    out
  }

  override def finish(buf: Array[ScoredId]): Array[ScoredId] = buf

  // ExpressionEncoder (not kryo) so the output column is a real
  // array<struct<vec_id,sim>> that downstream `explode` understands.
  override def bufferEncoder: Encoder[Array[ScoredId]] = TopKAgg.arrayEncoder
  override def outputEncoder: Encoder[Array[ScoredId]] = TopKAgg.arrayEncoder
}

object TopKAgg {
  private[functions] val arrayEncoder: Encoder[Array[ScoredId]] =
    ExpressionEncoder[Array[ScoredId]]()
}
