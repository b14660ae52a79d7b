package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One sketch counter: an item and its (under)estimate. */
final case class HHCount(item: String, est: Long)

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * bounded-state form of [[graft.operators.Profiling.skewReport]] for
  * key spaces too large to group exactly: a `groupBy(key).count()`
  * shuffles one row per DISTINCT key (billions at 100 TB corpus
  * cardinality), while this aggregate's partial state is ≤ k counters
  * per partition and the exchange carries k·partitions rows, whatever
  * the key cardinality.
  *
  * Classic guarantees (Misra–Gries 1982; mergeability per Agarwal et
  * al., "Mergeable Summaries", PODS'12):
  *  - estimate is an UNDERcount: true − n/(k+1) ≤ est ≤ true;
  *  - every item with true frequency > n/(k+1) survives the sketch
  *    (no false negatives above the threshold) — so the operator
  *    answers "which keys need salting" exactly where it matters.
  *
  * reduce: hit → +1; room → insert; full → decrement ALL counters
  * (dropping zeros) — the O(k) step amortizes to O(1) per row since
  * each decrement pays back an earlier increment. merge: sum counts
  * pairwise, then if > k counters survive subtract the (k+1)-th
  * largest and drop non-positives — the PODS'12 mergeable step.
  */
final class HeavyHittersAgg(k: Int)
  extends Aggregator[String, Map[String, Long], Array[HHCount]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1L)
      case None if buf.size < k => buf.updated(item, 1L)
      case None =>
        // decrement-all: shrink every counter, drop exhausted ones
        buf.iterator.flatMap { case (i, c) =>
          if (c > 1L) Some(i -> (c - 1L)) else None
        }.toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toArray.sortBy(-_)(Ordering.Long).apply(k)
      summed.iterator.flatMap { case (i, c) =>
        if (c > cut) Some(i -> (c - cut)) else None
      }.toMap
    }
  }

  override def finish(buf: Map[String, Long]): Array[HHCount] =
    buf.toArray.map { case (i, c) => HHCount(i, c) }
      .sortBy(h => (-h.est, h.item))

  override def bufferEncoder: Encoder[Map[String, Long]] =
    HeavyHittersAgg.bufEncoder
  override def outputEncoder: Encoder[Array[HHCount]] =
    HeavyHittersAgg.outEncoder
}

object HeavyHittersAgg {
  private[functions] val bufEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  private[functions] val outEncoder: Encoder[Array[HHCount]] =
    ExpressionEncoder[Array[HHCount]]()
}
