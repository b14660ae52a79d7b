package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Growable primitive-array buffer for [[PairwiseAvgAgg]]: three
  * parallel arrays + fill count. Serialized with an ExpressionEncoder
  * (Tungsten unsafe arrays), so a spilled/shuffled buffer row is ~24
  * bytes per event — the kryo `List[(Long, Long, Double)]` it
  * replaces paid boxed-tuple + cons-cell + kryo framing per element.
  * Arrays are mutated in place (the typed-Aggregator object buffer is
  * only serialized at partial-aggregate boundaries); growth doubles
  * capacity so reduce() is amortized O(1).
  */
final case class PairBuf(n: Int, ts: Array[Long], id: Array[Long], v: Array[Double])

/** The reference's order-dependent pairwise average (A3,
  * `core/feature_store_manager.py:260-264`) as a registered typed
  * `Aggregator` — the UDAF surface declared in SURVEY.md §2.11.
  *
  * A3 is NOT commutative, so the aggregator cannot fold in merge():
  * the buffer accumulates `(ts_micros, event_id, value)` triples and
  * the deterministic `(ts, event_id)`-ordered fold happens once in
  * finish(). Buffer size is O(events per key) — same bound as any
  * collect_list; the mapGroups ([[graft.operators.StateFold]]) and
  * keyed-state ([[graft.streaming.StreamingStateFold]]) forms hold
  * O(1)/O(group) and are preferred at scale; this form exists so the
  * fold is callable as an aggregate expression inside plain
  * `groupBy().agg(...)` and SQL.
  */
object PairwiseAvgAgg
  extends Aggregator[(Long, Long, Double), PairBuf, Double] {

  override def zero: PairBuf =
    PairBuf(0, Array.empty, Array.empty, Array.empty)

  override def reduce(b: PairBuf, a: (Long, Long, Double)): PairBuf = {
    val grown =
      if (b.n < b.ts.length) b
      else {
        val cap = math.max(8, b.ts.length * 2)
        PairBuf(b.n,
          java.util.Arrays.copyOf(b.ts, cap),
          java.util.Arrays.copyOf(b.id, cap),
          java.util.Arrays.copyOf(b.v, cap))
      }
    grown.ts(grown.n) = a._1
    grown.id(grown.n) = a._2
    grown.v(grown.n) = a._3
    grown.copy(n = grown.n + 1)
  }

  override def merge(a: PairBuf, b: PairBuf): PairBuf = {
    val ts = java.util.Arrays.copyOf(a.ts, a.n + b.n)
    val id = java.util.Arrays.copyOf(a.id, a.n + b.n)
    val v = java.util.Arrays.copyOf(a.v, a.n + b.n)
    System.arraycopy(b.ts, 0, ts, a.n, b.n)
    System.arraycopy(b.id, 0, id, a.n, b.n)
    System.arraycopy(b.v, 0, v, a.n, b.n)
    PairBuf(a.n + b.n, ts, id, v)
  }

  override def finish(b: PairBuf): Double = {
    if (b.n == 0) return Double.NaN // empty aggregation (e.g. a global
    // agg over zero rows) — NaN, not a crash; SQL NULL isn't
    // expressible through the primitive Double output encoder
    val order = (0 until b.n).sortBy(i => (b.ts(i), b.id(i)))
    var acc = b.v(order.head)
    order.tail.foreach { i => acc = (acc + b.v(i)) / 2.0 }
    acc
  }

  override def bufferEncoder: Encoder[PairBuf] = ExpressionEncoder[PairBuf]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Register as `pairwise_avg(ts_micros, event_id, value)`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("pairwise_avg", udaf(PairwiseAvgAgg))
}
