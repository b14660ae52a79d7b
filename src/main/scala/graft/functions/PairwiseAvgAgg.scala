package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

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
  extends Aggregator[(Long, Long, Double), List[(Long, Long, Double)], Double] {

  override def zero: List[(Long, Long, Double)] = Nil

  override def reduce(b: List[(Long, Long, Double)],
      a: (Long, Long, Double)): List[(Long, Long, Double)] = a :: b

  override def merge(a: List[(Long, Long, Double)],
      b: List[(Long, Long, Double)]): List[(Long, Long, Double)] = a ::: b

  override def finish(buf: List[(Long, Long, Double)]): Double =
    buf.sortBy(t => (t._1, t._2))
      .map(_._3)
      .reduceLeft((acc, v) => (acc + v) / 2.0)

  override def bufferEncoder: Encoder[List[(Long, Long, Double)]] =
    Encoders.kryo[List[(Long, Long, Double)]]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Register as `pairwise_avg(ts_micros, event_id, value)`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("pairwise_avg", udaf(PairwiseAvgAgg))
}
