package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** Q14 — the reference's sequential per-key state transition (A3,
  * `core/feature_store_manager.py:260-264`): on each event,
  * `new_avg = (old_avg + value) / 2`; the first event for a key seeds
  * `avg = value` (`core/feature_store_manager.py:227-230`).
  *
  * This is an order-dependent fold, NOT a commutative aggregate, so it
  * cannot be a plain `groupBy().agg()`. Implementation: shuffle once on
  * the key, then fold each key's events in deterministic
  * `(ts, event_id)` order inside `mapGroups`. Per-key state is O(1) and
  * group size is bounded by events-per-user, so this distributes: each
  * of the N shuffle partitions folds its keys independently. (For
  * pathological million-event keys the same fold runs as a
  * sort-within-partitions + streaming scan; not needed at this data
  * shape.)
  *
  * Checked against a DuckDB closed form: unrolling the recurrence gives
  * a_n = v_1·2^-(n-1) + Σ_{i≥2} v_i·2^-(n-i+1) — exact power-of-two
  * weights, so the oracle matches the fold to FP rounding.
  */
object StateFold {

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

  private implicit val tsOrdering: Ordering[Timestamp] =
    Ordering.fromLessThan[Timestamp]((a, b) => a.compareTo(b) < 0)

  /** Pairwise-average fold of one key's values, in the order given. */
  def foldValues(values: Iterable[Double]): Double =
    values.reduceLeft((acc, v) => (acc + v) / 2.0)

  def q14StateFold(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .select($"event_id", $"ts", $"user_id", $"value")
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(e => (e.ts, e.event_id))
        (uid, foldValues(evs.map(_.value)), evs.length.toLong)
      }
      .toDF("user_id", "folded_avg", "n")
      .orderBy($"user_id")
  }

  /** Q14b — identical semantics via the registered UDAF
    * ([[graft.functions.PairwiseAvgAgg]]): the fold as an aggregate
    * expression inside a plain groupBy/SQL GROUP BY. Same DuckDB
    * closed-form oracle as q14.
    */
  def q14bUdafFold(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.PairwiseAvgAgg.register(spark)
    Tables.load(spark, dir, "events")
      .groupBy($"user_id")
      .agg(
        expr("pairwise_avg(unix_micros(ts), event_id, value)").as("folded_avg"),
        count(lit(1)).as("n"))
      .orderBy($"user_id")
  }
}
