package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Temporal operators over `events`: tumbling-window aggregation,
  * point-in-time (as-of) join, and CUBE grouping sets — the extended
  * surface a feature store needs for time-correct training data
  * (SURVEY.md §2.5/§2.9; the reference's offline store is queried for
  * "latest feature values" only, `feature_store_manager.py:125-141`).
  */
object Temporal {

  /** Q19 — tumbling 1-day event-time window aggregation. In batch this
    * is a plain group-by on the window bucket; the same expression
    * under `readStream` + `withWatermark` is the streaming windowed
    * agg (spec-checked for batch/stream equivalence in
    * StreamingWindowSpec).
    */
  def q19WindowedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy(window($"ts", "1 day").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
      .select($"w.start".as("win"), $"event_type", $"n", $"total")
      .orderBy($"win", $"event_type")
  }

  /** Q20 — as-of (point-in-time) join: each event matched to the
    * latest per-user daily snapshot STRICTLY BEFORE its event time.
    * This is the feature-store point-in-time-correctness join (no
    * training-label leakage from the future).
    *
    * Implementation is the union trick — no range explosion, no
    * per-event probe: tag snapshots and events, sort each user's
    * timeline once, carry the last-seen snapshot forward with a
    * running `last(ignoreNulls)` window. One shuffle on user_id; at
    * 100 TB this is a sort-merge pass, vs the naive
    * join-then-filter-then-argmax which materializes |events|·|snaps|
    * rows per user.
    *
    * Strict "<" semantics come from the sort key (t, is_snap): at
    * equal timestamps the event row (is_snap=0) precedes the snapshot
    * (is_snap=1), so a snapshot never matches an event at its own
    * timestamp.
    */
  def q20AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.load(spark, dir, "events")
    // daily snapshots: newest event per (user, day), deterministic
    val wSnap = Window.partitionBy($"user_id", date_trunc("day", $"ts"))
      .orderBy($"ts".desc, $"event_id".desc)
    val snaps = e.withColumn("rn", row_number().over(wSnap))
      .filter($"rn" === 1)
      .select($"user_id", $"value".as("snap_value"), $"ts".as("snap_ts"))

    val events = e.select($"event_id", $"user_id", $"ts",
      lit(0).as("is_snap"), lit(null).cast("double").as("s_value"),
      lit(null).cast("timestamp").as("s_ts"))
    val tagged = snaps.select(lit(null).cast("long").as("event_id"),
      $"user_id", $"snap_ts".as("ts"), lit(1).as("is_snap"),
      $"snap_value".as("s_value"), $"snap_ts".as("s_ts"))

    val wCarry = Window.partitionBy($"user_id")
      .orderBy($"ts", $"is_snap")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.unionByName(tagged)
      .withColumn("snap_value", last($"s_value", ignoreNulls = true).over(wCarry))
      .withColumn("snap_ts", last($"s_ts", ignoreNulls = true).over(wCarry))
      .filter($"is_snap" === 0)
      .select($"event_id", $"user_id", $"snap_value", $"snap_ts")
      .orderBy($"event_id")
  }

  /** Q21 — CUBE grouping sets: all 4 aggregation granularities of
    * (event_type, day-of-month) in one pass (Expand + partial agg:
    * the shuffle carries |groups|·4 rows, not raw data ×4).
    */
  def q21Cube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .withColumn("d", dayofmonth($"ts"))
      .cube($"event_type", $"d")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
      .orderBy($"event_type".asc_nulls_last, $"d".asc_nulls_last)
  }

  /** Batch sessionization — gaps-and-islands: a new session starts
    * when a user is idle longer than `gapSec`. The batch twin of the
    * streaming session windows (`streaming.WindowedAgg`), as the
    * training-side sessionizer: one lag to mark breaks, one running
    * sum to number sessions, one group-by for the stats. Gap
    * comparison is exact integer epoch-microsecond arithmetic
    * (identical in any engine — both floor the source ns column to
    * µs); per-user windows are bounded groups (the q10 shape), so no
    * single-reducer risk.
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    import events.sparkSession.implicits._
    val byUser = Window.partitionBy($"user_id")
      .orderBy($"ts", $"event_id")
    val marked = events
      .withColumn("prev_us",
        lag(unix_micros($"ts"), 1).over(byUser))
      .withColumn("brk",
        when($"prev_us".isNull ||
          unix_micros($"ts") - $"prev_us" > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session",
        sum($"brk").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy($"user_id", $"session")
      .agg(count(lit(1)).as("n"),
        min($"ts").as("start_ts"), max($"ts").as("end_ts"),
        sum($"value").as("total"))
  }

  /** Q58 — 30-minute-gap sessions per user over `events`. */
  def q58Sessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sessionize(Tables.load(spark, dir, "events"))
      .orderBy($"user_id", $"session")
  }
}
