package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Interval (range) joins as binned EQUI-joins — the scale path for
  * time-window matching. A plain inequality join (`p.ts > i.start AND
  * p.ts <= i.end`) has no equi-key, so Spark plans a broadcast
  * nested-loop join: O(|points|·|intervals|) comparisons and a
  * broadcast of a whole side. Quantizing time into `binWidth` bins
  * turns it into a hash join: points map to one bin, an interval
  * replicates to the ≤ (len/binWidth)+1 bins it covers, the join is
  * an equi-join on (key, bin), and the exact predicate filters the
  * few in-bin false positives. Shuffle is O(points + intervals·k) on
  * (key, bin) — the same shape the engine's other joins scale on.
  */
object RangeJoin {

  /** Integer bin index, sign-safe, exact for |c| < 2^53. */
  private def binOf(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  /** Follow-up window join: rows of `points` with `keyCol` matching an
    * interval row and `ptCol` ∈ (startCol, endCol] — the strictly-
    * after-anchor, up-to-horizon attribution shape. `ptCol`,
    * `startCol`, `endCol` are integral (e.g. epoch micros); all other
    * column names must be disjoint between the two frames.
    */
  def binnedFollowUpJoin(points: DataFrame, intervals: DataFrame,
      keyCol: String, ptCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("_bin", binOf(col(ptCol), binWidth))
    val i = intervals.withColumn("_bin",
      explode(sequence(binOf(col(startCol), binWidth),
        binOf(col(endCol), binWidth))))
    i.join(p, Seq(keyCol, "_bin"))
      .filter(col(ptCol) > col(startCol) && col(ptCol) <= col(endCol))
      .drop("_bin")
  }

  /** Q47 — per purchase event: how many events (any type) the same
    * user produced within the following hour, and their value sum.
    * Value sums are 1e-6-tick-quantized (the q45 device) so the
    * double output is bit-identical under any join/aggregation order.
    */
  def q47FollowUpWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
    val hourMicros = 3600L * 1000000L
    val points = ev.select($"user_id",
      $"event_id".as("m_event"),
      unix_micros($"ts").as("pt"),
      round($"value" * 1e6).cast("long").as("ticks"))
    val anchors = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id",
        unix_micros($"ts").as("w_start"),
        (unix_micros($"ts") + hourMicros).as("w_end"))
    val matched = binnedFollowUpJoin(points, anchors,
        "user_id", "pt", "w_start", "w_end", hourMicros)
      .groupBy($"event_id")
      .agg(count(lit(1)).as("n_follow"), sum($"ticks").as("tk"))
    anchors.join(matched, Seq("event_id"), "left")
      .select($"event_id", $"user_id",
        coalesce($"n_follow", lit(0L)).as("n_follow"),
        (coalesce($"tk", lit(0L)).cast("double") / 1e6).as("follow_value"))
      .orderBy($"event_id")
  }
}
