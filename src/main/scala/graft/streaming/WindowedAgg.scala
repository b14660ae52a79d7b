package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation — identical expression for batch
  * and stream (SURVEY.md §2.9: watermark + tumbling windows over
  * `events`). The batch form is [[graft.operators.Temporal.q19WindowedAgg]];
  * this streaming form adds the watermark so state for closed windows
  * is dropped (bounded state at 100 TB: state size = open windows ×
  * group cardinality, never total history).
  */
object WindowedAgg {

  /** Tumbling event-time window counts/sums per event_type. Input may
    * be batch or streaming; with a streaming input the watermark
    * bounds state and (in append mode) controls emission.
    */
  def tumbling(events: DataFrame, windowLength: String = "1 day",
      watermark: String = "1 day"): DataFrame = {
    import events.sparkSession.implicits._
    val src = if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    src.groupBy(window($"ts", windowLength).as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
      .select($"w.start".as("win"), $"event_type", $"n", $"total")
  }

  /** Sliding event-time windows: each event lands in
    * length/slide overlapping windows (e.g. 1-day window sliding
    * 6 hours → 4). Same batch/stream duality as [[tumbling]].
    */
  def sliding(events: DataFrame, windowLength: String = "1 day",
      slide: String = "6 hours", watermark: String = "1 day"): DataFrame = {
    import events.sparkSession.implicits._
    val src = if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    src.groupBy(window($"ts", windowLength, slide).as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
      .select($"w.start".as("win"), $"event_type", $"n", $"total")
  }

  /** Per-user session windows: events closer than `gap` merge into one
    * session (state per OPEN session only under a watermark). The
    * natural "visit"/"burst" segmentation for activity features.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 day"): DataFrame = {
    import events.sparkSession.implicits._
    val src = if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    src.groupBy(session_window($"ts", gap).as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("total"))
      .select($"w.start".as("session_start"), $"w.end".as("session_end"),
        $"user_id", $"n_events", $"total")
  }
}
