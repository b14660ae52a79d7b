package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the follow-up attribution shape
  * ([[graft.operators.RangeJoin]]) when BOTH sides are live streams:
  * each anchor event matches point events of the same key whose event
  * time falls in `(anchor_ts, anchor_ts + horizon]`.
  *
  * Both inputs carry watermarks and the join condition bounds the two
  * event times against each other, so Structured Streaming can reason
  * about state expiry: an anchor's state is dropped once the point
  * watermark passes `anchor_ts + horizon`, a point's once the anchor
  * watermark passes `point_ts` — state is O(events inside the horizon
  * + watermark window), independent of stream lifetime. Without the
  * time-range predicate the state would grow forever; the conditions
  * here are exactly the ones Spark's state-cleanup analysis needs.
  *
  * Batch equivalence: running the same rows through the batch binned
  * range join gives identical matches (spec-asserted), so the
  * streaming form is a deployment choice, not a semantics change.
  */
object StreamRangeJoin {

  /** Inner join of two streams on `keyCol` with
    * `pointTs ∈ (anchorTs, anchorTs + horizon]`. `delay` is the
    * event-time watermark for both sides (how late data may arrive);
    * `horizon` is a SQL interval literal body, e.g. "1 HOUR".
    * Anchor/point timestamp column names must differ (both survive
    * into the output).
    */
  def followUp(anchors: DataFrame, points: DataFrame, keyCol: String,
      anchorTsCol: String, pointTsCol: String,
      horizon: String, delay: String): DataFrame = {
    require(anchorTsCol != pointTsCol,
      "anchor and point event-time columns must be named differently")
    val a = anchors.withWatermark(anchorTsCol, delay).alias("a")
    val p = points.withWatermark(pointTsCol, delay).alias("p")
    val cond: Column =
      col(s"a.$keyCol") === col(s"p.$keyCol") &&
        col(s"p.$pointTsCol") > col(s"a.$anchorTsCol") &&
        col(s"p.$pointTsCol") <=
          col(s"a.$anchorTsCol") + expr(s"INTERVAL $horizon")
    a.join(p, cond).drop(col(s"p.$keyCol"))
  }
}
