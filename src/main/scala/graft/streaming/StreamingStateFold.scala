package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the reference's per-key state transition (A3,
  * `core/feature_store_manager.py:240-282`): on every event for a key,
  * `new_avg = (old_avg + value) / 2`; the first event seeds
  * `avg = value` (`:227-230`).
  *
  * `flatMapGroupsWithState` keeps one tiny (O(1)) state record per
  * customer — state size is bounded by #customers, not #events, so it
  * holds at 100 TB with the RocksDB state store. Events within a
  * micro-batch are applied in deterministic `(ts, event_id)` order
  * (the reference relies on arrival order — silently nondeterministic;
  * we define the order, SURVEY.md §7 risks). Order across micro-batch
  * boundaries is the source's responsibility (event-time-ordered
  * replay, T1).
  */
object StreamingStateFold {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long, value: Double)
  final case class KeyState(avg: Double, n: Long, lastTs: Timestamp)
  final case class KeyResult(user_id: Long, folded_avg: Double, n: Long)

  /** The reference's pairwise-average transition for one new value. */
  def step(state: Option[KeyState], e: Event): KeyState = state match {
    case None    => KeyState(e.value, 1L, e.ts)                       // cold start
    case Some(s) => KeyState((s.avg + e.value) / 2.0, s.n + 1L, e.ts) // update
  }

  def updateKey(
      uid: Long,
      events: Iterator[Event],
      state: GroupState[KeyState]): Iterator[KeyResult] = {
    val ordered = events.toArray.sortBy(e => (e.ts.getTime, e.event_id))
    if (ordered.isEmpty) Iterator.empty
    else {
      val s0 = state.getOption
      val s1 = ordered.foldLeft(s0) { (acc, e) => Some(step(acc, e)) }.get
      state.update(s1)
      Iterator(KeyResult(uid, s1.avg, s1.n))
    }
  }

  /** Wire the fold onto a (possibly streaming) Dataset[Event]. Output
    * mode Update: one row per key per micro-batch with its latest
    * state.
    */
  def apply(events: Dataset[Event]): Dataset[KeyResult] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[KeyState, KeyResult](
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(updateKey)
  }
}
