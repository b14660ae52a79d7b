package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel — the live form of the batch strict-progression
  * funnel ([[graft.operators.Temporal.funnel]]): per-user keyed state
  * tracks the first stage-1 time, the first stage-2 time after it,
  * and the first stage-3 time after that; every stage ATTAINMENT is
  * emitted as it happens. `flatMapGroupsWithState` keeps O(1) state
  * per user (three optional timestamps), so state scales with active
  * users, never event volume; an optional idle TTL evicts dormant
  * users for the 100 TB bound.
  *
  * Ordering contract: events within a micro-batch are folded in
  * (ts, event_id) order, so any within-batch reordering is repaired;
  * a CROSS-batch regression (an old event arriving after a later
  * stage was already attained from a newer one) cannot retract
  * emitted attainments — same monotone-output constraint every
  * streaming system has. Under per-user in-order delivery (or any
  * batching of an in-order log), the final attained stages equal the
  * batch funnel's exactly (spec-checked across batch sizes).
  */
object StreamFunnel {

  final case class FEvent(user_id: Long, event_type: String,
      ts: Timestamp, event_id: Long)
  /** Stage timestamps as epoch micros; None = not yet attained. */
  final case class FunnelState(t1: Option[Long], t2: Option[Long],
      t3: Option[Long])
  final case class Attainment(user_id: Long, stage: Long, ts: Timestamp)

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  /** One transition: (state, event) → (state', emitted attainment). */
  def step(stage1: String, stage2: String, stage3: String)(
      s: FunnelState, e: FEvent): (FunnelState, Option[Attainment]) = {
    val t = micros(e.ts)
    e.event_type match {
      case `stage1` if s.t1.isEmpty =>
        (s.copy(t1 = Some(t)), Some(Attainment(e.user_id, 1L, e.ts)))
      case `stage2` if s.t2.isEmpty && s.t1.exists(_ < t) =>
        (s.copy(t2 = Some(t)), Some(Attainment(e.user_id, 2L, e.ts)))
      case `stage3` if s.t3.isEmpty && s.t2.exists(_ < t) =>
        (s.copy(t3 = Some(t)), Some(Attainment(e.user_id, 3L, e.ts)))
      case _ => (s, None)
    }
  }

  def apply(events: Dataset[FEvent], stage1: String, stage2: String,
      stage3: String, idleTimeout: Option[String] = None): Dataset[Attainment] = {
    import events.sparkSession.implicits._
    val f = step(stage1, stage2, stage3) _
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Attainment](
        OutputMode.Append(), timeoutConf) {
        (_: Long, it: Iterator[FEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ordered = it.toArray
              .sortBy(e => (micros(e.ts), e.event_id))
            val out = Array.newBuilder[Attainment]
            var s = state.getOption.getOrElse(FunnelState(None, None, None))
            ordered.foreach { e =>
              val (s2, emitted) = f(s, e)
              s = s2
              emitted.foreach(out += _)
            }
            state.update(s)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }
}
