package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-event-faithful streaming inference: the exact sequential
  * semantics of the reference loop (`core/inference.py:183-225` →
  * `core/feature_store_manager.py:240-282`), keyed state in
  * `flatMapGroupsWithState` instead of a store round-trip per event.
  *
  * For each event, IN (ts, event order) per key:
  *  1. enrich from current state (existing → stored averages,
  *     `inference.py:114-119`; new → avg=value, loyalty avg=0,
  *     `:121-125`)
  *  2. score: OLS dot product (coefficients broadcast — scoring is
  *     coef·x + b, no model object needed per row)
  *  3. A3 transition: existing → pairwise averages with the event
  *     value and the PREDICTED score (`feature_store_manager.py:
  *     260-264`); new → seed from event (`:227-230`)
  *
  * This is the serving-path dual of [[InferencePipeline]] (per-batch
  * MERGE): identical results when keys don't repeat within a batch,
  * exactly-sequential when they do. State is O(1) per customer —
  * scales with #customers under the RocksDB state store, independent
  * of event volume.
  */
object StatefulInference {

  final case class PEvent(customer_id: Long, purchase_timestamp: Timestamp,
      purchase_value: Double)
  final case class CustomerState(latest_purchase_value: Double,
      avg_purchase_value: Double, avg_loyalty_score: Double,
      latest_loyalty_score: Double)
  final case class Scored(customer_id: Long, purchase_timestamp: Timestamp,
      purchase_value: Double, predicted_loyalty_score: Double)

  /** One reference-loop step: (state, event) → (state', scored). */
  def step(coef: Array[Double], intercept: Double)(
      state: Option[CustomerState], e: PEvent): (CustomerState, Scored) = {
    // enrich (inference.py:89-126)
    val (avgP, avgL) = state match {
      case Some(s) => (s.avg_purchase_value, s.avg_loyalty_score)
      case None    => (e.purchase_value, 0.0)
    }
    // score on (latest=value, avgP, avgL) — constants.py:21 order
    val pred = coef(0) * e.purchase_value + coef(1) * avgP +
      coef(2) * avgL + intercept
    // A3 write-back (feature_store_manager.py:240-282)
    val next = state match {
      case Some(s) => CustomerState(
        e.purchase_value,
        (s.avg_purchase_value + e.purchase_value) / 2.0,
        (s.avg_loyalty_score + pred) / 2.0,
        pred)
      case None => CustomerState(e.purchase_value, e.purchase_value, pred, pred)
    }
    (next, Scored(e.customer_id, e.purchase_timestamp, e.purchase_value, pred))
  }

  /** @param idleTimeout optional processing-time TTL ("30 days"):
    *   keys idle longer are evicted (timed-out key → cold-start on
    *   next event). The reference never expires state; the TTL is the
    *   100 TB bound — state stays ∝ ACTIVE customers instead of
    *   all-time customers. None ⇒ reference parity (no expiry).
    */
  def apply(events: Dataset[PEvent], coef: Array[Double],
      intercept: Double, idleTimeout: Option[String] = None): Dataset[Scored] = {
    import events.sparkSession.implicits._
    val f = step(coef, intercept) _
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.customer_id)
      .flatMapGroupsWithState[CustomerState, Scored](
        OutputMode.Append(), timeoutConf) {
        (_: Long, it: Iterator[PEvent], state: GroupState[CustomerState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ordered = it.toArray.sortBy(e =>
              (e.purchase_timestamp.getTime, e.purchase_value))
            val out = Array.newBuilder[Scored]
            var s = state.getOption
            ordered.foreach { e =>
              val (s2, scored) = f(s, e)
              s = Some(s2)
              out += scored
            }
            s.foreach(state.update)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }
}
