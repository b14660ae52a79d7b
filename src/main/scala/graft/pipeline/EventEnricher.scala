package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Port of `enrich_event` (`core/inference.py:89-126`) as a batch/
  * micro-batch operator: join incoming events against the online
  * feature view, with the reference's cold-start defaults for unseen
  * customers (new → `avg_purchase_value = purchase_value`,
  * `avg_loyalty_score = 0`, `core/inference.py:121-125`).
  *
  * The reference does a per-event `GetRecord` network call (J1); here
  * the whole batch joins once. The feature side is one row per customer
  * (the compacted online view) — small relative to the event stream —
  * so it broadcasts: the event side never shuffles.
  */
object EventEnricher {

  /** `events` needs (customer_id, purchase_value); `online` is the
    * compacted latest view with avg_/latest_ columns. Returns events +
    * the 3 model features (`core/constants.py:21`).
    */
  def enrich(events: DataFrame, online: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val feats = online.select(
      $"customer_id",
      $"latest_purchase_value".as("f_latest_purchase_value"),
      $"avg_purchase_value".as("f_avg_purchase_value"),
      $"avg_loyalty_score".as("f_avg_loyalty_score"))
    events.join(broadcast(feats), Seq("customer_id"), "left_outer")
      .withColumn("known_customer", $"f_avg_purchase_value".isNotNull)
      // existing: latest value is the incoming event's value
      // (inference.py:114-119); new: avg=value, loyalty avg=0
      // (inference.py:121-125).
      .withColumn("latest_purchase_value", $"purchase_value")
      .withColumn("avg_purchase_value",
        coalesce($"f_avg_purchase_value", $"purchase_value"))
      .withColumn("avg_loyalty_score",
        coalesce($"f_avg_loyalty_score", lit(0.0)))
      .drop("f_latest_purchase_value", "f_avg_purchase_value", "f_avg_loyalty_score")
  }
}
