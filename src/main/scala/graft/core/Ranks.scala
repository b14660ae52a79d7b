package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering — `row_number()` over a TOTAL
  * order without the single-reducer window.
  *
  * Why this exists: an unpartitioned `Window.orderBy(...)` plans as
  * `Exchange SinglePartition` + one window task holding EVERY row —
  * the exact shape the r14 (kSuppress) and r15 (Mondrian) verdicts
  * opened with, and fine only when the window's input is already
  * bounded (a `limit(k)` child, a partition-count-sized subtotal
  * frame). For a rank over DATA-sized input (q137's largest-remainder
  * apportionment ranks every crawl domain) the scalable form is the
  * classic two-level split:
  *
  *   1. `repartitionByRange` on the sort key — the range sampler
  *      balances partitions even when the leading key is skewed,
  *      because the composite key is total (ties on the leading
  *      column split across partitions by the tie-breaker).
  *   2. Per-partition row counts — ONE partition-count-sized frame
  *      (≤ `spark.sql.shuffle.partitions` rows); its running-sum
  *      window is bounded by the partition COUNT, never the data
  *      (the Mondrian bucket-subtotal treatment).
  *   3. Broadcast the offsets back and add a per-partition
  *      `row_number` — each window task holds one range partition
  *      (~N/P rows), so the busiest task is bounded by the range
  *      sampler's balance, not by the total row count.
  *
  * The per-partition window costs one extra exchange
  * (`hashpartitioning(_rnk_pid)`) over the ranked columns — two
  * distributed shuffles in place of one funnel through a single
  * task, the trade that survives a 100× scale-up.
  *
  * CONTRACT: `order` must be a TOTAL order over the frame (include a
  * unique tie-breaker). The assigned ranks are then a pure function
  * of the rows — independent of partition boundaries — so the result
  * is partition-invariant like every other operator; with ties the
  * rank of tied rows would instead depend on where the range sampler
  * cut, which is exactly the nondeterminism `row_number` over a
  * non-total window order has.
  */
object Ranks {

  /** Append `rankCol` = the 1-based global `row_number` under
    * `order`. `partitions` defaults to the session's shuffle
    * parallelism.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
      rankCol: String, partitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "globalRowNumber needs sort columns")
    val p =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // spark_partition_id() projects ABOVE the range exchange, so it
    // reads the range-bucket id; pinned because two consumers follow
    // (the offset counts and the ranked output)
    val ranged = Pin.reuse(
      df.repartitionByRange(p, order: _*)
        .withColumn("_rnk_pid", spark_partition_id()))
    // ≤ p rows: the one unpartitioned window, bounded by partition
    // count — empty range partitions simply have no row here, and no
    // data row joins to them either
    val offs = ranged.groupBy(col("_rnk_pid"))
      .agg(count(lit(1)).as("_rnk_n"))
      .withColumn("_rnk_off",
        sum(col("_rnk_n")).over(Window.orderBy(col("_rnk_pid")))
          - col("_rnk_n"))
      .select(col("_rnk_pid"), col("_rnk_off"))
    val wLocal = Window.partitionBy(col("_rnk_pid")).orderBy(order: _*)
    ranged.join(broadcast(offs), Seq("_rnk_pid"))
      .withColumn(rankCol,
        row_number().over(wLocal).cast("long") + col("_rnk_off"))
      .drop("_rnk_pid", "_rnk_off")
  }
}
