package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Bloom-filter pre-shuffle join pruning — the explicit form of the
  * row-level runtime filtering big joins need at 100 TB: build a
  * Bloom filter over the (small) dimension side's join keys, filter
  * the fact side BEFORE its shuffle, then finish with the exact semi
  * join. The Bloom pass has no false negatives, so the composition is
  * EXACTLY the semi join — false positives only cost shuffle bytes,
  * and the final join removes them.
  *
  * Why not rely on Spark's own runtime filtering? AQE's injected
  * bloom (`spark.sql.optimizer.runtime.bloomFilter.enabled`) fires
  * only within its creation/application size thresholds and can be
  * disabled by plan shape; this operator is the deterministic,
  * always-on version with an explicit size contract:
  * ~1.2 bytes/key at 1% fpp, driver-built (one small agg over dim
  * keys) and broadcast once. At 10⁹ dim keys the filter is ~1.2 GB —
  * past broadcast range — so the contract documents the switch:
  * partition the dim keys, build per-partition blooms, and OR them
  * executor-side, or fall back to a plain shuffled semi join.
  */
object BloomPrune {

  /** Fact rows whose `factKey` appears in `dim.dimKey` — exact semi
    * join, Bloom-accelerated. `expectedItems` sizes the filter (use
    * the dim-side distinct-key estimate; overestimating only wastes
    * filter bits, underestimating only raises fpp — never wrong
    * results).
    */
  def semiJoinPruned(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    // typed on the key's JVM type: mightContainLong for integral keys,
    // mightContainString otherwise (both O(k) hash probes per row)
    val probe = fact.schema(factKey).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType =>
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
      case _ =>
        udf((k: String) => k != null && bc.value.mightContainString(k))
    }
    fact.filter(probe(col(factKey)))
      .join(dim.select(col(dimKey).as(factKey)).distinct(),
        Seq(factKey), "left_semi")
  }

  /** Q78 — orders of BUILDING-segment customers via Bloom-pruned semi
    * join (result provably equals the plain semi join).
    */
  def q78BloomPrune(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
    val dim = Tables.load(spark, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING")
    semiJoinPruned(orders, "o_custkey", dim, "c_custkey",
        expectedItems = 100000L)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }
}
