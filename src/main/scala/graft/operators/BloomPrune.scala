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
    // validate the key type BEFORE any work: probing is typed on the
    // key's JVM type — mightContainLong for EVERY integral key (the
    // filter build side `stat.bloomFilter` hashes integrals as
    // longs), mightContainString for strings (both O(k) hash probes
    // per row). Any other key type is rejected loudly: a mistyped
    // probe against a long-built filter returns false for every
    // row — a silent empty result, not an error.
    import org.apache.spark.sql.types._
    val integral = fact.schema(factKey).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case StringType => false
      case other =>
        throw new IllegalArgumentException(
          s"semiJoinPruned: unsupported join-key type $other for " +
            s"'$factKey' — Bloom probing is defined for integral and " +
            "string keys only (matching Spark's bloomFilter build side)")
    }
    // empty dim side: the semi join is empty by definition — and
    // Spark's bloomFilter over zero rows yields a null-buffered
    // filter whose probe NPEs, so short-circuit before building it.
    // The probe is a column-pruned limit-1 plan (scans can early-exit)
    // so the common non-empty case pays near nothing.
    if (dim.select(col(dimKey)).limit(1).head(1).isEmpty)
      return fact.filter(lit(false))
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val probe =
      if (integral)
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
      else
        udf((k: String) => k != null && bc.value.mightContainString(k))
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
