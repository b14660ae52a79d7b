package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout controls for 100 TB: bucketed tables (co-located,
  * shuffle-free joins) and key salting (skew spreading). These are the
  * knobs SCALE.md's claims rest on; each has a plan-level spec
  * (LayoutSpec) proving the exchange disappears / the skew spreads.
  */
object Layout {

  /** Write `df` as a bucketed managed table. Joins between tables
    * bucketed the same way on the join key plan with zero Exchange on
    * either side (asserted in LayoutSpec). This is how the offline
    * store and the online view co-locate with event streams at scale:
    * bucket both by the entity key once at write time, join forever
    * without shuffling.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Salted aggregation for skewed keys: two-phase group-by. Phase 1
    * groups on (key, salt) — the hot key's rows spread over
    * `saltBuckets` reducers; phase 2 merges the partials. Correct for
    * algebraic aggregates (sum/count here; min/max/avg derivable).
    */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
      saltBuckets: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
      .groupBy(col(keyCol), $"_salt")
      .agg(sum(col(valueCol)).as("_s"), count(lit(1)).as("_c"))
      .groupBy(col(keyCol))
      .agg(sum($"_s").as("total"), sum($"_c").as("n"))
  }

  /** Salted broadcast-replicated join for a skewed fact side: the dim
    * side is exploded `saltBuckets`× with a salt column, the fact side
    * gets a random-ish but deterministic salt, and the join key
    * becomes (key, salt) — a single hot key's rows land on
    * `saltBuckets` different reducers instead of one. Use when the
    * dim side is too big to broadcast outright but the fact key
    * distribution is pathological.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    import fact.sparkSession.implicits._
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("_salt", $"_salt".cast("long"))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
