package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data-quality utilities for pipeline ingest: one-pass profiling and
  * deterministic stratified sampling.
  */
object Profiling {

  /** Q39 — one-pass profile of `events`: row/null counts and ranges.
    * All aggregates fold in a single partial+final pass — profiling
    * 100 TB costs one scan, not one scan per metric.
    */
  def q39Profile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .agg(
        count(lit(1)).as("n_rows"),
        count($"value").as("n_value"),
        count($"props").as("n_props"),
        min($"value").as("min_value"),
        max($"value").as("max_value"),
        min($"ts").as("min_ts"),
        max($"ts").as("max_ts"),
        countDistinct($"event_type").as("n_types"))
  }

  /** Q53 — exact per-source length quantiles over `documents`:
    * the distribution summary a curation pipeline thresholds on
    * (truncation budgets, length filters). `percentile` is the exact
    * linear-interpolation quantile — identical definition
    * ((n−1)·q rank) in Spark and DuckDB `quantile_cont`, computed on
    * exact BIGINT inputs, so the doubles agree; rounded to 6 as the
    * stable float contract. One partial+final agg pass; exact
    * quantiles hold sorted per-group state, so at 100 TB per-group
    * cardinality this switches to `approx_percentile` (t-digest,
    * mergeable fixed-size sketch) — same call shape, documented
    * trade.
    */
  def q53Quantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n"),
        round(avg($"n_chars"), 6).as("mean_chars"),
        round(percentile($"n_chars", lit(0.25)), 6).as("p25"),
        round(percentile($"n_chars", lit(0.5)), 6).as("p50"),
        round(percentile($"n_chars", lit(0.75)), 6).as("p75"),
        round(percentile($"n_chars", lit(0.9)), 6).as("p90"))
      .orderBy($"source")
  }

  /** Key-skew diagnostics — the report that decides the
    * [[Layout]] salting knob before a big join/agg: per-key counts
    * for the hottest keys plus their share of the table. One
    * partial+final agg then a global top-k (`TakeOrderedAndProject` —
    * k rows to the driver, never a sort); share is one division of
    * exact integers.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    import df.sparkSession.implicits._
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum($"cnt").as("total"))
    counts.crossJoin(broadcast(total))
      .select($"key", $"cnt",
        round($"cnt".cast("double") / $"total", 6).as("share"))
      .orderBy($"cnt".desc, $"key")
      .limit(topK)
  }

  /** Q62 — hottest event types with their table share. */
  def q62SkewHotkeys(spark: SparkSession, dir: String): DataFrame =
    skewReport(Tables.load(spark, dir, "events"), "event_type")

  /** Deterministic stratified sample: per-stratum fractions with a
    * fixed seed (`sampleBy` = per-row Bernoulli keyed on the stratum —
    * no shuffle, exact-fraction in expectation). Training pipelines
    * use this for class-balanced subsets; determinism makes reruns
    * reproducible.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)
}
