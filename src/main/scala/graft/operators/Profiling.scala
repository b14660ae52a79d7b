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
