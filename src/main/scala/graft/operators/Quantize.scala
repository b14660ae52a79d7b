package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Embedding compression for vector-store layouts — per-vector
  * symmetric int8 quantization (the standard 4× shrink before ANN
  * serving: q_i = round(x_i · 127 / max|x|), dequantize by
  * q_i · scale). Pure per-row higher-order expressions: no shuffle,
  * no UDF, embarrassingly parallel, so quantizing 100 TB of vectors
  * costs exactly one read-transform-write pass.
  *
  * Determinism contract: every element op (float→double widening,
  * one multiply, one divide, round-half-away) is an IEEE
  * correctly-rounded operation both engines evaluate identically in
  * the same order; the only emitted float (`scale`) is rounded to 6
  * as the stable contract.
  */
object Quantize {

  private def maxAbs(e: Column): Column =
    array_max(transform(e, x => abs(x)))

  /** (vec_id, scale, q) with q the int8 code array. Zero vectors
    * quantize to all-zero codes with scale 0.
    */
  def int8(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    emb
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .withColumn("maxabs", maxAbs($"e"))
      .select($"vec_id",
        when($"maxabs" === 0.0, lit(0.0))
          .otherwise(round($"maxabs" / 127.0, 6)).as("scale"),
        when($"maxabs" === 0.0,
          transform($"e", _ => lit(0L)))
          .otherwise(transform($"e",
            x => round(x * 127.0 / $"maxabs").cast("long"))).as("q"))
  }

  /** Q56 — int8 codes over `embeddings`, emitted in oracle-hashable
    * form (codes as a CSV string, plus their exact integer sum).
    */
  def q56Int8Quantize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    int8(Tables.load(spark, dir, "embeddings"))
      .select($"vec_id", $"scale",
        array_join(transform($"q", _.cast("string")), ",").as("q_csv"),
        aggregate($"q", lit(0L), (acc, x) => acc + x).as("qsum"))
      .orderBy($"vec_id")
  }
}
