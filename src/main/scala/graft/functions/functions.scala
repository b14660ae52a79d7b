package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.CosineSimilarityExpr

/** Public surface for graft's native Catalyst expressions. */
package object functions {

  /** Fused single-pass cosine similarity (codegen'd native
    * expression); accepts array<float> or array<double>.
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    CosineSimilarityExpr.column(a, b)

  /** Register graft's SQL functions (`graft_cosine_sim`) in a
    * session.
    */
  def registerAll(spark: SparkSession): Unit =
    CosineSimilarityExpr.register(spark)
}
