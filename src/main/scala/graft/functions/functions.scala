package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.{CosineSimilarityExpr, FingerprintExpr, SortedIntersectSizeExpr}

/** Public surface for graft's native Catalyst expressions. */
package object functions {

  /** Fused single-pass cosine similarity (codegen'd native
    * expression); accepts array<float> or array<double>.
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    CosineSimilarityExpr.column(a, b)

  /** |A ∩ B| of two sorted-ascending distinct array<bigint> columns —
    * codegen'd linear merge, no per-row hash set (the near-dup verify
    * hot loop).
    */
  def sortedIntersectSize(a: Column, b: Column): Column =
    SortedIntersectSizeExpr.column(a, b)

  /** Engine-portable polynomial string fingerprint
    * (`(acc·31 + ascii(char)) mod 1e9+7`) — codegen'd byte scan,
    * bit-identical to the Column HOF fold it replaces.
    */
  def fingerprintNative(s: Column): Column = FingerprintExpr.column(s)

  /** Register graft's SQL functions (`graft_cosine_sim`,
    * `graft_sorted_intersect_size`, `graft_fingerprint`) in a
    * session.
    */
  def registerAll(spark: SparkSession): Unit = {
    CosineSimilarityExpr.register(spark)
    SortedIntersectSizeExpr.register(spark)
    FingerprintExpr.register(spark)
  }
}
