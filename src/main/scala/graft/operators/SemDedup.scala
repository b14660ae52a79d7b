package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Pin, Tables}

/** Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv
  * 2303.09540): cluster the corpus embeddings into cells, then drop
  * near-duplicates WITHIN each cell only — the approximation that
  * turns O(n²) all-pairs embedding dedup into O(Σ|cell|²), the only
  * shape that survives a 100 TB corpus (q24's exact all-pairs is the
  * correctness baseline at small n).
  *
  * Cells come from the deterministic hash-pivot quantizer
  * ([[IvfIndex.buildPivots]] — portable masked-Knuth pivot choice,
  * cosine-argmax assignment), so a DuckDB oracle recomputes the whole
  * pipeline exactly: pivots → cells → within-cell pairs → min-id
  * cluster closure → survivors. The paper keeps a random doc per
  * cluster; we keep the minimum id — same semantics, deterministic.
  *
  * Scale shape: cell assignment is a shuffle-free projection (argmax
  * over nLists fused-cosine structs); the within-cell self-join
  * shuffles once on `cell`; the closure iterates on |dup-pair| rows
  * (≪ corpus); survivors anti-join the non-keepers. At 100 TB, cells
  * persist partitioned-by-cell so re-dedup after ingest prunes to the
  * touched cells.
  */
object SemDedup {

  /** Within-cell near-duplicate pairs at cosine ≥ tau. */
  def cellPairs(indexed: DataFrame, tau: Double): DataFrame = {
    import indexed.sparkSession.implicits._
    val a = indexed.select($"cell", $"vec_id".as("vec_a"),
      $"embedding".as("ea"))
    val b = indexed.select($"cell", $"vec_id".as("vec_b"),
      $"embedding".as("eb"))
    a.join(b, "cell")
      .filter($"vec_a" < $"vec_b" &&
        Similarity.cosineSim($"ea", $"eb") >= tau)
      .select($"cell", $"vec_a", $"vec_b")
  }

  /** Survivors of cell-restricted semantic dedup: every vector except
    * the non-minimum members of each within-cell duplicate cluster.
    * Returns (vec_id, cell, is_dup_survivor) — `is_dup_survivor` marks
    * survivors that represent a dropped cluster vs untouched singletons.
    */
  def semDedup(emb: DataFrame, tau: Double, nLists: Int = 16): DataFrame = {
    import emb.sparkSession.implicits._
    val (indexed, _) = IvfIndex.buildPivots(emb, nLists)
    val pinned = indexed.select($"vec_id", $"cell", $"embedding")
      .transform(Pin.reuse) // assignment feeds both join sides + output
    val pairs = cellPairs(pinned, tau)
    val clusters = DupClusters.connectedComponents(
      pairs.select($"vec_a".as("doc_a"), $"vec_b".as("doc_b")))
    val nonKeepers = clusters.filter($"id" =!= $"cluster_id")
      .select($"id".as("vec_id"))
    val reps = clusters.filter($"id" === $"cluster_id")
      .select($"id".as("vec_id"), lit(true).as("is_dup_survivor"))
    pinned.select($"vec_id", $"cell")
      .join(nonKeepers, Seq("vec_id"), "left_anti")
      .join(reps, Seq("vec_id"), "left")
      .select($"vec_id", $"cell",
        coalesce($"is_dup_survivor", lit(false)).as("is_dup_survivor"))
  }

  /** Q67 — semantic dedup of `embeddings` at tau = 0.4 over 16
    * hash-pivot cells.
    */
  def q67SemDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    semDedup(Tables.load(spark, dir, "embeddings"), tau = 0.4)
      .orderBy($"vec_id")
  }
}
