package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Near-duplicate detection over `documents` — the training-data-
  * pipeline dedup family (north star). The reference has no dedup at
  * all; exact dedup is [[Dedup]].
  *
  * q18 (oracle-checked): exact n-gram Jaccard via an inverted shingle
  * index — the standard exact-similarity-join shape at scale:
  * 1. per doc: distinct 3-word shingles (codegen'd higher-order fns)
  * 2. explode → (shingle, doc) postings; one shuffle on shingle
  * 3. self-join postings per shingle with doc_a < doc_b → co-counts
  * 4. jaccard = co / (|A| + |B| − co), filter ≥ τ
  * Only pairs sharing ≥1 shingle are ever materialized, so cost is
  * bounded by postings-list skew, not |docs|² — at 100 TB, frequent
  * shingles get dropped by a df-cut (stop-shingling), keeping
  * postings lists short. Probabilistic families (MinHash-LSH,
  * SimHash) are in [[MinHashDedup]] / [[SimHash]] — not
  * SQL-reproducible, so spec-checked instead of oracle-checked.
  */
object NearDup {

  /** Distinct n-word shingles of a space-tokenized text. Empty for
    * texts shorter than n tokens (guard needed: Spark `sequence`
    * counts DOWN when stop < start instead of returning empty).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ", -1)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Exact Jaccard similarity join: pairs (doc_a < doc_b) with
    * 3-gram-shingle Jaccard ≥ minJaccard.
    */
  def jaccardPairs(docs: DataFrame, minJaccard: Double): DataFrame = {
    import docs.sparkSession.implicits._
    val sh = docs
      .select($"doc_id", explode(shingles($"text")).as("shingle"))
    val counts = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val co = sh.as("a").join(sh.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("co"))
    co.join(broadcast(counts.select($"doc_id".as("doc_a"), $"n".as("na"))), "doc_a")
      .join(broadcast(counts.select($"doc_id".as("doc_b"), $"n".as("nb"))), "doc_b")
      .withColumn("jac", $"co".cast("double") / ($"na" + $"nb" - $"co"))
      .filter($"jac" >= minJaccard)
      .select($"doc_a", $"doc_b", $"jac")
  }

  /** Q18 — oracle-checked near-dup pairs at τ = 0.5. */
  def q18NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    jaccardPairs(Tables.load(spark, dir, "documents"), 0.5)
      .orderBy($"doc_a", $"doc_b")
  }

  /** Embedding near-dup: pairs with cosine ≥ τ. Exact all-pairs via a
    * broadcast self-join (corpus × corpus is fine while one side
    * broadcasts; the 100 TB path buckets by LSH first — see
    * [[AnnIndex]] — and verifies candidates with this same exact
    * cosine).
    */
  def q24EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding")
    val right = emb.select($"vec_id".as("vec_b"), $"embedding".as("emb_b"))
    emb.select($"vec_id".as("vec_a"), $"embedding".as("emb_a"))
      .join(broadcast(right), $"vec_a" < $"vec_b")
      .withColumn("sim", Similarity.cosineSim($"emb_a", $"emb_b"))
      .filter($"sim" >= 0.4)
      .select($"vec_a", $"vec_b", $"sim")
      .orderBy($"vec_a", $"vec_b")
  }
}
