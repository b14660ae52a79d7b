package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Q15 + north-star deduplication over `documents` (SURVEY.md §2.12
  * Q15; training-data-pipeline extension). Exact dedup here; near-dup
  * families (MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine)
  * live in [[NearDup]].
  *
  * Exact dedup at 100 TB: group on a 256-bit content hash, not the raw
  * text — the shuffle then carries ~32 bytes + doc_id per row instead
  * of whole documents, and skew collapses to genuinely-duplicate keys.
  */
object Dedup {

  /** Q15 — exact duplicate detection: texts appearing more than once. */
  def q15ExactDups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .groupBy($"text")
      .agg(count(lit(1)).as("c"))
      .filter($"c" > 1)
      .orderBy($"c".desc, $"text")
  }

  /** Q15b — dedup cardinality check (count vs distinct count). */
  def q15DedupStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .agg(count(lit(1)).as("n_rows"), countDistinct($"text").as("n_distinct"))
  }

  /** Scale path: keep one representative doc per distinct text, chosen
    * deterministically (min doc_id), grouping on sha2(text) so the
    * shuffle key is fixed-width. Returns the surviving doc_ids + text.
    */
  def dedupByContentHash(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("content_hash", sha2($"text", 256))
      .groupBy($"content_hash")
      .agg(min($"doc_id").as("doc_id"), first($"text").as("text"),
        count(lit(1)).as("dup_count"))
      .drop("content_hash")
  }

  /** Q15c — surviving-representative dedup, oracle-checkable shape:
    * min doc_id per distinct text plus how many copies it had.
    */
  def q15DedupSurvivors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dedupByContentHash(Tables.load(spark, dir, "documents"))
      .select($"doc_id", $"dup_count")
      .orderBy($"doc_id")
  }

  /** Incremental-ingest dedup — the steady-state shape of corpus
    * dedup at 100 TB: new batches are checked against the EXISTING
    * corpus's content-hash index instead of re-deduplicating the
    * whole corpus per ingest. One anti-join on the 32-byte hash:
    * O(|batch| + |index|) shuffled bytes, never O(|corpus|·text).
    * `within`-batch duplicates also collapse (min doc_id survives),
    * so the result is exactly the rows a full re-dedup would add.
    */
  def incrementalNew(batch: DataFrame, corpus: DataFrame): DataFrame = {
    import batch.sparkSession.implicits._
    val idx = corpus.select(sha2($"text", 256).as("content_hash")).distinct()
    batch
      .withColumn("content_hash", sha2($"text", 256))
      .join(idx, Seq("content_hash"), "left_anti")
      .groupBy($"content_hash")
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
  }

  /** Q55 — incremental dedup with the lower doc_id half as the
    * existing corpus and the upper half as the arriving batch.
    */
  def q55IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val top = docs.agg(max($"doc_id")).head() // null on an empty corpus
    val cut = if (top.isNullAt(0)) 0L else (top.getLong(0) + 1L) / 2L
    val (old, batch) =
      (docs.filter($"doc_id" < cut), docs.filter($"doc_id" >= cut))
    incrementalNew(batch, old)
      .select($"doc_id", $"content_hash", $"dup_count")
      .orderBy($"doc_id")
  }
}
