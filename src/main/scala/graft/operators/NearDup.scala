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
    * 3-gram-shingle Jaccard ≥ minJaccard. Postings join on the 64-bit
    * shingle hash, not the string — the shuffle carries 8 bytes per
    * posting instead of ~20-char text (collision odds at 64 bits are
    * ~n²/2⁶⁴, irrelevant below trillions of distinct shingles).
    */
  def jaccardPairs(docs: DataFrame, minJaccard: Double): DataFrame =
    jaccardPairsDfCut(docs, minJaccard, dfCut = Int.MaxValue)

  /** [[jaccardPairs]] with stop-shingling: shingles occurring in more
    * than `dfCut` documents are dropped from the INDEX (candidate
    * generation) — the standard cap on postings-list skew at corpus
    * scale. NOTE this makes the join approximate (a pair whose every
    * shared shingle is hot gets missed) and changes the Jaccard
    * denominator to the kept-shingle sets, so the oracle-checked q18
    * uses dfCut = ∞; the cut exists for the 100 TB path and is
    * spec-checked against the exact result on this corpus.
    */
  def jaccardPairsDfCut(docs: DataFrame, minJaccard: Double,
      dfCut: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val shAll = docs
      .select($"doc_id", explode(shingles($"text")).as("shingle"))
      .select($"doc_id", xxhash64($"shingle").as("sh"))
    val sh =
      if (dfCut == Int.MaxValue) shAll
      else {
        val hot = shAll.groupBy($"sh").agg(count(lit(1)).as("df"))
          .filter($"df" > dfCut).select($"sh")
        shAll.join(broadcast(hot), Seq("sh"), "left_anti")
      }
    val counts = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    // pair generation: group postings per shingle and emit ordered
    // combinations with codegen'd array lambdas — one shuffle on the
    // shingle instead of the self-join's two + join (measured ~30%
    // faster at sf0.1, identical output)
    val lists = sh.groupBy($"sh")
      .agg(sort_array(collect_list($"doc_id")).as("ds"))
      .filter(size($"ds") > 1)
    val co = lists.select(explode(flatten(transform($"ds", (x, i) =>
        transform(slice($"ds", i + 2, size($"ds")), y =>
          struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .groupBy($"p.doc_a".as("doc_a"), $"p.doc_b".as("doc_b"))
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

  /** Embedding near-dup: exact all-pairs cosine ≥ τ as a distributed
    * tile×tile self-join — no driver collect, no whole-corpus
    * broadcast (the r1 shape died at scale: O(corpus) driver memory).
    *
    * Each vector hashes to one of `nBlocks` blocks; the unordered
    * block pair (i ≤ j) is the tile key. The left side replicates a
    * row to tiles (blk, j ≥ blk), the right side to tiles (i ≤ blk,
    * blk), so every vector pair meets in EXACTLY one tile and each
    * row is replicated ≤ nBlocks times — O(N·B) shuffle for O(N²)
    * pair work, the classic triangle-join scheme. Per-pair cosine is
    * the fused codegen'd expression ([[Similarity.cosineSim]], one
    * pass, no intermediate arrays). At 100 TB, set nBlocks ≈
    * √parallelism so tiles saturate the cluster while the sort-merge
    * join buffers only N/B rows per tile key (spillable).
    */
  def embeddingNearDupPairs(emb: DataFrame, tau: Double,
      nBlocks: Int = 16): DataFrame = {
    import emb.sparkSession.implicits._
    val v = emb.select($"vec_id",
        $"embedding".cast("array<double>").as("e"),
        pmod(xxhash64($"vec_id"), lit(nBlocks.toLong)).cast("int").as("blk"))
    val left = v
      .withColumn("tj", explode(sequence($"blk", lit(nBlocks - 1))))
      .select($"vec_id".as("ida"), $"e".as("ea"), $"blk".as("ti"), $"tj")
    val right = v
      .withColumn("ti", explode(sequence(lit(0), $"blk")))
      .select($"vec_id".as("idb"), $"e".as("eb"), $"ti", $"blk".as("tj"))
    left.join(right, Seq("ti", "tj"))
      // same-block tile keeps one ordering; cross-block tiles already
      // see each unordered pair exactly once
      .filter($"ti" < $"tj" || $"ida" < $"idb")
      .withColumn("sim", Similarity.cosineSim($"ea", $"eb"))
      .filter($"sim" >= tau)
      .select(least($"ida", $"idb").as("vec_a"),
        greatest($"ida", $"idb").as("vec_b"), $"sim")
  }

  def q24EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    embeddingNearDupPairs(Tables.load(spark, dir, "embeddings"), 0.4)
      .orderBy($"vec_a", $"vec_b")
  }
}
