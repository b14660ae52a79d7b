package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class ScalePathSpec extends SparkSpec {
  import spark.implicits._

  test("MinHash-LSH surfaces every strong exact near-dup pair (no false negatives at sf)") {
    val docs = Tables.load(spark, sf, "documents")
    val exact = NearDup.jaccardPairs(docs, 0.7)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty) // planted near-dups exist in driver data
    val approx = MinHashDedup.candidatePairs(docs, maxDistance = 0.5)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.9, s"MinHash recall $recall on ${exact.size} strong pairs")
  }

  test("simhash: identical text → distance 0; one-token edit → small distance; unrelated → large") {
    val a = SimHash.simhash("the quick brown fox jumps over the lazy dog")
    val b = SimHash.simhash("the quick brown fox jumps over the lazy dog")
    val c = SimHash.simhash("the quick brown fox jumps over the lazy cat")
    val d = SimHash.simhash("entirely unrelated content about spark query engines")
    assert(a == b)
    assert(java.lang.Long.bitCount(a ^ c) < java.lang.Long.bitCount(a ^ d))
  }

  test("simhash banded join finds exact-duplicate docs (hamming 0) present in driver data") {
    val docs = Tables.load(spark, sf, "documents")
    val dupTexts = docs.groupBy($"text").agg(count(lit(1)).as("c"), min($"doc_id").as("a"),
        max($"doc_id").as("b"))
      .filter($"c" === 2)
      .select($"a", $"b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = SimHash.nearDupPairs(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every exact duplicate pair must be found (distance 0 ⇒ all chunks match)
    assert(dupTexts.forall(pairs.contains),
      s"missed ${dupTexts.count(!pairs.contains(_))} of ${dupTexts.size} exact dups")
  }

  test("ANN top-k: self-hit always found, recall vs brute force is usable") {
    val emb = Tables.load(spark, sf, "embeddings")
    val indexed = AnnIndex.index(emb).cache()
    val probes = emb.filter($"vec_id".isin(0L, 1L, 2L, 3L, 4L))
    val ann = AnnIndex.topK(indexed, probes, k = 10).cache()
    // self-similarity 1.0 must be in each probe's list (same bucket by construction)
    val selfHits = ann.filter($"probe_id" === $"vec_id").count()
    assert(selfHits == 5)
    val brute = Similarity.cosineTopK(spark, sf, Seq(0L, 1L, 2L, 3L, 4L), 10)
    val bruteSet = brute.select($"probe_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val annSet = ann.select($"probe_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bruteSet.count(annSet.contains).toDouble / bruteSet.size
    // these embeddings have no true near-dups (max pairwise cosine
    // ≈ 0.51 ⇒ θ ≈ 60°): per-bit collision prob ≈ 0.66, so radius-2
    // multiprobe on 8 bits gives ~0.4-0.5 theoretical recall. On
    // genuinely near-duplicate vectors (θ→0) recall → 1.
    info(s"ANN recall@10 = $recall")
    assert(recall >= 0.3, s"recall $recall")
  }

  test("ANN searches a fraction of the corpus (bucket pruning actually prunes)") {
    val emb = Tables.load(spark, sf, "embeddings")
    val indexed = AnnIndex.index(emb).cache()
    val total = indexed.count()
    val buckets = indexed.groupBy($"bucket").count()
    // 8-bit bucketing must spread the corpus: no bucket holds half of it
    assert(buckets.agg(max($"count")).head().getLong(0) < total / 2)
    assert(buckets.count() > 16)
  }
}
