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
    val approx = MinHashDedup.candidatePairs(docs)
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

  test("simhash banded join finds planted exact and near dups, skips unrelated") {
    // sf0.001/sf0.01 documents contain NO exact dups (verified against
    // the parquet) — assert on planted fixtures, not vacuously
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val docs = Seq(
      (1L, base),
      (2L, base),                                   // exact dup → hamming 0
      (3L, base.replace("epsilon", "EPSILON")),     // near dup → tiny hamming
      (4L, "zero one two three four five six seven eight nine " * 5),
    ).toDF("doc_id", "text")
    val pairs = SimHash.nearDupPairs(docs, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((1L, 2L)).contains(0), s"exact dup missing: $pairs")
    assert(!pairs.keySet.exists { case (a, b) => b == 4L || a == 4L })
    // near-dup 3 may or may not clear hamming<=3; its distance to 1
    // must at least be far smaller than unrelated distance
    val s1 = SimHash.simhash(base)
    val s3 = SimHash.simhash(base.replace("epsilon", "EPSILON"))
    val s4 = SimHash.simhash("zero one two three four five six seven eight nine " * 5)
    assert(java.lang.Long.bitCount(s1 ^ s3) < java.lang.Long.bitCount(s1 ^ s4))
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
