package graft.operators

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash-LSH near-duplicate candidate generation — the probabilistic
  * scale path next to the exact inverted-index join in [[NearDup]].
  * At 100 TB the exact join's postings lists on hot shingles explode;
  * MinHash keeps per-doc state at a fixed signature width and LSH
  * banding turns the similarity join into an equi-join on band hashes.
  *
  * Built on public Spark ML: shingles → binary `HashingTF` vector →
  * `MinHashLSH` → `approxSimilarityJoin` (band-bucket equi-join +
  * exact Jaccard-on-vector verify). Probabilistic ⇒ spec-checked
  * (planted dups must surface), not oracle-checked.
  */
object MinHashDedup {

  /** Candidate near-dup pairs with hashed-set Jaccard distance ≤
    * maxDistance. Output: (doc_a, doc_b, jaccard_dist), doc_a < doc_b.
    */
  /** numHashTables is OR-amplification only (Spark ML MinHashLSH):
    * P(miss a pair at Jaccard j) = (1−j)^tables. 4 tables put a
    * 0.9-Jaccard near-dup's miss odds at 1e-4 while halving the
    * candidate-join cost vs 8; raise for lower-similarity targets.
    */
  def candidatePairs(
      docs: DataFrame,
      maxDistance: Double = 0.5,
      numHashTables: Int = 4,
      seed: Long = 42L): DataFrame = {
    import docs.sparkSession.implicits._
    val shingled = docs.select($"doc_id",
      NearDup.shingles($"text").as("shingles"))
    // binary term-presence vector; 2^18 features keeps the
    // collision-induced Jaccard error ≪ the LSH approximation itself
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("vec")
      .setNumFeatures(1 << 18).setBinary(true)
    val vecs = tf.transform(shingled).filter(size($"shingles") > 0)
    val lsh = new MinHashLSH().setInputCol("vec").setOutputCol("bands")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, maxDistance, "jaccard_dist")
      .select(
        $"datasetA.doc_id".as("doc_a"),
        $"datasetB.doc_id".as("doc_b"),
        $"jaccard_dist")
      .filter($"doc_a" < $"doc_b")
  }
}
