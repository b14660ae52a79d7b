package graft.operators

import graft.SparkSpec
import graft.core.Tables

class DfCutSpec extends SparkSpec {
  import spark.implicits._

  test("df-cut keeps the strong near-dup pairs on this corpus while shrinking the index") {
    val docs = Tables.load(spark, sf, "documents")
    val exact = NearDup.jaccardPairs(docs, 0.5)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // cut shingles present in >5% of docs
    val cut = NearDup.jaccardPairsDfCut(docs, 0.5, dfCut = 25)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(cut.contains).toDouble / exact.size
    info(s"df-cut recall on strong pairs = $recall")
    assert(recall >= 0.9, s"recall $recall over ${exact.size} pairs")
  }
}
