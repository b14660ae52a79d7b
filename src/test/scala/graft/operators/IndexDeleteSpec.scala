package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Deletion propagation ([[IndexMaintenance.purge]]): for every
  * standing-index family, the purged index must be EXACTLY the index
  * a fresh build over the reduced corpus produces — no stale rows, no
  * collateral loss, and query results through the repaired index
  * match fresh-build results bit-for-bit.
  */
class IndexDeleteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val deleted = docs.filter($"doc_id" % 13 === 0)
    .select($"doc_id").localCheckpoint(true)
  private lazy val reduced = docs.filter($"doc_id" % 13 =!= 0)

  private def sortedRows(df: DataFrame) = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*)
      .orderBy(cols.map(col): _*)
      .collect().toSeq
  }

  test("BM25 postings: purge ≡ fresh docTermStats over the reduced " +
      "corpus, and repaired-index scores ≡ fresh-build scores") {
    val repaired = IndexMaintenance.purge(
      Retrieval.docTermStats(docs), deleted)
    assert(sortedRows(repaired) ===
      sortedRows(Retrieval.docTermStats(reduced)))
    val queries = Retrieval.prefixQueries(reduced).localCheckpoint(true)
    assert(sortedRows(Retrieval.bm25TopKFromIndex(repaired, queries, 5)) ===
      sortedRows(Retrieval.bm25TopK(reduced, queries, 5)))
  }

  test("positional postings: purge ≡ fresh extraction; phrase results " +
      "through the repaired index ≡ fresh corpus scan") {
    val repaired = IndexMaintenance.purge(
      Retrieval.positionalPostings(docs), deleted)
    assert(sortedRows(repaired) ===
      sortedRows(Retrieval.positionalPostings(reduced)))
    val phrases = Retrieval.phraseQueries(reduced).localCheckpoint(true)
    assert(sortedRows(Retrieval.phraseSearchFromIndex(repaired, phrases)) ===
      sortedRows(Retrieval.phraseSearch(reduced, phrases)))
  }

  test("IVF cells: purge under the frozen quantizer ≡ assigning the " +
      "reduced corpus under the same quantizer") {
    val emb = Tables.load(spark, sf, "embeddings")
    val (_, model) = IvfIndex.buildPivots(emb, nLists = 8)
    val full = IvfIndex.assign(emb, model)
    val delVecs = emb.filter($"vec_id" % 13 === 0).select($"vec_id")
    val repaired = IndexMaintenance.purge(full, delVecs, idCol = "vec_id")
      .select($"vec_id", $"cell")
    val fresh = IvfIndex.assign(emb.filter($"vec_id" % 13 =!= 0), model)
      .select($"vec_id", $"cell")
    assert(sortedRows(repaired) === sortedRows(fresh))
  }

  test("span n-gram postings: purge ≡ fresh ngramPositions; the " +
      "distinct-shingle index view follows") {
    val n = 8
    val repaired = IndexMaintenance.purge(
      SpanDedup.ngramPositions(docs, n), deleted)
    assert(sortedRows(repaired) ===
      sortedRows(SpanDedup.ngramPositions(reduced, n)))
    // the dedup-gate view (distinct sh) derived from the repaired
    // postings is the fresh-build gate
    assert(sortedRows(repaired.select($"sh").distinct()) ===
      sortedRows(SpanDedup.dupNgramIndex(reduced, n)))
  }
}
