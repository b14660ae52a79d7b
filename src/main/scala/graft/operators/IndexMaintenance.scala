package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** DELETION PROPAGATION through the standing indexes (VERDICT r11
  * #3) — the repair half of the index lifecycle. The ingest half
  * (bus → offset fence → per-batch extraction → append) grows every
  * standing index in O(batch); this operator SHRINKS them in
  * O(delete): when a takedown/retention commit removes a document
  * set from the corpus store (`VersionedTable.deleteKeys`), each
  * standing index must drop exactly that set's rows — without a
  * corpus-wide rebuild.
  *
  * Why one generic purge covers every index family: all four
  * standing indexes are PER-ROW KEYED by their source id —
  *  - BM25 postings `(doc_id, th, tf, dl)` ([[Retrieval.docTermStats]]),
  *  - positional postings `(doc_id, pos, th)` ([[Retrieval.positionalPostings]]),
  *  - IVF cell assignments `(vec_id, …, cell)` ([[IvfIndex.assign]]
  *    under a FROZEN quantizer),
  *  - span n-gram postings `(doc_id, p, sh)` ([[SpanDedup.ngramPositions]])
  * — no index row aggregates ACROSS documents (corpus-level scalars
  * like BM25's N/avgdl/df derive at QUERY time from the index, so
  * they shift correctly the moment rows vanish). Hence purge =
  * anti-join on the id, and the repaired index is bit-identical to a
  * fresh build over the reduced corpus — spec-pinned per family, and
  * oracle-checked end-to-end by q153 (BM25 over a repaired index vs
  * DuckDB over the reduced corpus).
  *
  * Scale shape: the delete set is a bounded takedown catalog (the
  * `VersionedTable.deleteKeys` contract), so it BROADCASTS into the
  * index scan — one map-side anti probe, no shuffle of the index.
  * When the index is PERSISTED in a `VersionedTable` with the id in
  * `statsCols` (ingest lands doc-clustered batches, so file bands
  * are tight), `deleteKeys` on that table prunes to the touched
  * files and the purge is O(touched files), never an index scan —
  * the IndexDeleteSpec pins the untouched-files-carried-verbatim
  * claim. Quantizer note: IVF repair keeps the coarse quantizer
  * FROZEN (the [[IvfIndex.assign]] incremental contract); deciding
  * to RE-TRAIN centroids after mass deletion is a rebuild decision,
  * not a repair.
  */
object IndexMaintenance {

  /** Drop every index row whose `idCol` is in `deleted` — broadcast
    * anti-join, the one purge primitive every per-row-keyed standing
    * index repairs with. `deleted` needs a single `idCol` column
    * (extra columns are ignored).
    */
  def purge(index: DataFrame, deleted: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    index.join(broadcast(deleted.select(col(idCol)).distinct()),
      Seq(idCol), "left_anti")

  /** Q153 — takedown end-to-end: build the BM25 postings index over
    * the FULL `documents` corpus, purge every 13th doc (the planted
    * takedown set), and serve top-5 BM25 from the REPAIRED index for
    * the surviving fixture queries. Corpus scalars (N, Σdl, df)
    * derive from the index at query time, so the repaired index
    * scores EXACTLY like a fresh build over the reduced corpus —
    * which is what the oracle computes directly.
    */
  def q153DeleteRepair(spark: SparkSession, dir: String,
      mod: Long = 13L): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val deleted = docs.filter($"doc_id" % mod === 0).select($"doc_id")
    val repaired = purge(Retrieval.docTermStats(docs), deleted)
    val queries = Retrieval.prefixQueries(
      docs.filter($"doc_id" % mod =!= 0))
    Retrieval.bm25TopKFromIndex(repaired, queries, k = 5)
      .orderBy($"query_id", $"rank")
  }

  /** DuckDB oracle for [[q153DeleteRepair]]: the q103 BM25 chain
    * over the REDUCED corpus (`doc_id % mod <> 0`) — the fresh-build
    * result the repaired index must match hash-for-hash.
    */
  def deleteRepairOracleSql(mod: Long = 13L): String =
    s"""WITH base AS (SELECT * FROM documents WHERE doc_id % $mod <> 0),
       | ${Retrieval.bm25CtesSql().replace("FROM documents", "FROM base")}
       |SELECT query_id,
       |  row_number() OVER (PARTITION BY query_id
       |    ORDER BY ticks DESC, doc_id) AS rank,
       |  doc_id, round(ticks / 1000000.0, 6) AS score
       |FROM sc
       |QUALIFY rank <= 5
       |ORDER BY query_id, rank""".stripMargin
}
