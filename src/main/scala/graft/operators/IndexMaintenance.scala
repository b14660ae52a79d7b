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

  /** Drop every index row whose `idCol` is in `deleted` — an
    * UNHINTED anti-join, the one purge primitive every per-row-keyed
    * standing index repairs with: AQE broadcasts a takedown batch
    * while it is small and shuffles an RTBF wave past threshold (a
    * forced broadcast hint is honored at any size). `deleted` needs a
    * single `idCol` column (extra columns are ignored).
    */
  def purge(index: DataFrame, deleted: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    index.join(deleted.select(col(idCol)).distinct(),
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

  /** Q170 — RETENTION END-TO-END, the age-based third leg of the
    * store/index lifecycle (grow → takedown → expire): ingest
    * `documents` into a [[graft.store.VersionedTable]] in
    * day-clustered batches (`ingest_day = doc_id div 10`, the
    * monotone-timestamp ingest norm, with `ingest_day` in
    * `statsCols` so file bands are tight), run
    * [[graft.store.VersionedTable.expireBefore]] at a cutoff of
    * one-third of the corpus age span, feed the expiry's
    * [[graft.store.VersionedTable.changesSince]] delete rows into
    * [[purge]] to repair the standing BM25 postings index, and serve
    * top-5 BM25 for the surviving fixture queries from the REPAIRED
    * index.
    *
    * The oracle computes the fresh build over the retained corpus
    * directly (`doc_id div 10 >= cutoff`) — the repaired index must
    * match it hash-for-hash, which proves the whole chain: the
    * store's whole-file drops removed exactly the expired rows, the
    * CDC feed named exactly the expired doc ids, and the purge left
    * an index bit-identical to a fresh build (q153's contract,
    * extended to age-based deletes).
    *
    * Driver reads: one scalar agg for the corpus age span (the
    * cutoff is policy input — a constant at deployment, computed
    * here so the fixture scales with sf) and the bounded ingest
    * loop; the expiry itself is manifest work + at most one boundary
    * rewrite.
    */
  def q170RetentionExpire(spark: SparkSession, dir: String,
      batches: Int = 5): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val stamped = docs.withColumn("ingest_day", expr("doc_id div 10"))
    val maxDayRow = stamped.agg(max($"ingest_day")).head()
    if (maxDayRow.isNullAt(0)) {
      // zero-row corpus: nothing to ingest, expire, or repair — the
      // empty report with the output schema (the q153 empty path)
      return Retrieval.bm25TopKFromIndex(
          Retrieval.docTermStats(docs), Retrieval.prefixQueries(docs),
          k = 5)
        .orderBy($"query_id", $"rank")
    }
    val maxDay = maxDayRow.getLong(0)
    val cutoff = (maxDay + 1) / 3
    val root = graft.core.Scratch.dir(spark, "graft-retention")
    val vt = new graft.store.VersionedTable(spark, root,
      statsCols = Seq("ingest_day"))
    // day-clustered ingest: batch b holds days [b·w, (b+1)·w) — the
    // monotone arrival order a real pipeline lands
    val w = (maxDay + batches) / batches
    (0L until batches.toLong).foreach { b =>
      vt.commit(stamped.filter(
        $"ingest_day" >= b * w && $"ingest_day" < (b + 1) * w))
    }
    val vFull = vt.currentVersion.get
    vt.expireBefore("ingest_day", cutoff.toString)
    // CDC delete feed → standing-index repair (the q153 purge, keyed
    // by age instead of takedown catalog)
    val deleted = vt.changesSince(vFull)
      .filter($"change_type" === "delete").select($"doc_id")
    val repaired = purge(Retrieval.docTermStats(docs), deleted)
    val queries = Retrieval.prefixQueries(vt.read())
    val report = Retrieval.bm25TopKFromIndex(repaired, queries, k = 5)
      .orderBy($"query_id", $"rank")
    // the report's plan reads the temp store (vt.read / changesSince);
    // SNAPSHOT it so the fixture store can be deleted before returning
    // — bench/correctness harnesses re-run this query, and without the
    // cleanup every invocation leaked a corpus-sized store into /tmp.
    // Plans mode keeps the LAZY plan (explain-only, nothing executes)
    // and cleans the store prefixes itself.
    snapshotAndDrop(report, root)
  }

  /** Fixture-store hygiene shared by the lifecycle queries (q170/
    * q173/q174): pin the report, delete the temp store. Under
    * `spark.graft.keepFixtureStores=true` (set by `graft.Plans`)
    * returns the lazy frame instead so the physical plan stays
    * inspectable.
    */
  private[operators] def snapshotAndDrop(report: DataFrame,
      root: String): DataFrame = {
    val spark = report.sparkSession
    if (spark.conf.getOption("spark.graft.keepFixtureStores")
        .contains("true")) report
    else
      try graft.core.Pin.snapshot(report)
      finally {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true): Unit
      }
  }

  /** Q174 — FORGET-DOCS END-TO-END: the corpus-side right-to-be-
    * forgotten orchestration ([[graft.store.CorpusForget.forgetDocs]])
    * driven as ONE txn-fenced call — `documents` lands in a versioned
    * corpus store with a standing BM25 postings table; a takedown
    * catalog (every 11th doc) forgets through the one call (standing
    * index purged first, fenced corpus delete last); the query serves
    * top-5 BM25 from the purged standing table over the surviving
    * corpus. Oracle: the fresh build over the reduced corpus — the
    * q153 contract, now driven through the orchestration op instead
    * of hand-sequenced purges.
    */
  def q174ForgetDocs(spark: SparkSession, dir: String,
      mod: Long = 11L): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    val victims = docs.filter($"doc_id" % mod === 0)
      .select($"doc_id").as[Long].collect().toSeq
    val root = graft.core.Scratch.dir(spark, "graft-forget")
    val corpus = new graft.store.VersionedTable(spark, s"$root/corpus",
      statsCols = Seq("doc_id"))
    corpus.commit(docs)
    val bm25 = new graft.store.VersionedTable(spark, s"$root/bm25",
      statsCols = Seq("doc_id"))
    bm25.commit(Retrieval.docTermStats(corpus.read()))
    if (victims.nonEmpty)
      graft.store.CorpusForget.forgetDocs(corpus, "doc_id", victims,
        Seq(graft.store.CorpusForget.DerivedTier("bm25", bm25)),
        txnId = Some("q174-forget")): Unit
    val queries = Retrieval.prefixQueries(corpus.read())
    snapshotAndDrop(
      Retrieval.bm25TopKFromIndex(bm25.read(), queries, k = 5)
        .orderBy($"query_id", $"rank"), root)
  }

  /** DuckDB oracle for [[q170RetentionExpire]]: the q103 BM25 chain
    * over the RETAINED corpus (`doc_id div 10 >= cutoff`, cutoff =
    * one-third of the day span) — the fresh-build result the
    * repaired index must match hash-for-hash.
    */
  def retentionExpireOracleSql: String =
    s"""WITH cut AS (SELECT (max(doc_id) // 10 + 1) // 3 AS c FROM documents),
       | base AS (SELECT d.* FROM documents d, cut WHERE d.doc_id // 10 >= cut.c),
       | ${Retrieval.bm25CtesSql().replace("FROM documents", "FROM base")}
       |SELECT query_id,
       |  row_number() OVER (PARTITION BY query_id
       |    ORDER BY ticks DESC, doc_id) AS rank,
       |  doc_id, round(ticks / 1000000.0, 6) AS score
       |FROM sc
       |QUALIFY rank <= 5
       |ORDER BY query_id, rank""".stripMargin
}
