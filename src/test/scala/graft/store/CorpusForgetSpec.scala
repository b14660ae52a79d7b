package graft.store

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.core.Tables
import graft.operators.{ImageHash, NearDup, Retrieval}
import graft.store.CorpusForget.DerivedTier

/** [[CorpusForget.forgetDocs]] — the corpus-side right-to-be-
  * forgotten orchestration (r13 VERDICT #1): one txn-fenced call
  * composing the corpus `deleteKeys`, every standing index family's
  * purge, serving republish + cache invalidation — tier-ordered like
  * `FeatureStore.forgetKeys` so a crash between tiers converges on
  * replay instead of leaving standing indexes serving deleted docs.
  */
class CorpusForgetSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def docsFixture: DataFrame =
    Tables.load(spark, sf, "documents").limit(60).localCheckpoint(true)

  /** Corpus store + three standing index tables (BM25 postings,
    * positional postings, winnowing fingerprints — all doc-keyed),
    * each ingested doc-clustered so stats prune.
    */
  private def buildStores(docs: DataFrame) = {
    val corpus = new VersionedTable(spark, tmp("cf-corpus"),
      statsCols = Seq("doc_id"))
    corpus.commit(docs)
    def indexTable(name: String, rows: DataFrame) = {
      val t = new VersionedTable(spark, tmp(s"cf-$name"),
        statsCols = Seq("doc_id"))
      t.commit(rows)
      t
    }
    val bm25 = indexTable("bm25", Retrieval.docTermStats(docs))
    val positional = indexTable("pos", Retrieval.positionalPostings(docs))
    val winnow = indexTable("win", NearDup.winnowedFingerprints(docs))
    (corpus, bm25, positional, winnow)
  }

  test("one call purges the corpus and every doc-keyed index family; " +
      "each repaired table equals a fresh build over the reduced corpus") {
    val docs = docsFixture
    val (corpus, bm25, positional, winnow) = buildStores(docs)
    val victims = docs.filter($"doc_id" % 3 === 0)
      .select($"doc_id").as[Long].collect().toSeq

    val report = CorpusForget.forgetDocs(corpus, "doc_id", victims,
      Seq(DerivedTier("bm25", bm25), DerivedTier("positional", positional),
        DerivedTier("winnowing", winnow)),
      txnId = Some("forget-1"))

    val reduced = docs.filter($"doc_id" % 3 =!= 0)
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(corpus.read()) === rows(reduced))
    assert(rows(bm25.read()) === rows(Retrieval.docTermStats(reduced)))
    assert(rows(positional.read()) ===
      rows(Retrieval.positionalPostings(reduced)))
    assert(rows(winnow.read()) ===
      rows(NearDup.winnowedFingerprints(reduced)))
    // audit evidence on every tier + the fenced corpus commit: counts
    // only, the keys themselves never enter a manifest
    assert(!report.replaySkipped)
    assert(report.corpusAudit("key_count") === victims.size.toString)
    assert(report.corpusAudit("rows_removed").toLong === victims.size.toLong)
    assert(Set("bm25", "positional", "winnowing")
      .subsetOf(report.tierAudits.keySet))
    report.tierAudits.values.foreach { a =>
      assert(a("key_count") === victims.size.toString)
      assert(a.contains("rows_removed"))
    }
  }

  test("a media tier keyed by its own id purges through keysFor — " +
      "the doc→media expansion") {
    val docs = docsFixture
    val corpus = new VersionedTable(spark, tmp("cf-corpus2"),
      statsCols = Seq("doc_id"))
    corpus.commit(docs)
    // media fixture: base rendition per doc at media_id = doc_id*10
    val docIds = docs.select($"doc_id").as[Long].collect().toSeq.take(20)
    val media = docIds.map(i => (i * 10, ImageHash.render(i, 1, "png")))
      .toDF("media_id", "payload")
    val sigTable = new VersionedTable(spark, tmp("cf-sig"),
      statsCols = Seq("media_id"))
    sigTable.commit(ImageHash.signatures(media))

    val victims = docIds.take(5)
    CorpusForget.forgetDocs(corpus, "doc_id", victims,
      Seq(DerivedTier("sig", sigTable, idCol = "media_id",
        keysFor = ks => ks.map { case d: Long => d * 10 })),
      txnId = Some("forget-media"))

    val gone = victims.map(_ * 10).toSet
    val left = sigTable.read().select($"media_id").as[Long].collect().toSet
    assert(left.intersect(gone).isEmpty)
    assert(left === docIds.drop(5).map(_ * 10).toSet)
  }

  test("crash between tiers converges on replay: a failure after the " +
      "first index purge leaves the txn uncommitted; the replay " +
      "re-purges (no-op) and lands the fence") {
    val docs = docsFixture
    val (corpus, bm25, positional, winnow) = buildStores(docs)
    val victims = Seq(0L, 3L, 6L)

    // tier 2 crashes in republish on the FIRST attempt only
    var attempts = 0
    val crashing = DerivedTier("positional", positional,
      republish = () => {
        attempts += 1
        if (attempts == 1) sys.error("simulated crash between tiers")
      })
    val tiers = Seq(DerivedTier("bm25", bm25), crashing,
      DerivedTier("winnowing", winnow))

    intercept[RuntimeException] {
      CorpusForget.forgetDocs(corpus, "doc_id", victims, tiers,
        txnId = Some("forget-crash"))
    }
    // the crash happened AFTER bm25's purge and positional's delete,
    // BEFORE winnowing and the corpus commit: the fence is open, the
    // corpus still serves the victims, winnowing still indexes them
    assert(!corpus.txnCommitted("forget-crash"))
    assert(corpus.read().filter($"doc_id".isin(victims: _*)).count() === 3L)
    assert(winnow.read().filter($"doc_id".isin(victims: _*)).count() > 0L)

    // replay with the same txn: already-purged tiers no-op (their
    // stats prune to zero touched files), the rest purge, the fence
    // lands — convergence
    val report = CorpusForget.forgetDocs(corpus, "doc_id", victims, tiers,
      txnId = Some("forget-crash"))
    assert(!report.replaySkipped)
    assert(corpus.txnCommitted("forget-crash"))
    val reduced = docs.filter(!$"doc_id".isin(victims: _*))
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(corpus.read()) === rows(reduced))
    assert(rows(bm25.read()) === rows(Retrieval.docTermStats(reduced)))
    assert(rows(positional.read()) ===
      rows(Retrieval.positionalPostings(reduced)))
    assert(rows(winnow.read()) ===
      rows(NearDup.winnowedFingerprints(reduced)))
    // already-purged bm25: the replay's delete removed ZERO rows
    // (bands of the rewritten file still overlap the keys, so the
    // value-idempotent rewrite may republish — but removes nothing)
    report.tierAudits.get("bm25").foreach { a =>
      assert(a("rows_removed").toLong === 0L)
    }

    // a SECOND replay after the fence landed skips everything
    val vAfter = corpus.currentVersion.get
    val replay = CorpusForget.forgetDocs(corpus, "doc_id", victims, tiers,
      txnId = Some("forget-crash"))
    assert(replay.replaySkipped)
    assert(corpus.currentVersion.get === vAfter)
  }

  test("ServingDeleteSpec parity through the ONE call: the BM25 " +
      "serving tier answers from the repaired index after forgetDocs " +
      "ran its republish + invalidate") {
    val docs = Tables.load(spark, sf, "documents").limit(120)
      .localCheckpoint(true)
    val corpus = new VersionedTable(spark, tmp("cf-corpus3"),
      statsCols = Seq("doc_id"))
    corpus.commit(docs)
    val bm25Table = new VersionedTable(spark, tmp("cf-bm25s"),
      statsCols = Seq("doc_id"))
    bm25Table.commit(Retrieval.docTermStats(docs))
    val servingDir = tmp("cf-bm25-serve")
    SearchEndpoint.writeBm25Index(bm25Table.read(), servingDir, nBuckets = 8)
    val tier = new Bm25SearchTier(spark, servingDir, nBuckets = 8)

    val text = docs.filter($"doc_id" === 1L).select($"text").as[String].head()
    val terms = text.split(" ", -1).take(4).toSeq.map(NearDup.tokenHash64)
    val before = tier.search(terms, k = 5)
    assert(before.nonEmpty)

    val victims = docs.filter($"doc_id" % 3 === 0)
      .select($"doc_id").as[Long].collect().toSeq
    CorpusForget.forgetDocs(corpus, "doc_id", victims,
      Seq(DerivedTier("bm25", bm25Table,
        republish = () => SearchEndpoint.writeBm25Index(
          bm25Table.read(), servingDir, nBuckets = 8),
        invalidate = () => tier.invalidate())),
      txnId = Some("forget-serving"))

    val after = tier.search(terms, k = 5)
    val queries = terms.distinct.map(th => (-1L, th)).toDF("query_id", "th")
    val want = Retrieval.bm25TopKFromIndex(bm25Table.read(), queries, k = 5)
      .orderBy($"rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
      .map(r => (r._2, r._3, r._4))
    assert(after === want)
    assert(after !== before) // scalars really shifted with the forget
    val gone = victims.toSet
    assert(after.forall(r => !gone.contains(r._2)))
  }

  test("guards: empty/NULL key lists throw; a never-ingested key is " +
      "a no-op everywhere with an empty audit; an empty tier table " +
      "is skipped") {
    val docs = docsFixture
    val (corpus, bm25, _, _) = buildStores(docs)
    intercept[IllegalArgumentException] {
      CorpusForget.forgetDocs(corpus, "doc_id", Nil)
    }
    intercept[IllegalArgumentException] {
      CorpusForget.forgetDocs(corpus, "doc_id", Seq(1L, null))
    }
    val vC = corpus.currentVersion.get
    val vB = bm25.currentVersion.get
    val emptyTier = new VersionedTable(spark, tmp("cf-empty"))
    val report = CorpusForget.forgetDocs(corpus, "doc_id", Seq(999999L),
      Seq(DerivedTier("bm25", bm25), DerivedTier("empty", emptyTier)))
    assert(corpus.currentVersion.get === vC)
    assert(bm25.currentVersion.get === vB)
    assert(report.tierAudits.isEmpty && report.corpusAudit.isEmpty)
  }
}
