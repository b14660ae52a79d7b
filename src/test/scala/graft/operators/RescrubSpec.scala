package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.Blocklist.RescrubTier
import graft.store.VersionedTable

/** [[Blocklist.rescrub]] — retroactive blocklist application on
  * catalog growth (r13 VERDICT #3): rescrubbed corpus + repaired
  * standing text indexes ≡ a fresh gate→redact→extract build under
  * the GROWN catalog (the q153/q170 fresh-build contract on the
  * catalog-growth axis); replay/value idempotent; crash between
  * tiers converges on replay; the monotone-cover caveat pinned.
  */
class RescrubSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** The ingest-time pipeline under a given catalog: gate on the hard
    * list, cover-mask the soft list, all other columns preserved.
    */
  private def scrubbed(docs: DataFrame, hard: Seq[String],
      soft: Seq[String]): DataFrame = {
    val g = if (hard.isEmpty) docs else Blocklist.gate(docs, hard)
    if (soft.isEmpty) g
    else {
      val m = Blocklist.redact(g, soft)
        .select($"doc_id", $"masked".as("text"))
      g.drop("text").join(m, Seq("doc_id"))
        .select(docs.columns.map(col).toIndexedSeq: _*)
    }
  }

  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet

  // catalogs over the documents vocabulary: space-separated tokens,
  // so old and delta covers never straddle (the documented contract)
  private val hardOld = Seq("merge batch part")
  private val softOld = Seq("customer")
  private val hardDelta = Seq("scan slow")
  private val softDelta = Seq("fast table", "window spark")

  private def fixture() = {
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text")
      .withColumn("tag", ($"doc_id" % 3).cast("string"))
      .localCheckpoint(true)
    val landed = scrubbed(docs, hardOld, softOld).localCheckpoint(true)
    val corpus = new VersionedTable(spark, tmp("rs-corpus"),
      statsCols = Seq("doc_id"))
    corpus.commit(landed)
    val bm25 = new VersionedTable(spark, tmp("rs-bm25"),
      statsCols = Seq("doc_id"))
    bm25.commit(Retrieval.docTermStats(landed))
    val winnow = new VersionedTable(spark, tmp("rs-win"),
      statsCols = Seq("doc_id"))
    winnow.commit(NearDup.winnowedFingerprints(landed))
    (docs, corpus, bm25, winnow)
  }

  test("rescrub under a grown catalog: corpus and every repaired " +
      "index equal the fresh build under the full catalog; the report " +
      "counts are real") {
    val (docs, corpus, bm25, winnow) = fixture()
    val tiers = Seq(
      RescrubTier("bm25", bm25, Retrieval.docTermStats),
      RescrubTier("winnowing", winnow,
        d => NearDup.winnowedFingerprints(d)))
    val report = Blocklist.rescrub(corpus, hardDelta, softDelta, tiers,
      txnId = Some("grow-1"))

    val fresh = scrubbed(docs, hardOld ++ hardDelta, softOld ++ softDelta)
      .localCheckpoint(true)
    assert(rows(corpus.read()) === rows(fresh))
    assert(rows(bm25.read()) === rows(Retrieval.docTermStats(fresh)))
    assert(rows(winnow.read()) ===
      rows(NearDup.winnowedFingerprints(fresh)))
    // non-vacuous: the delta really took docs down and really masked
    assert(report.nHardDeleted > 0 && report.nSoftTouched > 0)
    assert(corpus.read().count() < docs.count())

    // value idempotence: a second rescrub (same delta) is a no-op —
    // masked text cannot re-match, deleted docs are gone
    val v = corpus.currentVersion.get
    val again = Blocklist.rescrub(corpus, hardDelta, softDelta, tiers,
      txnId = Some("grow-1b"))
    assert(again.nHardDeleted === 0 && again.nSoftTouched === 0)
    assert(corpus.currentVersion.get === v)
    assert(rows(bm25.read()) === rows(Retrieval.docTermStats(fresh)))
  }

  test("crash between tiers converges on replay: a tier extract that " +
      "dies mid-rescrub leaves the corpus un-committed; the replay " +
      "recomputes the same sets and lands everything") {
    val (docs, corpus, bm25, winnow) = fixture()
    var attempts = 0
    val crashing = RescrubTier("winnowing", winnow, d => {
      attempts += 1
      if (attempts == 1) sys.error("simulated crash during re-extract")
      NearDup.winnowedFingerprints(d)
    })
    val tiers = Seq(
      RescrubTier("bm25", bm25, Retrieval.docTermStats), crashing)
    intercept[RuntimeException] {
      Blocklist.rescrub(corpus, hardDelta, softDelta, tiers,
        txnId = Some("grow-crash"))
    }
    // the corpus never committed: the delta still matches it
    val vMid = corpus.currentVersion.get
    assert(Blocklist.scanCounts(corpus.read(), hardDelta).count() > 0)

    val report = Blocklist.rescrub(corpus, hardDelta, softDelta, tiers,
      txnId = Some("grow-crash"))
    assert(report.nHardDeleted > 0 && report.nSoftTouched > 0)
    assert(corpus.currentVersion.get > vMid)
    val fresh = scrubbed(docs, hardOld ++ hardDelta, softOld ++ softDelta)
      .localCheckpoint(true)
    assert(rows(corpus.read()) === rows(fresh))
    assert(rows(bm25.read()) === rows(Retrieval.docTermStats(fresh)))
    assert(rows(winnow.read()) ===
      rows(NearDup.winnowedFingerprints(fresh)))
  }

  test("soft-only and hard-only deltas work alone; guards reject an " +
      "empty delta, hard∩soft overlap, and mask-char patterns") {
    val (docs, corpus, bm25, _) = fixture()
    val tiers = Seq(RescrubTier("bm25", bm25, Retrieval.docTermStats))
    val r1 = Blocklist.rescrub(corpus, Seq.empty, softDelta, tiers)
    assert(r1.nHardDeleted === 0 && r1.nSoftTouched > 0)
    val r2 = Blocklist.rescrub(corpus, hardDelta, Seq.empty, tiers)
    assert(r2.nHardDeleted > 0 && r2.nSoftTouched === 0)
    val fresh = scrubbed(docs, hardOld ++ hardDelta, softOld ++ softDelta)
    assert(rows(corpus.read()) === rows(fresh))
    assert(rows(bm25.read()) === rows(Retrieval.docTermStats(fresh)))

    intercept[IllegalArgumentException](
      Blocklist.rescrub(corpus, Seq.empty, Seq.empty))
    intercept[IllegalArgumentException](
      Blocklist.rescrub(corpus, Seq("x"), Seq("x")))
    intercept[IllegalArgumentException](
      Blocklist.rescrub(corpus, Seq.empty, Seq("a*b")))
  }

  test("case-folded rescrub: a lowercase delta entry takes down and " +
      "masks mixed-case occurrences in the landed corpus") {
    val docs = Seq(
      (1L, "this has BadPhrase inside", "a"),
      (2L, "Boiler Plate text here", "b"),
      (3L, "clean doc", "c"),
      (4L, "boiler plate again and badphrase", "d"))
      .toDF("doc_id", "text", "tag")
    val corpus = new VersionedTable(spark, tmp("rs-fold"),
      statsCols = Seq("doc_id"))
    corpus.commit(docs)
    val r = Blocklist.rescrub(corpus,
      deltaHard = Seq("badphrase"), deltaSoft = Seq("boiler plate"),
      caseFold = true)
    // docs 1 and 4 carried a hard occurrence under the fold: gone
    assert(r.nHardDeleted === 2 && r.nSoftTouched === 1)
    val got = corpus.read().orderBy($"doc_id")
      .as[(Long, String, String)].collect().toSeq
    assert(got === Seq(
      (2L, "************ text here", "b"),
      (3L, "clean doc", "c")))
  }

  test("monotone-cover caveat, pinned: a delta occurrence straddling " +
      "an old mask is invisible to ANY rescanner of the masked text — " +
      "already-masked chars stay masked, nothing un-masks") {
    val docs = Seq((1L, "xabcdx")).toDF("doc_id", "text")
    // old catalog masked "bc": landed text is "xa**dx"
    val landed = scrubbed(docs, Nil, Seq("bc")).localCheckpoint(true)
    assert(landed.select($"text").as[String].head() === "xa**dx")
    val corpus = new VersionedTable(spark, tmp("rs-straddle"),
      statsCols = Seq("doc_id"))
    corpus.commit(landed)
    // delta "cd" straddles the old cover: a fresh build over the
    // ORIGINAL would mask "a***x"-wide, but the original is gone by
    // design (compliance: masked content is not retained), so the
    // delta cannot see the straddling occurrence
    val r = Blocklist.rescrub(corpus, Seq.empty, Seq("cd"))
    assert(r.nSoftTouched === 0)
    assert(corpus.read().select($"text").as[String].head() === "xa**dx")
    // a NON-straddling delta occurrence still masks
    val r2 = Blocklist.rescrub(corpus, Seq.empty, Seq("dx"))
    assert(r2.nSoftTouched === 1)
    assert(corpus.read().select($"text").as[String].head() === "xa****")
  }
}
