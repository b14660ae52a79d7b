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

  test("CONSERVATIVE mode closes the straddle caveat: masked chars " +
      "match as wildcards (with a visible anchor), so a straddling " +
      "delta occurrence masks exactly like the fresh full build") {
    val docs = Seq((1L, "xabcdx")).toDF("doc_id", "text")
    val landed = scrubbed(docs, Nil, Seq("bc")).localCheckpoint(true)
    val corpus = new VersionedTable(spark, tmp("rs-cons"),
      statsCols = Seq("doc_id"))
    corpus.commit(landed)
    val r = Blocklist.rescrub(corpus, Seq.empty, Seq("cd"),
      conservative = true)
    assert(r.nSoftTouched === 1)
    // fresh full build over the ORIGINAL: bc covers 2-3, cd covers
    // 3-4 -> "xa***x" — conservative rescrub reaches it without the
    // original
    assert(corpus.read().select($"text").as[String].head() === "xa***x")
    val fresh = scrubbed(docs, Nil, Seq("bc", "cd"))
    assert(fresh.select($"text").as[String].head() === "xa***x")
    // value idempotence: a second conservative pass changes nothing
    val v = corpus.currentVersion.get
    val r2 = Blocklist.rescrub(corpus, Seq.empty, Seq("cd"),
      conservative = true)
    assert(r2.nSoftTouched === 0 && corpus.currentVersion.get === v)
  }

  test("conservative mode may OVER-mask (the documented trade: never " +
      "under-mask) and iterates to a per-doc fixpoint so cascaded " +
      "fires land in ONE call") {
    // over-mask: old 'ab' masked "zabz" -> "z**z"; delta 'cz' never
    // occurred in the original, but the wildcards admit it at 2-3
    val d1 = Seq((1L, "zabz")).toDF("doc_id", "text")
    val landed1 = scrubbed(d1, Nil, Seq("ab")).localCheckpoint(true)
    assert(landed1.select($"text").as[String].head() === "z**z")
    val c1 = new VersionedTable(spark, tmp("rs-over"),
      statsCols = Seq("doc_id"))
    c1.commit(landed1)
    Blocklist.rescrub(c1, Seq.empty, Seq("cz"), conservative = true)
    assert(c1.read().select($"text").as[String].head() === "z***")
    // fresh full build would keep "z**z" — conservative is a strict
    // SUPERSET here, never the reverse
    assert(scrubbed(d1, Nil, Seq("ab", "cz"))
      .select($"text").as[String].head() === "z**z")

    // cascade: 'acq' fires off the old mask (visible anchor q) and
    // covers q; 'my' mismatched the ORIGINAL at q but fires once q
    // is covered — the fixpoint finds it in the same call
    val d2 = Seq((2L, "zabqy")).toDF("doc_id", "text")
    val landed2 = scrubbed(d2, Nil, Seq("ab")).localCheckpoint(true)
    assert(landed2.select($"text").as[String].head() === "z**qy")
    val c2 = new VersionedTable(spark, tmp("rs-casc"),
      statsCols = Seq("doc_id"))
    c2.commit(landed2)
    val r = Blocklist.rescrub(c2, Seq.empty, Seq("acq", "my"),
      conservative = true)
    assert(r.nSoftTouched === 1)
    assert(c2.read().select($"text").as[String].head() === "z****")
    // converged: the second call touches nothing
    assert(Blocklist.rescrub(c2, Seq.empty, Seq("acq", "my"),
      conservative = true).nSoftTouched === 0)
  }

  test("property: the conservative cover is a SUPERSET of the fresh " +
      "full-catalog cover on random corpora (and equals it whenever " +
      "no delta fire involves a masked char)") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abc"
    def randStr(n: Int): String =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (round <- 1 to 12) {
      val old = (1 to 3).map(_ => randStr(2 + rnd.nextInt(2))).distinct
      val delta = (1 to 3).map(_ => randStr(2 + rnd.nextInt(2)))
        .distinct.filterNot(old.contains)
      if (delta.nonEmpty) {
        val texts = (1L to 8L).map(i => (i, randStr(10 + rnd.nextInt(30))))
        val docs = texts.toDF("doc_id", "text")
        val landed = scrubbed(docs, Nil, old)
        val cons = Blocklist
          .redactConservative(landed, delta)
          .select($"doc_id", $"masked").as[(Long, String)]
          .collect().toMap
        val fresh = scrubbed(docs, Nil, old ++ delta)
          .select($"doc_id", $"text").as[(Long, String)]
          .collect().toMap
        for ((id, orig) <- texts) {
          val c = cons(id)
          val f = fresh(id)
          (0 until orig.length).foreach { i =>
            if (f.charAt(i) == '*')
              assert(c.charAt(i) === '*',
                s"round $round doc $id pos $i: fresh masked, " +
                  s"conservative did not ('$orig' old=$old delta=$delta)")
            if (c.charAt(i) != '*')
              assert(c.charAt(i) === orig.charAt(i))
          }
        }
      }
    }
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
