package graft.store

import java.nio.file.Files

import graft.SparkSpec
import graft.core.Tables
import graft.operators.{ImageHash, IndexMaintenance, IvfIndex, NearDup,
  Retrieval}

/** DELETE propagation through the SERVING tiers (r12 verdict #3) —
  * the q153 contract extended to the online layer: after
  * `VersionedTable.deleteKeys` + `IndexMaintenance.purge` rewrite a
  * standing index, a driver-cached tier still holds the pre-delete
  * buckets; `invalidate()` must flush them AND the corpus scalars so
  * every subsequent answer equals the fresh batch operator over the
  * REDUCED corpus. Growth invalidation was spec'd in r12
  * (SearchEndpointSpec); this suite pins the shrink direction for
  * all three tiers — a takedown that keeps serving from cache is a
  * compliance failure, not a staleness nit.
  */
class ServingDeleteSpec extends SparkSpec {
  import spark.implicits._

  test("BM25 tier: purge -> rewrite -> invalidate serves exactly the " +
      "fresh-build rows over the reduced corpus (scalars refresh too); " +
      "the stale pre-invalidate answer really differed") {
    val docs = Tables.load(spark, sf, "documents").limit(120)
      .localCheckpoint(true)
    val post = Retrieval.docTermStats(docs).localCheckpoint(true)
    val dir = Files.createTempDirectory("bm25-del").toString
    SearchEndpoint.writeBm25Index(post, dir, nBuckets = 8)
    val tier = new Bm25SearchTier(spark, dir, nBuckets = 8)

    val text = docs.filter($"doc_id" === 0L).select($"text").as[String].head()
    val terms = text.split(" ", -1).take(4).toSeq.map(NearDup.tokenHash64)
    val before = tier.search(terms, k = 5)
    assert(before.nonEmpty)

    // takedown: every 3rd doc (including some of the current top-5),
    // purge the standing index, republish the serving layout
    val deleted = docs.filter($"doc_id" % 3 === 0).select($"doc_id")
    val repaired = IndexMaintenance.purge(post, deleted)
      .localCheckpoint(true)
    SearchEndpoint.writeBm25Index(repaired, dir, nBuckets = 8)

    // a stale tier still serves the pre-delete snapshot from cache
    assert(tier.search(terms, k = 5) === before)

    tier.invalidate()
    val after = tier.search(terms, k = 5)
    val queries = terms.distinct.map(th => (-1L, th)).toDF("query_id", "th")
    val want = Retrieval.bm25TopKFromIndex(repaired, queries, k = 5)
      .orderBy($"rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
      .map(r => (r._2, r._3, r._4))
    assert(after === want)
    assert(after !== before) // N/df/dl really shifted with the delete
    // no deleted doc can be served
    val gone = deleted.as[Long].collect().toSet
    assert(after.forall(r => !gone.contains(r._2)))
  }

  test("IVF tier: purged cells stop serving deleted vectors after " +
      "invalidate; results equal IvfIndex.topK over the repaired index") {
    val emb = Tables.load(spark, sf, "embeddings").localCheckpoint(true)
    val (indexed, model) = IvfIndex.buildPivots(emb, nLists = 4)
    val pinned = indexed.localCheckpoint(true)
    val dir = Files.createTempDirectory("ivf-del").toString
    SearchEndpoint.writeIvfIndex(pinned, dir)
    val tier = new IvfSearchTier(spark, dir, model)

    val probe = emb.filter($"vec_id" === 0L)
    val vec = probe.select($"embedding").as[Array[Float]].head()
      .map(_.toDouble)
    val before = tier.search(vec, k = 10, nProbe = 4)
    assert(before.nonEmpty)

    // delete the probe's current top hits — the strongest staleness
    // signal — keeping the quantizer FROZEN (repair, not rebuild)
    val victims = before.take(3).map(_._1)
    val deleted = victims.toDF("vec_id")
    val repaired = IndexMaintenance.purge(pinned, deleted, idCol = "vec_id")
      .localCheckpoint(true)
    SearchEndpoint.writeIvfIndex(repaired, dir)

    assert(tier.search(vec, k = 10, nProbe = 4) === before) // stale cache
    tier.invalidate()
    val after = tier.search(vec, k = 10, nProbe = 4)
    val want = IvfIndex.topK(repaired, model, probe, k = 10, nProbe = 4)
      .as[(Long, Long, Double)].collect().toSeq
      .map(r => (r._2, r._3))
    assert(after === want)
    assert(victims.forall(v => !after.exists(_._1 == v)))
  }

  test("signature tier: a taken-down image stops matching admission " +
      "probes after invalidate; when every rendition is purged the " +
      "probe admits as novel") {
    // corpus: bases 0..79 (media i*10) + a BMP re-encode for every 9th
    val corpus = (0L until 80L).map(i =>
      (i * 10, ImageHash.render(i, 1, "png"))) ++
      (0L until 80L by 9).map(i => (i * 10 + 2, ImageHash.render(i, 1, "bmp")))
    val sig = ImageHash.signatures(corpus.toDF("media_id", "payload"))
      .localCheckpoint(true)
    val dir = Files.createTempDirectory("sig-del").toString
    SearchEndpoint.writeSignatureIndex(sig, dir, nBuckets = 16)
    val tier = new SigSearchTier(spark, dir, nBuckets = 16)

    // probe: a resized copy of doc 63 (media 630 base + 632 re-encode)
    val g = ImageHash.lumaGrid(ImageHash.render(63L, 2, "png"))
    val (pd, pa) = (ImageHash.dHash(g), ImageHash.aHash(g))
    val before = tier.probe(pd, pa)
    assert(before.exists(r => r._1 == 630L && r._2 == 0))
    assert(before.exists(r => r._1 == 632L && r._2 == 0))

    // takedown of the base only: the re-encode still blocks admission
    val purged1 = IndexMaintenance.purge(sig,
        Seq(630L).toDF("media_id"), idCol = "media_id")
      .localCheckpoint(true)
    SearchEndpoint.writeSignatureIndex(purged1, dir, nBuckets = 16)
    assert(tier.probe(pd, pa) === before) // stale cache
    tier.invalidate()
    val mid = tier.probe(pd, pa)
    assert(!mid.exists(_._1 == 630L) && mid.exists(_._1 == 632L))
    // parity with the batch gate over the repaired index
    val probeDf = Seq((900L, pd, pa)).toDF("media_id", "dhash", "ahash")
    val want = ImageHash.nearDupGate(purged1, probeDf)
      .select($"media_id", $"hamming", $"a_hamming")
      .as[(Long, Int, Int)].collect().toSeq.sortBy(r => (r._2, r._1))
    assert(mid === want)

    // full takedown of every rendition: the probe is novel again
    val purged2 = IndexMaintenance.purge(sig,
        Seq(630L, 632L).toDF("media_id"), idCol = "media_id")
      .localCheckpoint(true)
    SearchEndpoint.writeSignatureIndex(purged2, dir, nBuckets = 16)
    tier.invalidate()
    assert(tier.probe(pd, pa) === Nil)
  }

  test("age-based expiry: the expireBefore CDC feed drives the same " +
      "purge -> invalidate -> parity chain as a keyed takedown " +
      "(q170's contract at the serving layer)") {
    val docs = Tables.load(spark, sf, "documents").limit(120)
      .localCheckpoint(true)
    val post = Retrieval.docTermStats(docs).localCheckpoint(true)
    val dir = Files.createTempDirectory("bm25-exp").toString
    SearchEndpoint.writeBm25Index(post, dir, nBuckets = 8)
    val tier = new Bm25SearchTier(spark, dir, nBuckets = 8)

    // query anchored on a doc that SURVIVES the retention window
    val text = docs.filter($"doc_id" === 100L)
      .select($"text").as[String].head()
    val terms = text.split(" ", -1).take(4).toSeq.map(NearDup.tokenHash64)
    val before = tier.search(terms, k = 5)
    assert(before.nonEmpty)

    // store with day-clustered commits; retention expires days < 4
    // (doc_ids < 40)
    val vt = new VersionedTable(spark,
      Files.createTempDirectory("vt-exp-serve").toString,
      statsCols = Seq("ingest_day"))
    val stamped = docs.withColumn("ingest_day",
      org.apache.spark.sql.functions.expr("doc_id div 10"))
    (0L until 3L).foreach { b =>
      vt.commit(stamped.filter(
        $"ingest_day" >= b * 4 && $"ingest_day" < (b + 1) * 4))
    }
    val vFull = vt.currentVersion.get
    vt.expireBefore("ingest_day", "4")
    val deleted = vt.changesSince(vFull)
      .filter($"change_type" === "delete").select($"doc_id")
    val repaired = IndexMaintenance.purge(post, deleted)
      .localCheckpoint(true)
    SearchEndpoint.writeBm25Index(repaired, dir, nBuckets = 8)

    assert(tier.search(terms, k = 5) === before) // stale cache
    tier.invalidate()
    val after = tier.search(terms, k = 5)
    val queries = terms.distinct.map(th => (-1L, th)).toDF("query_id", "th")
    val want = Retrieval.bm25TopKFromIndex(repaired, queries, k = 5)
      .orderBy($"rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
      .map(r => (r._2, r._3, r._4))
    assert(after === want)
    assert(after !== before) // the expiry really shifted N/df/dl
    assert(after.forall(_._2 >= 40L)) // no expired doc served
  }
}
