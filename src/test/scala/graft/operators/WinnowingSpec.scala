package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Winnowing fingerprint selection (q168): agreement with an
  * independent per-window Scala reference (including the
  * rightmost-tie rule on repeated grams), the SIGMOD'03 detection
  * guarantee (a shared run of ≥ w+k−1 tokens always contributes a
  * shared selected fingerprint), short-document edges, and the q168
  * pair-report wiring.
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private val P = 1000000007L

  /** The shared portable fingerprint, independently refolded. */
  private def fpOf(s: String): Long = {
    var h = 0L
    s.codePoints().forEach(c => h = (h * 31L + c) % P)
    h
  }

  /** Reference winnowing: per full window, minimum fingerprint with
    * the RIGHTMOST occurrence on ties.
    */
  private def refSelected(text: String, k: Int, w: Int): Set[Long] = {
    val toks = text.split(" ", -1)
    if (toks.length < k + w - 1) return Set.empty
    val fps = (0 to toks.length - k)
      .map(i => fpOf(toks.slice(i, i + k).mkString(" ")))
    (0 to fps.length - w).map { j =>
      var best = j
      for (t <- j + 1 until j + w)
        if (fps(t) <= fps(best)) best = t
      fps(best)
    }.toSet
  }

  private def selectedOf(docs: Seq[(Long, String)], k: Int,
      w: Int): Map[Long, Set[Long]] =
    NearDup.winnowedFingerprints(docs.toDF("doc_id", "text"), k, w)
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      .withDefaultValue(Set.empty)

  test("operator == reference on random docs, including repeated-gram " +
      "ties, docs shorter than a window, and docs shorter than a gram") {
    val vocab = Array("a", "b", "c", "d", "x") // tiny: grams repeat
    for (seed <- Seq(168L, 169L)) {
      val rnd = new Random(seed)
      val docs = (0L until 80L).map { i =>
        val n = rnd.nextInt(16) // 0..15 tokens: spans every edge class
        (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      for ((k, w) <- Seq((4, 5), (2, 3), (1, 1))) {
        val got = selectedOf(docs, k, w)
        docs.foreach { case (id, text) =>
          assert(got(id) === refSelected(text, k, w),
            s"seed $seed k=$k w=$w doc $id text '$text'")
        }
      }
    }
  }

  test("detection guarantee: two noise docs sharing a planted run of " +
      "exactly w+k-1 tokens share at least one selected fingerprint") {
    val k = 4; val w = 5
    val rnd = new Random(1683L)
    for (trial <- 0 until 20) {
      // unique noise per doc (disjoint vocab), one shared run
      val run = Seq.tabulate(w + k - 1)(i => s"shared${trial}t$i")
      def doc(tag: String) = {
        val pre = Seq.fill(rnd.nextInt(10))(s"$tag${rnd.nextInt(1000)}")
        val post = Seq.fill(rnd.nextInt(10))(s"$tag${rnd.nextInt(1000)}")
        (pre ++ run ++ post).mkString(" ")
      }
      val sel = selectedOf(Seq((1L, doc("left")), (2L, doc("right"))), k, w)
      assert((sel(1L) intersect sel(2L)).nonEmpty, s"trial $trial")
    }
  }

  test("winnowing selections are per-document, so the generic index " +
      "purge repairs a standing selected-fingerprint store to exactly " +
      "a fresh build over the reduced corpus (the q153 contract's " +
      "fifth index family)") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .limit(200).localCheckpoint(true)
    val full = NearDup.winnowedFingerprints(docs).localCheckpoint(true)
    val deleted = docs.filter($"doc_id" % 7 === 0).select($"doc_id")
    val repaired = IndexMaintenance.purge(full, deleted)
      .as[(Long, Long)].collect().toSet
    val fresh = NearDup.winnowedFingerprints(
        docs.filter($"doc_id" % 7 =!= 0))
      .as[(Long, Long)].collect().toSet
    assert(repaired === fresh)
    assert(repaired.nonEmpty)
  }

  test("q168 wiring: the pair report finds real cross-doc structure " +
      "in the fixture corpus and every reported pair truly shares " +
      "that many kept fingerprints") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val pairs = NearDup.q168Winnowing(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty, "the 31-token-vocab corpus must collide")
    assert(pairs.forall(p => p._1 < p._2 && p._3 >= 4L))
    // recompute one pair's overlap from the operator's own selections
    // under the same df-cut
    val sel = NearDup.winnowedFingerprints(docs)
      .as[(Long, Long)].collect()
    val byFp = sel.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val kept = byFp.filter(_._2.size <= 20)
    val (a, b, n) = pairs.maxBy(_._3)
    val shared = kept.count { case (_, ds) => ds.contains(a) && ds.contains(b) }
    assert(shared.toLong === n)
  }
}
