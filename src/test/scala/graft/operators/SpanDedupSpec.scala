package graft.operators

import graft.SparkSpec

/** Duplicated-span excision: hand-computed oracles on planted spans,
  * the coverage/count invariants, and the frozen-index serving gate's
  * equivalence to the batch form.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // 12 shared tokens — every 8-window inside is duplicated between
  // docs 1 and 2, so all 12 tokens excise in both
  private val span = (1 to 12).map(i => s"s$i").mkString(" ")

  test("planted cross-doc span excises fully, unique docs untouched") {
    val d = docs(
      1L -> s"alpha beta $span gamma",
      2L -> s"delta $span epsilon zeta",
      3L -> "totally unique text with eight tokens nothing shared here at all")
    val out = SpanDedup.excise(d, n = 8, minCount = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 15L, 12L, "alpha beta gamma")))
    assert(out(1) == ((2L, 15L, 12L, "delta epsilon zeta")))
    assert(out(2)._3 == 0L)
    assert(out(2)._4 == "totally unique text with eight tokens nothing shared here at all")
  }

  test("within-doc repetition counts as duplication") {
    // the same 8-gram twice in ONE doc: both occurrences excised
    val eight = (1 to 8).map(i => s"r$i").mkString(" ")
    val d = docs(1L -> s"$eight mid1 mid2 $eight tail")
    val out = SpanDedup.excise(d, n = 8, minCount = 2)
      .as[(Long, Long, Long, String)].head()
    assert(out == ((1L, 19L, 16L, "mid1 mid2 tail")))
  }

  test("short docs pass through; minCount raises the bar") {
    val d = docs(1L -> "only three tokens", 2L -> "only three tokens")
    val out = SpanDedup.excise(d, n = 8, minCount = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(out.forall(r => r._3 == 0L && r._4 == "only three tokens"))
    // with minCount = 3, a pair of dup docs no longer trips the gate
    val pair = docs(1L -> span, 2L -> span)
    val kept3 = SpanDedup.excise(pair, n = 8, minCount = 3)
      .as[(Long, Long, Long, String)].collect()
    assert(kept3.forall(_._3 == 0L))
    val kept2 = SpanDedup.excise(pair, n = 8, minCount = 2)
      .as[(Long, Long, Long, String)].collect()
    assert(kept2.forall(r => r._3 == 12L && r._4 == ""))
  }

  test("novelty profile: first doc fully novel, copies zero, overlap partial") {
    val d = docs(
      1L -> "alpha beta gamma delta",     // 2 distinct 3-grams, all first
      2L -> "alpha beta gamma delta",     // exact copy → nothing novel
      3L -> "alpha beta gamma zeta")      // shares "alpha beta gamma" only
    val out = SpanDedup.noveltyProfile(d, n = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(out(0) == ((1L, 2L, 2L, 1.0)))
    assert(out(1) == ((2L, 2L, 0L, 0.0)))
    assert(out(2) == ((3L, 2L, 1L, 0.5)))
  }

  test("counts are consistent with the rewritten text") {
    val d = docs(
      1L -> s"head $span x y z",
      2L -> s"$span trailer words go here",
      3L -> "unique filler document body with plenty of ordinary tokens inside")
    SpanDedup.excise(d, n = 8, minCount = 2)
      .as[(Long, Long, Long, String)].collect().foreach {
        case (_, nTok, nRem, kept) =>
          val keptN =
            if (kept.isEmpty && nRem == nTok) 0L
            else kept.split(" ", -1).length.toLong
          assert(keptN == nTok - nRem)
      }
  }

  test("within-doc de-repetition keeps the first occurrence") {
    // "a b c" repeats at positions 0 and 5 (n=3): the second copy goes,
    // the first stays; the cross-DOC copy in doc 2 is untouched (per-doc
    // semantics)
    val d = docs(
      1L -> "a b c x y a b c z",
      2L -> "a b c entirely fresh here")
    val out = SpanDedup.exciseRepeats(d, n = 3)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 9L, 3L, "a b c x y z")))
    assert(out(1) == ((2L, 6L, 0L, "a b c entirely fresh here")))
  }

  test("a 50k-token document excises exactly its repeated kilotoken block") {
    // per-doc state is bounded by the DOCUMENT (dup positions +
    // tokens), so one huge doc must pass through without issue and
    // with exact counts: a 1000-token block planted twice amid unique
    // filler loses exactly its 2×1000 tokens
    val block = (0 until 1000).map(i => s"b$i").mkString(" ")
    val fillA = (0 until 24000).map(i => s"u$i").mkString(" ")
    val fillB = (24000 until 48000).map(i => s"u$i").mkString(" ")
    val text = s"$fillA $block $fillB $block"
    val out = SpanDedup.excise(docs(1L -> text), n = 8, minCount = 2)
      .as[(Long, Long, Long, String)].head()
    assert(out._2 == 50000L)
    assert(out._3 == 2000L)
    assert(out._4 == s"$fillA $fillB")
  }

  test("probe-only gate excises bench-shared spans but keeps within-split dups") {
    val bench = docs(100L -> s"bench header $span bench footer")
    // train docs 1/2 share a 10-token block with EACH OTHER (not the
    // bench); doc 1 also carries the bench span
    val internal = (1 to 10).map(i => s"v$i").mkString(" ")
    val train = docs(
      1L -> s"$internal and then $span",
      2L -> s"$internal closing words here")
    val idx = SpanDedup.dupNgramIndex(bench, n = 8)
    val out = SpanDedup
      .exciseAgainst(idx, train, n = 8, minCount = Long.MaxValue)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    // doc 1: only the 12 bench-span tokens go; the internal block stays
    assert(out(0) == ((1L, 24L, 12L, s"$internal and then")))
    // doc 2: untouched — within-split duplication is q102's job
    assert(out(1) == ((2L, 13L, 0L, s"$internal closing words here")))
  }

  test("frozen-index gate matches the batch form on arriving docs") {
    val corpus = docs(
      10L -> s"one $span two",
      11L -> "an unrelated corpus document with no shared material anywhere")
    val batch = docs(
      20L -> s"prefix $span suffix tokens",   // span known to the corpus
      21L -> "a fresh document sharing nothing with anything else at all")
    val idx = SpanDedup.dupNgramIndex(corpus, n = 8)
    val gated = SpanDedup.exciseAgainst(idx, batch, n = 8)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    // batch-vs-(corpus ∪ batch) oracle, restricted to the batch docs
    val oracle = SpanDedup.excise(corpus.unionByName(batch), n = 8)
      .filter("doc_id >= 20").orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(gated.sameElements(oracle))
    // and the within-batch leg: two arriving copies of material the
    // CORPUS has never seen still dedup each other
    val fresh = (1 to 12).map(i => s"w$i").mkString(" ")
    val twin = docs(30L -> fresh, 31L -> fresh)
    val g2 = SpanDedup.exciseAgainst(idx, twin, n = 8)
      .as[(Long, Long, Long, String)].collect()
    assert(g2.forall(r => r._3 == 12L && r._4 == ""))
  }
}
