package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Aho–Corasick blocklist scan ([[Blocklist]]): automaton
  * correctness against a brute-force end-position count (randomized,
  * including self-overlapping and nested patterns the q169 fixture
  * catalog deliberately avoids), the textbook he/she/his/hers
  * example, census zero-row retention, the admission gate, and
  * catalog validation.
  */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force overlapping occurrence count: every end position
    * where the pattern matches — the Aho–Corasick output definition,
    * independent of the automaton code under test.
    */
  private def bruteCount(text: String, pat: String): Long =
    (0 to text.length - pat.length)
      .count(i => text.regionMatches(i, pat, 0, pat.length)).toLong

  test("the textbook example: he/she/his/hers over 'ushers' — nested " +
      "and overlapping occurrences all count") {
    val docs = Seq((1L, "ushers")).toDF("doc_id", "text")
    val got = Blocklist
      .scanCounts(docs, Seq("he", "she", "his", "hers"))
      .as[(Long, Int, Long)].collect().toSet
    // she ends at 3, he ends at 3 (inside she's occurrence), hers at 5
    assert(got === Set((1L, 0, 1L), (1L, 1, 1L), (1L, 3, 1L)))
  }

  test("randomized differential: automaton counts equal brute-force " +
      "end-position counts, including bordered (self-overlapping) " +
      "patterns") {
    val rnd = new Random(20260816L)
    val alphabet = "abc"
    def randStr(n: Int): String =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (round <- 1 to 20) {
      val pats = (1 to 8).map(_ => randStr(1 + rnd.nextInt(4)))
        .distinct.toList
      val texts = (1L to 12L).map(i => (i, randStr(rnd.nextInt(60))))
      val docs = texts.toDF("doc_id", "text")
      val got = Blocklist.scanCounts(docs, pats)
        .as[(Long, Int, Long)].collect()
        .map { case (d, p, h) => (d, p) -> h }.toMap
      for ((id, text) <- texts; (p, pid) <- pats.zipWithIndex) {
        val want = bruteCount(text, p)
        assert(got.getOrElse((id, pid), 0L) === want,
          s"round $round doc $id pattern '$p' in '$text'")
      }
      // no spurious rows: everything emitted is nonzero and accounted
      assert(got.values.forall(_ > 0L))
    }
  }

  test("census keeps zero-hit patterns with zero counts, and matches " +
      "a hand count on a tiny corpus") {
    val docs = Seq(
      (1L, "aa bb aa"),
      (2L, "bb"),
      (3L, "cc")).toDF("doc_id", "text")
    val got = Blocklist.census(docs, Seq("aa", "bb", "zz"))
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0, "aa", 1L, 2L),
      (1, "bb", 2L, 2L),
      (2, "zz", 0L, 0L)))
  }

  test("gate admits exactly the docs with zero hits") {
    val docs = Seq(
      (1L, "clean text"),
      (2L, "has a bad phrase inside"),
      (3L, "also clean")).toDF("doc_id", "text")
    val kept = Blocklist.gate(docs, Seq("bad phrase"))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 3L))
  }

  test("NULL text scans as zero hits; catalog validation rejects " +
      "empty and duplicate patterns") {
    val docs = Seq((1L, Option.empty[String]), (2L, Some("x y")))
      .toDF("doc_id", "text")
    val got = Blocklist.census(docs, Seq("x"))
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(got === Seq((0, "x", 1L, 1L)))
    intercept[IllegalArgumentException](Blocklist.buildAutomaton(Nil))
    intercept[IllegalArgumentException](
      Blocklist.buildAutomaton(Seq("a", "")))
    intercept[IllegalArgumentException](
      Blocklist.buildAutomaton(Seq("a", "a")))
  }

  test("redaction merges overlapping and nested matches into covered " +
      "runs, preserves length, and leaves uncovered chars untouched") {
    val docs = Seq(
      (1L, "xabcx"),       // ab@1 + bc@2 overlap -> one 3-char run
      (2L, "ab yy bc"),    // two disjoint runs
      (3L, "clean")).toDF("doc_id", "text")
    val got = Blocklist.redact(docs, Seq("ab", "bc"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "x***x", 3L, 1L),
      (2L, "** yy **", 4L, 2L),
      (3L, "clean", 0L, 0L)))
  }

  test("randomized differential: masked positions equal the brute-" +
      "force cover of all end-position matches") {
    val rnd = new Random(816L)
    val alphabet = "abc"
    def randStr(n: Int): String =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (round <- 1 to 15) {
      val pats = (1 to 6).map(_ => randStr(1 + rnd.nextInt(4)))
        .distinct.toList
      val texts = (1L to 10L).map(i => (i, randStr(rnd.nextInt(50))))
      val got = Blocklist.redact(texts.toDF("doc_id", "text"), pats)
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      for ((id, text) <- texts) {
        val covered = Array.fill(text.length)(false)
        for (p <- pats; i <- 0 to text.length - p.length
             if text.regionMatches(i, p, 0, p.length);
             j <- i until i + p.length) covered(j) = true
        val wantMasked = text.zipWithIndex
          .map { case (c, i) => if (covered(i)) '*' else c }.mkString
        val wantN = covered.count(identity).toLong
        val wantSpans = (0 until text.length)
          .count(i => covered(i) && (i == 0 || !covered(i - 1))).toLong
        val (_, m, n, sp) = got(id)
        assert(m === wantMasked, s"round $round doc $id '$text' $pats")
        assert(n === wantN && sp === wantSpans)
      }
    }
  }

  test("autoRedact mines the expected top-df phrases and masks them; " +
      "an under-threshold corpus falls back to unmasked passthrough") {
    // "w x y z" appears token-aligned in docs 1,2,3 (df 3);
    // "a b c d" in docs 1,2 (df 2); everything else is unique
    val docs = Seq(
      (1L, "a b c d q w x y z"),
      (2L, "w x y z p a b c d"),
      (3L, "m w x y z n o p q"),
      (4L, "u v only once here")).toDF("doc_id", "text")
    val got = Blocklist.autoRedact(docs, n = 4, minDf = 2L,
        maxPatterns = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    // catalog = ("w x y z" df 3, "a b c d" df 2)
    assert(got === Seq(
      (1L, "******* q *******", 14L, 2L),
      (2L, "******* p *******", 14L, 2L),
      (3L, "m ******* n o p q", 7L, 1L),
      (4L, "u v only once here", 0L, 0L)))

    // no phrase reaches df 2: nothing masks, text passes through
    val sparse = Seq((1L, "all unique tokens here now"),
      (2L, "and different ones there too")).toDF("doc_id", "text")
    val none = Blocklist.autoRedact(sparse, n = 4, minDf = 2L,
        maxPatterns = 5)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(none === Seq(
      (1L, "all unique tokens here now", 0L, 0L),
      (2L, "and different ones there too", 0L, 0L)))
  }

  test("redaction is idempotent (for catalogs not containing the mask " +
      "char) and the scan plan has no shuffle") {
    val rnd = new Random(4242L)
    def randStr(n: Int): String =
      (1 to n).map(_ => "abc".charAt(rnd.nextInt(3))).mkString
    val pats = (1 to 6).map(_ => randStr(1 + rnd.nextInt(3))).distinct.toList
    val docs = (1L to 15L).map(i => (i, randStr(rnd.nextInt(40))))
      .toDF("doc_id", "text")
    val once = Blocklist.redact(docs, pats)
    val twice = Blocklist.redact(
      once.select($"doc_id", $"masked".as("text")), pats)
    assert(twice.filter($"n_masked" > 0).isEmpty)
    assert(once.select($"doc_id", $"masked")
      .exceptAll(twice.select($"doc_id", $"masked")).isEmpty)
    // the zero-shuffle claim, pinned on the plan: no Exchange anywhere
    // in the scan's physical plan (Parallel.fan may repartition the
    // tiny local input, so pin on a pre-split frame)
    val plan = Blocklist.scanCounts(
        docs.repartition(spark.sparkContext.defaultParallelism), pats)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    // exactly the one repartition we injected; the scan itself adds none
    assert(exchanges.size <= 1)
  }

  test("redaction passes NULL text through with zero counts") {
    val docs = Seq((1L, Option.empty[String]), (2L, Some("ab")))
      .toDF("doc_id", "text")
    val got = Blocklist.redact(docs, Seq("ab"))
      .as[(Long, Option[String], Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, None, 0L, 0L), (2L, Some("**"), 2L, 1L)))
  }

  test("catalog scale: a 10k-pattern automaton builds compactly and " +
      "scans correctly (sampled brute-force check)") {
    val rnd = new Random(99173L)
    val alphabet = "abcdefgh"
    def randStr(n: Int): String =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val pats = Iterator.continually(randStr(3 + rnd.nextInt(8)))
      .distinct.take(10000).toList
    val ac = Blocklist.buildAutomaton(pats)
    // the broadcast-size claim is structural: the trie has at most
    // one state per catalog character (plus the root)
    assert(ac.patterns.length === 10000)
    assert(ac.nStates <= pats.map(_.length).sum + 1)
    val texts = (1L to 8L).map(i => (i, randStr(400)))
    val got = Blocklist.scanCounts(texts.toDF("doc_id", "text"), pats)
      .as[(Long, Int, Long)].collect()
      .map { case (d, p, h) => (d, p) -> h }.toMap
    // sampled verification: 200 random (doc, pattern) cells plus
    // every nonzero cell the scan reported
    def brute(text: String, pat: String): Long =
      (0 to text.length - pat.length)
        .count(i => text.regionMatches(i, pat, 0, pat.length)).toLong
    val textMap = texts.toMap
    for (_ <- 1 to 200) {
      val (id, text) = texts(rnd.nextInt(texts.length))
      val pid = rnd.nextInt(pats.length)
      assert(got.getOrElse((id, pid), 0L) === brute(text, pats(pid)))
    }
    for (((id, pid), h) <- got)
      assert(h === brute(textMap(id), pats(pid)))
    // short patterns over a long text on a small alphabet: matches
    // definitely exist, the check is not vacuous
    assert(got.nonEmpty)
  }

  test("case-folded mode: a catalog entry matches any casing of its " +
      "occurrences; the default exact mode stays case-sensitive") {
    val docs = Seq(
      (1L, "BadPhrase here and BADPHRASE and badphrase"),
      (2L, "Nothing Else"),
      (3L, "uShErS")).toDF("doc_id", "text")
    val exact = Blocklist.scanCounts(docs, Seq("badphrase", "she"))
      .as[(Long, Int, Long)].collect().toSet
    assert(exact === Set((1L, 0, 1L))) // only the lowercase occurrence
    val folded = Blocklist
      .scanCounts(docs, Seq("badphrase", "she"), caseFold = true)
      .as[(Long, Int, Long)].collect().toSet
    assert(folded === Set((1L, 0, 3L), (3L, 1, 1L)))
    // redaction folds too, masking mixed-case occurrences in place
    // (length-preserving: simple per-char fold never changes length)
    val red = Blocklist.redact(
        Seq((1L, "See BadPhrase end")).toDF("doc_id", "text"),
        Seq("badphrase"), caseFold = true)
      .as[(Long, String, Long, Long)].collect().head
    assert(red === ((1L, "See ********* end", 9L, 1L)))
    // catalog entries identical under the fold are a loud catalog bug
    intercept[IllegalArgumentException](
      Blocklist.buildAutomaton(Seq("Foo", "foo"), caseFold = true))
    // ...but fine in exact mode
    assert(Blocklist.buildAutomaton(Seq("Foo", "foo")).patterns.length === 2)
  }

  test("randomized case-folded differential: automaton counts equal a " +
      "case-folded brute force over mixed-case texts and patterns") {
    val rnd = new Random(1408L)
    val alphabet = "aAbBcC"
    def randStr(n: Int): String =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def bruteFold(text: String, pat: String): Long = {
      val t = text.map(Blocklist.foldChar)
      val p = pat.map(Blocklist.foldChar)
      (0 to t.length - p.length)
        .count(i => t.regionMatches(i, p, 0, p.length)).toLong
    }
    for (round <- 1 to 15) {
      val pats = (1 to 8).map(_ => randStr(1 + rnd.nextInt(4)))
        .distinctBy(_.map(Blocklist.foldChar)).toList
      val texts = (1L to 10L).map(i => (i, randStr(rnd.nextInt(50))))
      val got = Blocklist
        .scanCounts(texts.toDF("doc_id", "text"), pats, caseFold = true)
        .as[(Long, Int, Long)].collect()
        .map { case (d, p, h) => (d, p) -> h }.toMap
      for ((id, text) <- texts; (p, pid) <- pats.zipWithIndex) {
        assert(got.getOrElse((id, pid), 0L) === bruteFold(text, p),
          s"round $round doc $id pattern '$p' in '$text'")
      }
      // masked cover parity: fold-matched positions masked in the
      // ORIGINAL casing text
      val gotRed = Blocklist
        .redact(texts.toDF("doc_id", "text"), pats, caseFold = true)
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> r._2).toMap
      for ((id, text) <- texts) {
        val t = text.map(Blocklist.foldChar)
        val covered = Array.fill(text.length)(false)
        for (p0 <- pats) {
          val p = p0.map(Blocklist.foldChar)
          for (i <- 0 to t.length - p.length
               if t.regionMatches(i, p, 0, p.length);
               j <- i until i + p.length) covered(j) = true
        }
        val want = text.zipWithIndex
          .map { case (c, i) => if (covered(i)) '*' else c }.mkString
        assert(gotRed(id) === want, s"round $round doc $id")
      }
    }
  }

  test("the q169 fixture catalog is borderless (the oracle's replace-" +
      "count identity requires it) and includes a nested pair") {
    for (p <- Blocklist.q169Patterns; k <- 1 until p.length) {
      assert(p.substring(0, k) != p.substring(p.length - k),
        s"'$p' has a border of length $k")
    }
    assert(Blocklist.q169Patterns.exists(a =>
      Blocklist.q169Patterns.exists(b => a != b && b.contains(a))))
  }
}
