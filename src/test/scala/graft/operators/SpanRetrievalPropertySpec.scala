package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Randomized differential checks: [[SpanDedup.excise]] and
  * [[Retrieval.bm25TopK]] against independent plain-Scala reference
  * implementations over random corpora drawn from a SMALL token
  * alphabet (so n-gram collisions and score ties occur naturally).
  * Fixed seeds — failures replay exactly.
  */
class SpanRetrievalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomCorpus(rnd: Random, nDocs: Int, alpha: Int,
      maxLen: Int): Seq[(Long, String)] =
    (0 until nDocs).map { i =>
      val len = 1 + rnd.nextInt(maxLen)
      (i.toLong,
        Seq.fill(len)(s"t${rnd.nextInt(alpha)}").mkString(" "))
    }

  /** Reference span excision: literal n-gram strings, no hashing. */
  private def refExcise(corpus: Seq[(Long, String)], n: Int,
      minCount: Int): Map[Long, (Long, Long, String)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1) }.toMap
    val counts = new scala.collection.mutable.HashMap[Seq[String], Int]
    toks.values.foreach { ts =>
      (0 to ts.length - n).foreach { i =>
        val g = ts.slice(i, i + n).toSeq
        counts(g) = counts.getOrElse(g, 0) + 1
      }
    }
    toks.map { case (id, ts) =>
      val covered = new Array[Boolean](ts.length)
      (0 to ts.length - n).foreach { i =>
        if (counts(ts.slice(i, i + n).toSeq) >= minCount)
          (i until i + n).foreach(covered(_) = true)
      }
      val kept = ts.indices.filterNot(covered).map(ts)
      (id, (ts.length.toLong, covered.count(identity).toLong,
        kept.mkString(" ")))
    }
  }

  test("excise ≡ literal-string reference over random corpora") {
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new Random(seed)
      val corpus = randomCorpus(rnd, nDocs = 40, alpha = 6, maxLen = 30)
      val n = 3 + rnd.nextInt(4)       // 3..6
      val minCount = 2 + rnd.nextInt(2) // 2..3
      val got = SpanDedup
        .excise(corpus.toDF("doc_id", "text"), n, minCount.toLong)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = refExcise(corpus, n, minCount)
      assert(got == want, s"seed=$seed n=$n minCount=$minCount")
    }
  }

  /** Reference de-repetition: later same-doc repeats marked, literal
    * n-gram strings.
    */
  private def refDerep(corpus: Seq[(Long, String)], n: Int)
      : Map[Long, (Long, Long, String)] =
    corpus.map { case (id, t) =>
      val ts = t.split(" ", -1)
      val seen = scala.collection.mutable.HashSet.empty[Seq[String]]
      val covered = new Array[Boolean](ts.length)
      (0 to ts.length - n).foreach { i =>
        val g = ts.slice(i, i + n).toSeq
        if (!seen.add(g)) (i until i + n).foreach(covered(_) = true)
      }
      val kept = ts.indices.filterNot(covered).map(ts)
      id -> ((ts.length.toLong, covered.count(identity).toLong,
        kept.mkString(" ")))
    }.toMap

  test("exciseRepeats ≡ keep-first reference over random corpora") {
    for (seed <- Seq(41, 42, 43)) {
      val rnd = new Random(seed)
      val corpus = randomCorpus(rnd, nDocs = 40, alpha = 4, maxLen = 40)
      val n = 2 + rnd.nextInt(3) // 2..4
      val got = SpanDedup.exciseRepeats(corpus.toDF("doc_id", "text"), n)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == refDerep(corpus, n), s"seed=$seed n=$n")
    }
  }

  /** Reference BM25 (+1 idf, k1=1.2, b=0.75, millionth ticks). */
  private def refBm25(corpus: Seq[(Long, String)],
      queries: Seq[(Long, String)], k: Int): Seq[(Long, Int, Long, Double)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1) }
    val n = toks.size.toLong
    val tot = toks.map(_._2.length.toLong).sum
    val dfm = toks.flatMap(_._2.distinct).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    queries.flatMap { case (qid, qtext) =>
      val terms = qtext.split(" ", -1).take(4).distinct.toSeq
      // a doc is scored iff ANY query term matches (tf > 0) — even a
      // zero-tick total must appear, mirroring the join semantics
      val scores = toks.filter(_._1 != qid).flatMap { case (id, ts) =>
        val matched = terms.filter(t => ts.contains(t))
        if (matched.isEmpty) None
        else Some(id -> matched.map { t =>
          val tf = ts.count(_ == t).toLong
          val df = dfm(t)
          val dl = ts.length.toLong
          math.round(math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            * tf * 2.2
            / (tf + 1.2 * (0.25 + 0.75 * dl * n / tot))
            * 1000000.0)
        }.sum)
      }
      scores.sortBy { case (id, s) => (-s, id) }.take(k)
        .zipWithIndex.map { case ((id, s), r) =>
          (qid, r + 1, id,
            BigDecimal(s / 1000000.0)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }
  }

  test("bm25TopK ≡ scalar reference over random corpora") {
    for (seed <- Seq(21, 22, 23)) {
      val rnd = new Random(seed)
      val corpus = randomCorpus(rnd, nDocs = 30, alpha = 8, maxLen = 20)
      val docsDf = corpus.toDF("doc_id", "text")
      val qids = corpus.map(_._1).filter(_ % 5 == 0)
      val queries = Retrieval.prefixQueries(docsDf, mod = 5L, nTerms = 4)
      val got = Retrieval.bm25TopK(docsDf, queries, k = 4)
        .orderBy($"query_id", $"rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
      val want = refBm25(corpus,
        corpus.filter(d => qids.contains(d._1)), k = 4)
        .sortBy(r => (r._1, r._2))
      assert(got.map(r => (r._1, r._2, r._3)) ==
        want.map(r => (r._1, r._2, r._3)), s"seed=$seed")
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g._4 - w._4) < 1e-9, s"seed=$seed $g vs $w")
      }
    }
  }

  test("a doc scored only through excluded-self terms is absent entirely") {
    // doc 5 is the ONLY doc containing "zzz"; querying as doc 5 must
    // yield no row for that term at all (not a zero-score row)
    val d = Seq(
      5L -> "zzz unique content nobody else has",
      6L -> "ordinary words for everyone here").toDF("doc_id", "text")
    val q = Seq((5L, NearDup.tokenHash64("zzz"))).toDF("query_id", "th")
    assert(Retrieval.bm25TopK(d, q, k = 5).count() == 0L)
  }
}
