package graft.operators

import graft.SparkSpec

/** Randomized differential band for [[NearDup.sharedSpans]]: tiny
  * vocabulary ⇒ dense accidental shingle sharing, so the df-cut,
  * diagonal alignment, and island coalescing all fire constantly —
  * the distributed gaps-and-islands must match a brute-force
  * single-threaded reference exactly on every draw.
  */
class SharedSpansFuzzSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: same contract as the operator. */
  private def refSpans(docs: Seq[(Long, String)], n: Int, maxDf: Long,
      minRun: Long): Set[(Long, Long, Long, Long, Long)] = {
    val shingled = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      id -> (if (toks.length < n) Array.empty[(Long, String)]
        else Array.tabulate(toks.length - n + 1)(i =>
          ((i + 1).toLong, toks.slice(i, i + n).mkString(" "))))
    }
    val df = shingled.flatMap { case (id, ss) => ss.map(_._2 -> id) }
      .groupBy(_._1).map { case (sh, xs) => sh -> xs.map(_._2).distinct.size }
    val kept = shingled.map { case (id, ss) =>
      id -> ss.filter(s => df(s._2) <= maxDf)
    }
    val out = scala.collection.mutable.Set[(Long, Long, Long, Long, Long)]()
    for ((a, sa) <- kept; (b, sb) <- kept if a < b) {
      val bBysh = sb.groupBy(_._2)
      val hits = for {
        (pa, sh) <- sa
        (pb, _) <- bBysh.getOrElse(sh, Array.empty[(Long, String)])
      } yield (pa, pb)
      hits.groupBy { case (pa, pb) => pa - pb }.foreach { case (_, hs) =>
        val pas = hs.map(_._1).distinct.sorted
        // islands over consecutive pa
        var runStart = 0
        for (i <- 1 to pas.length) {
          if (i == pas.length || pas(i) != pas(i - 1) + 1) {
            val m = i - runStart
            if (m >= minRun) {
              val pa0 = pas(runStart)
              val pb0 = pa0 - (hs.head._1 - hs.head._2)
              out += ((a, b, pa0, pb0, m + n - 1))
            }
            runStart = i
          }
        }
      }
    }
    out.toSet
  }

  test("randomized docs over a 7-token vocabulary: distributed spans " +
      "== brute-force reference across seeds and parameter draws") {
    val vocab = Array("a", "b", "c", "d", "e", "f", "g")
    for (seed <- Seq(11, 22, 33)) {
      val rnd = new scala.util.Random(seed)
      val docs = Seq.tabulate(14)(i =>
        (i.toLong,
          Seq.fill(6 + rnd.nextInt(18))(vocab(rnd.nextInt(vocab.length)))
            .mkString(" ")))
      val maxDf = 3L + rnd.nextInt(6)
      val minRun = 1L + rnd.nextInt(2)
      val got = NearDup.sharedSpans(docs.toDF("doc_id", "text"),
          n = 3, maxDf = maxDf, minRun = minRun)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = refSpans(docs, 3, maxDf, minRun)
      assert(got === want,
        s"seed=$seed maxDf=$maxDf minRun=$minRun " +
          s"missing=${want -- got} extra=${got -- want}")
    }
  }
}
