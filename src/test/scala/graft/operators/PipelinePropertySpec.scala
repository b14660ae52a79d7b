package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded-random reference checks for the round-4 data-selection
  * operators: each distributed result must equal a plain-Scala
  * brute-force recomputation on the same rows.
  */
class PipelinePropertySpec extends SparkSpec {
  import spark.implicits._

  test("property: madOutliers == plain-Scala median/MAD fold, random groups") {
    val rnd = new Random(31)
    val rows = for {
      g <- Seq("a", "b", "c")
      _ <- 1 to (20 + rnd.nextInt(30))
    } yield (g, math.floor(rnd.nextDouble() * 1000) / 8.0) // exact doubles
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val vs = rs.map(_._2)
      val med = medianOf(vs)
      val mad = medianOf(vs.map(v => math.abs(v - med)))
      val out = vs.count(v => math.abs(v - med) > 3 * mad)
      g -> (vs.length.toLong, out.toLong,
        math.round(med * 1e6), math.round(mad * 1e6))
    }
    val got = Profiling.madOutliers(rows.toDF("grp", "v"), "grp", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want)
  }

  test("property: decileBins == rank-based reference, random ties included") {
    val rnd = new Random(47)
    // duplicated values force cut-boundary ties
    val scores = Array.fill(120)(rnd.nextInt(25).toLong)
    val df = scores.zipWithIndex.toSeq.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "score")
    val got = Profiling.decileBins(df, "score")
      .select($"id", $"decile").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    // reference: cut_d = exact (n−1)·q interpolated percentile,
    // rounded to 6; bin = 1 + #cuts strictly below the score
    val sorted = scores.sorted
    def cut(q: Double): Double = {
      val rank = (sorted.length - 1) * q
      val lo = sorted(rank.toInt).toDouble
      val hi = sorted(math.min(rank.toInt + 1, sorted.length - 1)).toDouble
      val v = lo + (rank - rank.toInt) * (hi - lo)
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val cuts = (1 to 9).map(d => cut(d / 10.0))
    scores.zipWithIndex.foreach { case (s, i) =>
      val want = 1 + cuts.count(s > _)
      assert(got(i.toLong) == want, s"id $i score $s")
    }
  }

  test("property: shuffleShards is a bijection onto (shard, pos) slots") {
    val rnd = new Random(59)
    val ids = (1L to 4000L).filter(_ => rnd.nextBoolean()).toSeq
    val df = ids.map((_, "x")).toDF("doc_id", "text")
    val got = Curation.shuffleShards(df, "doc_id", 32)
      .select($"doc_id", $"shard", $"pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.map(_._1).toSet == ids.toSet)          // nothing lost
    val slots = got.map(r => (r._2, r._3))
    assert(slots.distinct.length == slots.length)     // no slot collision
    got.groupBy(_._2).foreach { case (_, rs) =>       // dense per shard
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }

  test("property: importanceWeights == plain-Scala unigram LLR, random corpora") {
    val rnd = new Random(71)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (0L until 30L).map { id =>
      val n = 1 + rnd.nextInt(10)
      (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "),
        if (rnd.nextBoolean()) "en" else "fr")
    }
    val df = docs.toDF("doc_id", "text", "lang")
    val toks = docs.map { case (id, t, l) => (id, t.split(" ", -1).toSeq, l) }
    val corpusCounts = toks.flatMap(_._2).groupBy(identity).map {
      case (w, ws) => w -> ws.size.toLong }
    val targetCounts = toks.filter(_._3 == "en").flatMap(_._2)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val v = corpusCounts.size
    val nc = corpusCounts.values.sum
    val nt = targetCounts.values.sum
    val tick = corpusCounts.map { case (w, cc) =>
      w -> math.round((math.log((targetCounts.getOrElse(w, 0L) + 1).toDouble
          / (nt + v))
        - math.log((cc + 1).toDouble / (nc + v))) * 1e6)
    }
    val want = toks.map { case (id, ws, _) =>
      val s = ws.map(tick).sum
      id -> (ws.length.toLong,
        BigDecimal(s.toDouble / (ws.length * 1e6))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = LmScore.importanceWeights(df, $"lang" === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got == want)
  }
}
