package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style seeded-random checks for the round-3 kernels
  * (plain seeded generation — the scalatest/scalacheck bridge isn't
  * in the offline dependency cache).
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  test("property: sortedIntersectSize == set intersection, random sorted arrays") {
    val rnd = new Random(7)
    val cases = (1 to 200).map { _ =>
      def arr() = Array.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      val (a, b) = (arr(), arr())
      (a, b, a.toSet.intersect(b.toSet).size)
    }
    val bad = cases.toDF("a", "b", "want")
      .filter(graft.functions.sortedIntersectSize($"a", $"b") =!= $"want")
    assert(bad.isEmpty)
  }

  test("property: typed shingle co-counts == string-shingle co-counts, random texts") {
    // small vocab + occasional double spaces / short docs stress the
    // tokenization parity (split keeps empty tokens)
    val rnd = new Random(11)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "")
    val docs = (0L until 40L).map { id =>
      val n = rnd.nextInt(12)
      (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val sets = NearDup.shingleHashSets(docs)
    val hashCo = sets.select($"doc_id".as("doc_a"), $"shs".as("sa"))
      .crossJoin(sets.select($"doc_id".as("doc_b"), $"shs".as("sb")))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        graft.functions.sortedIntersectSize($"sa", $"sb").as("co"))
      .filter($"co" > 0)
    val strSh = docs
      .select($"doc_id", explode(NearDup.shingles($"text")).as("s"))
    val strCo = strSh.select($"s", $"doc_id".as("doc_a"))
      .join(strSh.select($"s", $"doc_id".as("doc_b")), "s")
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).cast("int").as("co"))
    assert(hashCo.exceptAll(strCo).isEmpty && strCo.exceptAll(hashCo).isEmpty)
  }

  test("property: TopKAgg == sort-take under ties, NaN, and signed zero") {
    val rnd = new Random(23)
    val sims = Array(0.9, 0.5, 0.5, -0.0, 0.0, Double.NaN, -0.3)
    val rows = for {
      probe <- 0L until 4L
      vec <- 0L until 30L
    } yield (probe, vec, sims(rnd.nextInt(sims.length)))
    val got = Similarity.topKPerProbe(
        rows.toDF("probe_id", "vec_id", "sim"), k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val want = rows.groupBy(_._1).view.mapValues { rs =>
      rs.sortWith { case ((_, v1, s1), (_, v2, s2)) =>
        val c = java.lang.Double.compare(
          if (s1 == 0.0) 0.0 else s1, if (s2 == 0.0) 0.0 else s2)
        c > 0 || (c == 0 && v1 < v2)
      }.take(5).map(_._2)
    }.toMap
    assert(got == want)
  }

  test("property: packing invariants under random chunk sizes incl. oversized") {
    val rnd = new Random(31)
    val chunks = (0L until 25L).flatMap { d =>
      (0L until (1 + rnd.nextInt(6)).toLong).map { c =>
        (d, c, (1 + rnd.nextInt(70)).toLong) // some chunks > budget 50
      }
    }.toDF("doc_id", "chunk_id", "chunk_tokens")
    val packed = SequencePacking.pack(chunks, maxTokens = 50).cache()
    assert(packed.count() == chunks.count())
    val overfull = packed.groupBy($"grp", $"bin")
      .agg(sum($"chunk_tokens").as("t"), count(lit(1)).as("n"))
      .filter($"t" > 50 && $"n" > 1)
    assert(overfull.isEmpty)
    // within (grp, doc), bins never decrease as chunk_id increases
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp", $"doc_id").orderBy($"chunk_id")
    val regress = packed
      .withColumn("prev", lag($"bin", 1).over(w))
      .filter($"prev".isNotNull && $"bin" < $"prev")
    assert(regress.isEmpty)
    packed.unpersist(); ()
  }

  private def randomDocs(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    // tiny vocab (forced collisions) + empty tokens from double
    // spaces + length-0/1 docs stress tokenization parity
    val rnd = new Random(seed)
    val vocab = Vector("a", "bb", "c", "dd", "e", "")
    (0L until nDocs.toLong).map { id =>
      val n = rnd.nextInt(14)
      (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  test("property: typed bigram loop == exploded-expression formulation, random texts") {
    val docs = randomDocs(17, 40).toDF("doc_id", "text")
    val got = TextStats.bigramStats(docs, topK = 10000).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // r3's expression formulation as the independent reference
    val toks = split($"text", " ", -1)
    val bi = docs.select(explode(when(size(toks) < 2,
        array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(0), size(toks) - 2),
        i => struct(element_at(toks, i + 1).as("w1"),
          element_at(toks, i + 2).as("w2"))))).as("bg"))
      .select($"bg.w1", $"bg.w2")
    val c12 = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
    val want = c12.join(c1, "w1")
      .select($"w1", $"w2", $"c12", $"c1",
        ($"c12".cast("double") / $"c1").as("p")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == want)
  }

  test("property: repetitionStats == plain-Scala tallies, random texts") {
    val raw = randomDocs(23, 40)
    val got = TextStats.repetitionStats(raw.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    raw.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val tokC = toks.groupBy(identity).map(_._2.length)
      val bgC = toks.sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1))).toSeq.groupBy(identity).map(_._2.length)
      val want = (toks.length.toLong, tokC.size.toLong, tokC.max.toLong,
        (if (bgC.isEmpty) 0 else bgC.max).toLong)
      assert(got(id) == want, s"doc $id '$text'")
    }
  }

  test("property: sessionize == plain-Scala fold, random times incl. exact-gap ties") {
    val rnd = new Random(37)
    // µs-resolution steps drawn to hit <, ==, and > the 1800 s gap
    val rows = (0 until 200).map { i =>
      val user = (i % 5).toLong
      (i.toLong, user, rnd.nextInt(4) match {
        case 0 => rnd.nextLong(1800L * 1000000L)          // within
        case 1 => 1800L * 1000000L                        // exactly gap
        case 2 => 1800L * 1000000L + 1L                   // just beyond
        case _ => 1800L * 1000000L + rnd.nextLong(1000000000L)
      })
    }
    // cumulative per-user times
    val byUser = rows.groupBy(_._2).view.mapValues { rs =>
      rs.scanLeft((0L, 0L)) { case ((_, t), (id, _, step)) =>
        (id, t + step)
      }.drop(1)
    }.toMap
    def usTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp((us / 1000000L) * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val ev = byUser.toSeq.flatMap { case (u, rs) =>
      rs.map { case (id, us) => (id, usTs(us), u, 1.0) }
    }
    val got = Temporal.sessionize(
        ev.toDF("event_id", "ts", "user_id", "value"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // reference fold: session counter bumps when gap > 1800 s
    val want = byUser.flatMap { case (u, rs) =>
      var session = 0L
      var prev = Long.MinValue
      val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
      rs.sortBy(r => (r._2, r._1)).foreach { case (_, us) =>
        if (prev == Long.MinValue || us - prev > 1800L * 1000000L)
          session += 1
        prev = us
        counts((u, session)) = counts.getOrElse((u, session), 0L) + 1L
      }
      counts
    }
    assert(got == want.toMap)
  }

  test("property: lmScore == plain-Scala add-one bigram NLL, random corpus") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val raw = randomDocs(29, 30)
    val got = LmScore.lmScore(raw.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val docBi = raw.map { case (id, text) =>
      id -> text.split(" ", -1).toSeq.sliding(2).filter(_.length == 2)
        .map(s => (s(0), s(1))).toSeq
    }.toMap
    val all = docBi.values.flatten.toSeq
    val c12 = all.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = all.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val v = raw.flatMap(_._2.split(" ", -1)).distinct.length.toLong
    val tick = c12.map { case (k, c) =>
      k -> BigDecimal(math.log((c + 1).toDouble / (c1(k._1) + v)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    docBi.filter(_._2.nonEmpty).foreach { case (id, bis) =>
      val s = bis.map(tick).sum
      val n = bis.length.toLong
      val want = r6(-s.toDouble / (n * 1e6))
      assert(got(id) == ((n, want)), s"doc $id")
    }
    assert(got.keySet == docBi.filter(_._2.nonEmpty).keySet)
  }
}
