package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Round-4 curation additions: decontamination (q51), repetition
  * diagnostics (q52), exact quantiles (q53), corpus-LM scoring (q54).
  */
class CurationExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("contaminated: planted 8-gram copy is flagged; clean docs are not") {
    // bench doc 10 shares an exact 8-token run with corpus doc 1;
    // doc 2 shares only shorter runs; doc 3 is disjoint
    val run = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq(
      (10L, s"pre $run post extra tail words here"),
      (1L, s"other lead-in $run completely different ending"),
      (2L, "w1 w2 w3 w4 pause w5 w6 w7 w8 pause"),
      (3L, "a b c d e f g h i j k l")).toDF("doc_id", "text")
    val got = Contamination.contaminated(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(1L))
    assert(got(1L) == ((1L, 1L)))
  }

  test("vocabHead: hand-counted ranks, ties by term, cum_share sums to head share") {
    val docs = Seq((1L, "b a a c b a"), (2L, "c b")).toDF("doc_id", "text")
    // freqs: a=3, b=3, c=2, total 8; ties a/b break alphabetically
    val got = TextStats.vocabHead(docs, k = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1, "a", 3L, 0.375), (2, "b", 3L, 0.75)))
  }

  test("vocabHead: corpus invariants — monotone freq, increasing share") {
    val got = TextStats.q94VocabHead(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3)))
    val vocab = Tables.load(spark, sf, "documents")
      .select(explode(split($"text", " ")).as("t"))
      .select($"t").distinct().count()
    assert(got.length == math.min(50L, vocab))
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2 && a._3 < b._3 && a._1 + 1 == b._1)
    }
    assert(got.last._3 <= 1.0)
  }

  test("sourceOverlap: planted shared run counted once per source pair") {
    val run = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq(
      (1L, s"$run x", "sA"), (2L, s"$run y", "sA"), // two sA docs share the run
      (3L, s"z $run", "sB"),
      (4L, "q r s t u v w x y", "sC")).toDF("doc_id", "text", "source")
    val got = Contamination.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // sA and sB share exactly the one 8-gram run (distinct per source,
    // so sA's two copies count once); sC is disjoint
    assert(got == Set(("sA", "sB", 1L)))
  }

  test("duplicatedNgrams: planted cross-doc copy, hand-counted fractions") {
    // docs 1 and 2 share one exact 8-token run; doc 3 is disjoint;
    // doc 4 is too short to shingle (absent from the result)
    val run = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq(
      (1L, s"$run t1 t2"),               // 10 toks → 3 8-grams, 1 shared
      (2L, s"lead $run"),                // 9 toks → 2 8-grams, 1 shared
      (3L, "a b c d e f g h i"),         // 9 toks → 2 8-grams, 0 shared
      (4L, "too short")).toDF("doc_id", "text")
    val got = Contamination.duplicatedNgrams(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((3L, 1L, 0.333333)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((2L, 0L, 0.0)))
  }

  test("duplicatedNgrams: identical docs are 100% duplicated, corpus-wide sanity") {
    val docs = Tables.load(spark, sf, "documents")
    val twin = docs.limit(1).withColumn("doc_id", lit(999999L))
    val got = Contamination.duplicatedNgrams(docs.unionByName(twin)).cache()
    assert(got.filter($"doc_id" === 999999L).head().getDouble(3) == 1.0)
    // invariants: 0 ≤ n_dup ≤ n_grams; dup_frac consistent
    assert(got.filter($"n_dup" > $"n_grams" || $"n_dup" < 0L).isEmpty)
    assert(got.filter(abs($"dup_frac" -
      round($"n_dup".cast("double") / $"n_grams", 6)) > 1e-12).isEmpty)
  }

  test("contaminated: multi-gram, multi-bench counts") {
    // doc 1 shares a 9-token run with bench 10 (→ two distinct
    // 8-grams) and an 8-token run with bench 20 (→ one more)
    val nine = "a1 a2 a3 a4 a5 a6 a7 a8 a9"
    val eight = "b1 b2 b3 b4 b5 b6 b7 b8"
    val docs = Seq(
      (10L, s"x y $nine z"),
      (20L, s"$eight q r s t u v w"),
      (1L, s"$nine gap gap $eight")).toDF("doc_id", "text")
    val got = Contamination.contaminated(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((3L, 2L)))
  }

  test("contaminated: df-cut drops ubiquitous shingles, keeps rare overlap") {
    val hot = "h1 h2 h3 h4 h5 h6 h7 h8"   // planted in 4 docs
    val rare = "r1 r2 r3 r4 r5 r6 r7 r8"  // shared by exactly 2
    val docs = Seq(
      (10L, s"$hot x y z w v u t"),
      (20L, s"$rare k l m n o p q"),
      (1L, s"$hot a b c d e f g"),
      (2L, s"$hot $rare"),
      (3L, s"$hot i j aa bb cc dd ee")).toDF("doc_id", "text")
    // unbounded: both overlaps found
    val full = Contamination.contaminated(docs)
      .collect().map(r => r.getLong(0)).toSet
    assert(full == Set(1L, 2L, 3L))
    // dfCut 3: the hot 8-gram (df=4) leaves the index; only doc 2's
    // rare overlap with bench 20 survives
    val cut = Contamination.contaminated(docs, dfCut = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cut == Map(2L -> 1L))
  }

  test("skewReport: hand counts, shares, top-k order") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .toDF("k")
    val got = Profiling.skewReport(df, "k", topK = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("hot", 6L, 0.6), ("warm", 3L, 0.3)))
  }

  test("repetitionStats: hand-computed counts and ratios") {
    val docs = Seq(
      (1L, "a a a b"),        // top token a×3, top bigram (a,a)×2
      (2L, "x"),              // single token: no bigrams
      (3L, "p q p q p")).toDF("doc_id", "text")
    val got = TextStats.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = got(1L)
    assert((d1.getLong(1), d1.getLong(2), d1.getLong(3), d1.getLong(4))
      == ((4L, 2L, 3L, 2L)))
    assert(d1.getDouble(5) == 0.5 && d1.getDouble(6) == 0.75)
    assert(d1.getDouble(7) == 2.0 / 3)
    val d2 = got(2L)
    assert((d2.getLong(1), d2.getLong(4)) == ((1L, 0L)))
    assert(d2.isNullAt(7)) // top_bigram_frac undefined at 1 token
    val d3 = got(3L)
    assert((d3.getLong(3), d3.getLong(4)) == ((3L, 2L))) // p×3, (p,q)×2
  }

  test("q53 quantiles: linear interpolation against a hand case") {
    // percentile([10,20,30,40], .25) = 10 + .75*(20-10) = 17.5
    val df = Seq(("s", 10L), ("s", 20L), ("s", 30L), ("s", 40L))
      .toDF("source", "n_chars")
    val r = df.groupBy($"source")
      .agg(percentile($"n_chars", lit(0.25)).as("p25"),
        percentile($"n_chars", lit(0.5)).as("p50"))
      .head()
    assert(r.getDouble(1) == 17.5 && r.getDouble(2) == 25.0)
  }

  test("approxQuantiles: rank-error bound vs exact per-source quantiles") {
    val docs = Tables.load(spark, sf, "documents").cache()
    val acc = 100
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    val approx = Profiling.approxQuantiles(docs, "source", "n_chars",
      qs, acc).collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        qs.indices.map(i => r.getLong(2 + i)))).toMap
    val data = docs.select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).sorted }
    approx.foreach { case (src, (n, vals)) =>
      val xs = data(src)
      assert(n == xs.length)
      qs.zip(vals).foreach { case (q, v) =>
        // sketch guarantee: v is a data point whose rank is within
        // n/accuracy of target (+1 row slack for rank convention)
        assert(xs.contains(v), s"$src q$q: $v not a data point")
        val rank = xs.count(_ <= v)
        val target = q * xs.length
        assert(math.abs(rank - target) <= xs.length.toDouble / acc + 1.0,
          s"$src q$q: rank $rank vs target $target")
      }
    }
  }

  test("madOutliers sketch form: approx median holds the rank-error bound") {
    // NOT cached: a cached `events` plan would serve every later
    // suite's scan from InMemoryRelation and break the parquet
    // pushdown contracts (the cache manager is session-global)
    val events = Tables.load(spark, sf, "events")
    val acc = 100
    val exact = Profiling.madOutliers(events, "event_type", "value")
    val approx = Profiling.madOutliers(events, "event_type", "value",
      accuracy = acc)
    // same interface: identical schema either path
    assert(approx.columns.toSeq === exact.columns.toSeq)
    val data = events.select($"event_type", $"value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).sorted }
    approx.collect().foreach { r =>
      val (t, n, nOut) = (r.getString(0), r.getLong(1), r.getLong(2))
      val med = r.getLong(3).toDouble / 1e6
      val xs = data(t)
      assert(n === xs.length.toLong && nOut <= n)
      // sketch guarantee: the median is a data point whose rank is
      // within n/accuracy of n/2 (+1 row slack for rank convention;
      // +1e-9 value slack for the 1e6-tick round-trip)
      val rank = xs.count(_ <= med + 1e-9)
      assert(math.abs(rank - xs.length / 2.0) <= xs.length.toDouble / acc + 1.0,
        s"$t: median rank $rank of ${xs.length}")
    }
  }

  test("winsorScale sketch form: approx cuts hold the rank-error bound") {
    val events = Tables.load(spark, sf, "events")
    val acc = 100
    val (lo, hi) = (0.05, 0.95)
    val approx = Profiling.winsorScale(events, "event_type", "value",
      lo, hi, accuracy = acc)
    assert(approx.columns.toSeq ===
      Profiling.winsorScale(events, "event_type", "value").columns.toSeq)
    val rows = approx.select($"event_type", $"value", $"winsorized", $"scaled")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // scaled stays in [0,1]; winsorized clamps toward the band
    assert(rows.forall(t => t._4 >= 0.0 && t._4 <= 1.0))
    val data = rows.groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).sorted }
    // recover each group's cuts from the clamp output and bound their
    // empirical ranks (cuts are 6-dp rounded → 1e-6 comparison slack)
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val xs = data(t)
      val plo = rs.map(_._3).min
      val phi = rs.map(_._3).max
      val rLo = xs.count(_ <= plo + 1e-6)
      val rHi = xs.count(_ <= phi + 1e-6)
      assert(math.abs(rLo - lo * xs.length) <= xs.length.toDouble / acc + 1.0,
        s"$t: lo cut rank $rLo of ${xs.length}")
      assert(math.abs(rHi - hi * xs.length) <= xs.length.toDouble / acc + 1.0,
        s"$t: hi cut rank $rHi of ${xs.length}")
    }
  }

  test("tokenDrift: planted vanished/newborn tokens dominate the report") {
    val ref = Seq((1L, "old old old common common"),
      (2L, "old common stable")).toDF("doc_id", "text")
    val cur = Seq((3L, "new new new common common"),
      (4L, "new common stable")).toDF("doc_id", "text")
    val got = Profiling.tokenDrift(ref, cur, topK = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // 'old' (4,0) and 'new' (0,4) are the extreme drifts; 'common'
    // and 'stable' split evenly → zero contribution
    assert(got.take(2).map(_._1).toSet == Set("new", "old"))
    assert(got.find(_._1 == "old").get._2 == 4L)
    assert(got.find(_._1 == "old").get._3 == 0L)
    assert(got.find(_._1 == "new").get._4 == got.find(_._1 == "old").get._4)
    assert(got.drop(2).forall(_._4 < got.head._4))
    val even = got.find(t => t._1 == "common" || t._1 == "stable")
    even.foreach(t => assert(t._4 == 0.0))
  }

  test("pearsonExact: perfect, anti, and hand-computed correlations") {
    val df = Seq(
      ("p", 1L, 2L), ("p", 2L, 4L), ("p", 3L, 6L),   // y = 2x → +1
      ("a", 1L, 6L), ("a", 2L, 4L), ("a", 3L, 2L),   // y = 8−2x → −1
      ("h", 1L, 1L), ("h", 2L, 3L), ("h", 3L, 2L)
    ).toDF("g", "x", "y")
    val got = Profiling.pearsonExact(df, "g", "x", "y").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("p") == 1.0 && got("a") == -1.0)
    // h: moments n=3 sx=6 sy=6 sxy=13 sxx=14 syy=14 →
    // (39−36)/(sqrt(42−36)·sqrt(42−36)) = 3/6 = 0.5
    assert(got("h") == 0.5)
  }

  test("heavyHitters: Misra-Gries guarantees under real eviction pressure") {
    // planted skew: one key at 40% share among many cold keys, with
    // k far below the distinct-key count so decrements actually fire
    val rows = (Seq.fill(400)("hot") ++ (0 until 600).map(i => s"cold$i"))
    val df = rows.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("i", "key")
    val k = 5
    val got = Profiling.heavyHitters(df, "key", k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = rows.length
    val thresh = n.toDouble / (k + 1) // ≈ 167 < 400 → "hot" must survive
    assert(got.contains("hot"), "hot key evicted")
    assert(got("hot") <= 400L && 400L - got("hot") <= thresh,
      s"hot est ${got("hot")}")
    assert(got.size <= k)
    // undercount property holds for every reported key
    val exact = rows.groupBy(identity).map { case (s, xs) => s -> xs.length.toLong }
    got.foreach { case (key, est) => assert(est <= exact(key)) }
    // corpus pressure: exploded doc tokens (vocab ≫ k); sketch keys
    // are a subset of the vocabulary with undercounted estimates
    val toks = Tables.load(spark, sf, "documents")
      .select(explode(split($"text", " ")).as("tok"))
    val exactTok = toks.groupBy($"tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exactTok.size > 8, "need vocab > k for eviction")
    val gotTok = Profiling.heavyHitters(toks, "tok", 8).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(gotTok.nonEmpty && gotTok.length <= 8)
    gotTok.foreach { case (t, est) => assert(est <= exactTok(t)) }
    val nTok = exactTok.values.sum
    exactTok.foreach { case (t, c) =>
      if (c > nTok / 9.0)
        assert(gotTok.map(_._1).contains(t), s"hot token $t missing")
    }
  }

  test("lmScore: hand-computed add-one bigram NLL") {
    // corpus: "a b" ×2 and "a c". V = 3 (a, b, c).
    // c(a·)=3: p(b|a) = (2+1)/(3+3) = .5 ; p(c|a) = (1+1)/6 = 1/3
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = LmScore.lmScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val nllB = math.rint(math.log(0.5) * 1e6) / 1e6
    val nllC = math.rint(math.log(1.0 / 3) * 1e6) / 1e6
    assert(got(1L)._1 == 1L && got(1L)._2 == -BigDecimal(nllB)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(3L)._2 == -BigDecimal(nllC)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("perGroupCap: ≤ k per group, equals window formulation, growth-stable frontier") {
    val docs = Tables.load(spark, sf, "documents")
    val capped = Curation.perGroupCap(docs, "lang", "doc_id", 5).cache()
    val sizes = capped.groupBy($"lang").count().collect()
    assert(sizes.nonEmpty && sizes.forall(_.getLong(1) <= 5L))
    // reference: row_number window over the same portable hash
    val h = (($"doc_id" % 2147483648L) * 2654435761L) % 2147483648L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy(h.desc, $"doc_id")
    val want = docs.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5).select($"lang", $"doc_id", h.as("h"))
    assert(capped.exceptAll(want).isEmpty && want.exceptAll(capped).isEmpty)
    capped.unpersist(); ()
  }

  test("duplicatedChunks: planted cross-doc boilerplate found, unique chunks not") {
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12 u13 u14 u15"),
      (2L, s"$boiler v1 v2 v3 v4 v5 v6 v7 v8 v9 v10 v11 v12 v13 v14 v15"),
      (3L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val got = TextStats.duplicatedChunks(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // both 35-token docs chunk at strides 0/15/30; only the stride-0
    // chunk (the 20 boilerplate tokens) is shared
    assert(got == Map(boiler -> ((2L, 2L))))
  }

  test("sessionize: gap splits, boundary-exact, per-user independence") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1: events at 0s, 1800s (exactly the gap — same session),
    // 3601s (> gap after 1800 — new session); user 2: one event
    val ev = Seq(
      (1L, ts(0), 1L, 10.0), (2L, ts(1800), 1L, 20.0),
      (3L, ts(3601), 1L, 5.0), (4L, ts(50), 2L, 1.0))
      .toDF("event_id", "ts", "user_id", "value")
      .select($"event_id", $"ts", $"user_id", $"value")
    val got = Temporal.sessionize(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(5))).toMap
    assert(got == Map(
      (1L, 1L) -> ((2L, 30.0)),   // 0s + 1800s: gap == 1800 keeps
      (1L, 2L) -> ((1L, 5.0)),    // 3601s: 1801 > 1800 splits
      (2L, 1L) -> ((1L, 1.0))))
  }

  test("sessionize == session_window on µs-precision events") {
    // the two differ only when a gap is EXACTLY 1800.000000 s
    // (session_window's end is exclusive; gaps-and-islands keeps ==)
    // — impossible-in-practice on µs event data, absent here
    val ev = Tables.load(spark, sf, "events")
    val batch = Temporal.sessionize(ev)
      .select($"user_id", $"start_ts", $"n", $"total")
    val stream = graft.streaming.WindowedAgg.sessions(ev)
      .select($"user_id", $"session_start".as("start_ts"),
        $"n_events".as("n"), $"total")
    assert(batch.exceptAll(stream).isEmpty &&
      stream.exceptAll(batch).isEmpty)
  }

  test("hardNegatives: never same-label, equals filtered window top-k") {
    val emb = Tables.load(spark, sf, "embeddings")
    val got = Similarity.hardNegatives(emb, Seq(0L, 1L, 2L), 5).cache()
    // no negative shares its probe's label
    val labels = emb.select($"vec_id", $"label")
    val probeLabels = labels
      .withColumnsRenamed(Map("vec_id" -> "probe_id", "label" -> "pl"))
    assert(got.join(labels, "vec_id").join(probeLabels, "probe_id")
      .filter($"label" === $"pl").isEmpty)
    // equals the window formulation
    val probes = emb.filter($"vec_id".isin(0L, 1L, 2L))
      .select($"vec_id".as("probe_id"), $"embedding".as("pe"),
        $"label".as("pl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"probe_id").orderBy($"sim".desc, $"vec_id")
    val want = emb.crossJoin(broadcast(probes))
      .filter($"label" =!= $"pl")
      .select($"probe_id", $"vec_id",
        Similarity.cosineSim($"embedding", $"pe").as("sim"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"probe_id", $"vec_id", $"sim")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    got.unpersist(); ()
  }

  test("lmScore: repeated bigrams weight the average by count") {
    // doc "a a a": bigram (a,a)×2; corpus adds "a b" so p(a|a) is
    // not degenerate. V=2; c(a·)=3; p(a|a)=(2+1)/(3+2)=.6
    val docs = Seq((1L, "a a a"), (2L, "a b")).toDF("doc_id", "text")
    val got = LmScore.lmScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == 2L)
    val tick = math.rint(math.log(0.6) * 1e6)
    val want = BigDecimal(-2 * tick / (2 * 1e6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._2 == want)
  }
}
