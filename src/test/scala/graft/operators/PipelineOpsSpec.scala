package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The round-4 pipeline additions: mixture sampling, token histogram,
  * decile binning, shuffle shards, SemDeDup, importance weights.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mixtureSample: rate 0 drops all, rate 100 keeps all, deterministic") {
    val docs = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "keep" else "drop")).toDF("doc_id", "source")
    val got = Curation.mixtureSample(docs, "source", "doc_id",
      Map("keep" -> 100, "drop" -> 0))
    assert(got.count() == 100)
    assert(got.filter($"source" === "drop").count() == 0)
    val again = Curation.mixtureSample(docs.repartition(7), "source",
      "doc_id", Map("keep" -> 100, "drop" -> 0))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(again == (2L to 200L by 2).toSeq)
  }

  test("mixtureSample: unlisted sources keep everything") {
    val docs = (1L to 50L).map((_, "other")).toDF("doc_id", "source")
    assert(Curation.mixtureSample(docs, "source", "doc_id",
      Map("listed" -> 0)).count() == 50)
  }

  test("mixtureSample: a doc's fate is stable under corpus growth") {
    val small = (1L to 100L).map((_, "s")).toDF("doc_id", "source")
    val big = (1L to 1000L).map((_, "s")).toDF("doc_id", "source")
    val rates = Map("s" -> 37)
    val keptSmall = Curation.mixtureSample(small, "source", "doc_id", rates)
      .select($"doc_id").as[Long].collect().toSet
    val keptBig = Curation.mixtureSample(big, "source", "doc_id", rates)
      .select($"doc_id").as[Long].collect().toSet
    assert(keptBig.filter(_ <= 100L) == keptSmall)
  }

  test("tokenHistogram: hand-computed buckets and shares") {
    val docs = Seq(
      (1L, "a b c"),                                  // 3 toks  → bucket 0
      (2L, (1 to 17).map(_.toString).mkString(" ")),  // 17 toks → bucket 16
      (3L, (1 to 20).map(_.toString).mkString(" ")),  // 20 toks → bucket 16
    ).toDF("doc_id", "text")
    val got = Profiling.tokenHistogram(docs).orderBy($"bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0L, 1L, 0.333333), (16L, 2L, 0.666667)))
  }

  test("decileBins: 10 distinct values land in 10 distinct bins") {
    val scored = (1L to 10L).map(v => (v, v)).toDF("id", "score")
    val got = Profiling.decileBins(scored, "score")
      .orderBy($"score").collect().map(r => r.getAs[Int]("decile"))
    assert(got.toSeq == (1 to 10).toSeq)
  }

  test("decileBins: identical scores share a bin") {
    val scored = ((1L to 5L).map(i => (i, 1L)) ++
      (6L to 10L).map(i => (i, 100L))).toDF("id", "score")
    val bins = Profiling.decileBins(scored, "score")
      .select($"score", $"decile").distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(bins.size == 2 && bins(1L) < bins(100L))
  }

  test("shuffleShards: dense 1..n positions per shard, ids preserved") {
    val docs = (1L to 333L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val got = Curation.shuffleShards(docs, "doc_id", 8)
      .select($"doc_id", $"shard", $"pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.map(_._1).toSet == (1L to 333L).toSet)
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // deterministic under physical layout
    val again = Curation.shuffleShards(docs.repartition(11), "doc_id", 8)
      .select($"doc_id", $"shard", $"pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == got.toSet)
  }

  test("shuffleShards: shard and in-shard order are uncorrelated hashes") {
    val docs = (1L to 64L).map(i => (i, "")).toDF("doc_id", "text")
    val rows = Curation.shuffleShards(docs, "doc_id", 4)
      .select($"shard", $"pos", $"doc_id").collect()
    // within any shard, consecutive positions are NOT consecutive ids
    // (a correlated second hash would leave runs of adjacent ids)
    val runs = rows.groupBy(_.getInt(0)).values.map { shard =>
      val byPos = shard.sortBy(_.getLong(1)).map(_.getLong(2))
      byPos.sliding(2).count { case Array(a, b) => b == a + 1; case _ => false }
    }.sum
    assert(runs < 16) // 63 adjacent-id pairs total; chance level ≈ 16/4
  }

  test("semDedup: min id of each identical-vector group survives") {
    val a = Array(1.0f, 0.0f, 0.0f)
    val b = Array(0.0f, 1.0f, 0.0f)
    val c = Array(0.0f, 0.0f, 1.0f)
    val emb = Seq(
      (10L, a), (11L, a), (12L, a), // dup group → keep 10
      (20L, b), (21L, b),           // dup group → keep 20
      (30L, c),                     // singleton
    ).toDF("vec_id", "embedding")
    val got = SemDedup.semDedup(emb, tau = 0.95, nLists = 3)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(got.keySet == Set(10L, 20L, 30L))
    assert(got(10L) && got(20L) && !got(30L)) // reps flagged, singleton not
  }

  test("semDedup: within-cell pairs equal exact all-pairs when cells are coarse") {
    // nLists = 1 → one cell → cell-restricted dedup IS exact dedup
    val emb = graft.core.Tables.load(spark, sf, "embeddings")
      .limit(80).localCheckpoint(true)
    val survivors = SemDedup.semDedup(emb, tau = 0.4, nLists = 1)
      .select($"vec_id").as[Long].collect().toSet
    val exactPairs = NearDup.embeddingNearDupPairs(emb, tau = 0.4)
      .select($"vec_a".as("doc_a"), $"vec_b".as("doc_b"))
    val nonKeepers = DupClusters.connectedComponents(exactPairs)
      .filter($"id" =!= $"cluster_id").select($"id").as[Long].collect().toSet
    val all = emb.select($"vec_id").as[Long].collect().toSet
    assert(survivors == all -- nonKeepers)
  }

  test("mixtureSample: raising a rate only ADDS docs (hash-frontier nesting)") {
    val docs = (1L to 500L).map((_, "s")).toDF("doc_id", "source")
    val kept = (10 to 90 by 20).map { r =>
      Curation.mixtureSample(docs, "source", "doc_id", Map("s" -> r))
        .select($"doc_id").as[Long].collect().toSet
    }
    kept.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo.subsetOf(hi)) // nested frontiers: no doc churn on re-rate
    }
  }

  test("decileBins: binning is monotone in the score") {
    val scored = (1L to 97L).map(i => (i, i * 31 % 97)).toDF("id", "score")
    val rows = Profiling.decileBins(scored, "score")
      .select($"score", $"decile").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    rows.sliding(2).foreach { case Array((_, d1), (_, d2)) =>
      assert(d1 <= d2)
    }
  }

  test("redact: planted PII is counted and masked, clean text untouched") {
    val docs = Seq(
      (1L, "contact alice.smith+x@example.co.uk or 555-123-4567 now"),
      (2L, "server at 192.168.1.100 and 10.0.0.1 responded"),
      (3L, "plain clean text with no identifiers at all"),
      (4L, "dotted phone 555.123.4567 stays a phone not an ip"),
    ).toDF("doc_id", "text")
    val got = Redact.scan(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[Long]("n_ipv4"), r.getAs[String]("redacted"))).toMap
    assert(got(1L)._1 == 1 && got(1L)._2 == 1)
    assert(got(1L)._4 == "contact [EMAIL] or [PHONE] now")
    assert(got(2L)._3 == 2 && got(2L)._4.contains("[IP] and [IP]"))
    assert(got(3L) == (0L, 0L, 0L, "plain clean text with no identifiers at all"))
    assert(got(4L)._4.contains("[PHONE]") && !got(4L)._4.contains("[IP]"))
  }

  test("redact: pure per-row pass — no exchange in the plan") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val p = Redact.scan(docs).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"))
  }

  test("mixtureSample: shuffle-free predicate on the scan") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val p = Curation.mixtureSample(docs, "source", "doc_id", Map("src0" -> 50))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"))
  }

  test("madOutliers: hand-computed median, MAD, and outlier count") {
    val df = ((1L to 9L).map(v => ("a", v.toDouble)) :+ ("a", 100.0))
      .toDF("grp", "v")
    val r = Profiling.madOutliers(df, "grp", "v").head()
    // sorted values 1..9,100 → med 5.5; |v−5.5| sorted → MAD 2.5;
    // only 100 (adev 94.5) clears 3·MAD = 7.5
    assert(r.getAs[Long]("n") == 10)
    assert(r.getAs[Long]("n_outliers") == 1)
    assert(r.getAs[Long]("med_ticks") == 5500000L)
    assert(r.getAs[Long]("mad_ticks") == 2500000L)
  }

  test("madOutliers: constant group has MAD 0 and no outliers") {
    val df = (1 to 8).map(_ => ("c", 7.0)).toDF("grp", "v")
    val r = Profiling.madOutliers(df, "grp", "v").head()
    assert(r.getAs[Long]("mad_ticks") == 0L && r.getAs[Long]("n_outliers") == 0)
  }

  test("importanceWeights: self-target weights are exactly zero") {
    val docs = graft.core.Tables.load(spark, sf, "documents").limit(50)
    val w = LmScore.importanceWeights(docs, lit(true))
      .select($"weight").as[Double].collect()
    assert(w.nonEmpty && w.forall(_ == 0.0))
  }

  test("importanceWeights: target-exclusive tokens score positive, " +
      "background-exclusive negative") {
    val docs = Seq(
      (1L, "aa aa ab ba", "en"),
      (2L, "aa ab ab bb", "en"),
      (3L, "zz zy zz yy", "fr"),
      (4L, "zz zy yy xx", "fr"),
    ).toDF("doc_id", "text", "lang")
    val w = LmScore.importanceWeights(docs, $"lang" === "en")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(w(1L) > 0 && w(2L) > 0) // all-target tokens
    assert(w(3L) < 0 && w(4L) < 0) // tokens absent from the target
  }
}
