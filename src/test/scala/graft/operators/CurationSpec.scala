package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // long high-quality text (≥ 0.5 quality), distinct per seed word
  private def goodText(seed: String) =
    (1 to 60).map(i => s"$seed$i").mkString(" ")

  test("curate: lang allowlist, quality gate, dup non-keepers dropped") {
    val dupText = goodText("dup") // identical → Jaccard 1.0 pair
    val docs = Seq(
      (1L, dupText, "en"),            // keeper (min id of cluster)
      (2L, dupText, "en"),            // non-keeper → dropped
      (3L, goodText("ok"), "en"),     // clean survivor
      (4L, goodText("fr"), "fr"),     // lang-filtered
      (5L, "a of the to in", "en"),   // low quality → dropped
    ).map { case (id, t, l) => (id, t, l, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = Curation.curate(docs).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("curate: precomputed pair set ≡ computing pairs internally") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val pairs = NearDup.jaccardPairs(docs, 0.5)
      .select($"doc_a", $"doc_b").localCheckpoint(true)
    val internal = Curation.curate(docs).orderBy($"doc_id").collect().toSeq
    val injected = Curation.curate(docs, precomputedPairs = Some(pairs))
      .orderBy($"doc_id").collect().toSeq
    assert(injected == internal)
    // extra columns on the injected frame must not leak through
    val wide = pairs.withColumn("jac_extra", lit(0.9))
    val injected2 = Curation.curate(docs, precomputedPairs = Some(wide))
      .orderBy($"doc_id").collect().toSeq
    assert(injected2 == internal)
  }

  test("leakageSafeSplits: near-dup twins straddling the hash frontier co-locate") {
    def h(id: Long): Long = ((id % 2147483648L) * 2654435761L) % 2147483648L % 100L
    // pick a doc id whose own hash falls in 'test' and a twin in 'train'
    val testId = (0L until 2000L).find(h(_) >= 90).get
    val trainId = (0L until 2000L).find(h(_) < 80).get
    val twin = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    val docs = Seq(
      (trainId, twin), (testId, twin), // exact twins: jaccard 1
      (1999999L, "lone wolf doc with own words here")
    ).toDF("doc_id", "text")
    val got = Curation.leakageSafeSplits(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // both twins key by the min id → identical split, and the lone
    // doc keeps its own q48 assignment
    assert(got(trainId) == got(testId))
    assert(got(trainId)._1 == math.min(trainId, testId))
    val lone = got(1999999L)
    assert(lone._1 == 1999999L)
  }

  test("leakageSafeSplits: no q18 pair straddles splits on the corpus") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val splits = Curation.leakageSafeSplits(docs)
      .select($"doc_id", $"split")
    val pairs = NearDup.jaccardPairs(docs, 0.5)
    val straddle = pairs
      .join(splits.withColumnsRenamed(Map("doc_id" -> "doc_a", "split" -> "sa")), "doc_a")
      .join(splits.withColumnsRenamed(Map("doc_id" -> "doc_b", "split" -> "sb")), "doc_b")
      .filter($"sa" =!= $"sb")
    assert(straddle.isEmpty)
    // non-clustered docs keep the plain q48 assignment
    val clustered = pairs.select($"doc_a".as("doc_id"))
      .union(pairs.select($"doc_b".as("doc_id"))).distinct()
    val free = splits.join(clustered, Seq("doc_id"), "left_anti")
    val q48 = Curation.q48SplitAssign(spark, sf)
    assert(free.exceptAll(q48.join(free.select($"doc_id"), "doc_id")).isEmpty)
  }

  test("leakageSafeSplits: precomputed pair set ≡ computing pairs internally") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val pairs = NearDup.jaccardPairs(docs, 0.5).select($"doc_a", $"doc_b")
    val a = Curation.leakageSafeSplits(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    val b = Curation.leakageSafeSplits(docs,
        precomputedPairs = Some(pairs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("temperatureSample: quotas ∝ sqrt(n), small groups upweighted, frontier exact") {
    // A: 9 docs, B: 1 doc, total 8 → w = (3, 1), norm 4 →
    // quota A = floor(6.5) = 6, quota B = floor(2.5) = 2 (vs 1 proportional)
    val docs = ((0L until 9L).map(i => (i, "A")) :+ (100L, "B"))
      .toDF("doc_id", "source")
    val got = Curation.temperatureSample(docs, "source", "doc_id", 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byG = got.groupBy(_._1)
    assert(byG("A").head._2 == 6L && byG("A").length == 6)
    assert(byG("B").head._2 == 2L && byG("B").length == 1) // only 1 doc exists
    // selection = the quota LARGEST hashes of the group
    def h(id: Long) = ((id % 2147483648L) * 2654435761L) % 2147483648L
    val expectA = (0L until 9L).sortBy(id => (-h(id), id)).take(6).toSet
    assert(byG("A").map(_._3).toSet == expectA)
  }

  test("labelCentroids: hand-computed means") {
    val emb = Seq(
      (1L, Array(1.0f, 2.0f), 0),
      (2L, Array(3.0f, 6.0f), 0),
      (3L, Array(10.0f, 0.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val got = Curation.labelCentroids(emb)
      .orderBy($"label", $"dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0, 0L, 2.0), (0, 1L, 4.0), (1, 0L, 10.0), (1, 1L, 0.0)))
  }

  test("labelCentroids: exact under any partitioning (integer-tick accumulation)") {
    val emb = graft.core.Tables.load(spark, sf, "embeddings")
    val a = Curation.labelCentroids(emb)
      .orderBy($"label", $"dim").collect().map(_.getDouble(2)).toSeq
    val b = Curation.labelCentroids(emb.repartition(13, $"vec_id"))
      .orderBy($"label", $"dim").collect().map(_.getDouble(2)).toSeq
    assert(a == b) // bit-identical, not approximately equal
  }
}
