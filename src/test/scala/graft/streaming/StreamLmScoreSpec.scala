package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.LmScore

/** Serving-shape LM scoring: fit once on the corpus, score arriving
  * micro-batches against the static LM tables — no stream state, no
  * corpus re-read.
  */
class StreamLmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("scoreAgainst(fitLm(docs), docs) reproduces lmScore exactly") {
    val docs = Tables.load(spark, sf, "documents")
    val (c12, c1, v) = LmScore.fitLm(docs)
    val got = LmScore.scoreAgainst(c12, c1, v, docs)
    val want = LmScore.lmScore(docs)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("unseen text scores through the add-one fallback rows") {
    // LM fit on {"a b", "a b", "a c"}: V=3, c1(a)=3
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val (c12, c1, v) = LmScore.fitLm(corpus)
    // "a z": w1 seen, bigram unseen → p = 1/(3+3); "q r": w1 unseen
    // → p = 1/3
    val got = LmScore
      .scoreAgainst(c12, c1, v, Seq((10L, "a z"), (11L, "q r"))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def nll(p: Double): Double =
      BigDecimal(-math.rint(math.log(p) * 1e6) / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L) == nll(1.0 / 6))
    assert(got(11L) == nll(1.0 / 3))
  }

  test("stream-static decontamination gate equals the batch split form") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Contamination
    val docs = Tables.load(spark, sf, "documents")
    val benchIdx = Contamination
      .indexOf(docs.filter($"doc_id" % 10 === 0)).localCheckpoint(true)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val collected = mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        collected ++= Contamination.contaminatedAgainst(benchIdx, b)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        ()
      }.start()
    corpus.grouped(20).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val want = Contamination.q51Contamination(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(collected.toSet == want)
  }

  test("per-micro-batch drift gate vs static reference, ≡ batch report") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Profiling
    val docs = Tables.load(spark, sf, "documents")
    val cut = (docs.agg(max($"doc_id")).head().getLong(0) + 1L) / 2L
    val ref = docs.filter($"doc_id" < cut).localCheckpoint(true)
    val arriving = docs.filter($"doc_id" >= cut)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    // the gate runs on each ingest batch against the static reference
    // (the q51 foreachBatch shape); the LAST batch's report over the
    // accumulated arrivals equals the batch q96 report
    val acc = mutable.ArrayBuffer.empty[(Long, String)]
    var last: Set[(String, Long, Long, Double)] = Set.empty
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        acc ++= b.select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1)))
        val cur = acc.toSeq.toDF("doc_id", "text")
        // tokenDrift emits the unrounded contribution; round to the
        // q96 presentation grain for the set compare
        last = Profiling.tokenDrift(ref, cur)
          .select(col("token"), col("cnt_ref"), col("cnt_new"),
            round(col("contrib"), 6).as("contrib"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .toSet
        ()
      }.start()
    arriving.grouped(80).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val want = Profiling.q96TokenDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(last == want)
  }

  test("streamed micro-batches score identically to the batch path") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sf, "documents")
      .limit(30).select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq
    val (c12, c1, v) = LmScore.fitLm(
      Tables.load(spark, sf, "documents"))
    // pin the LM tables the way a serving tier would (they'd be
    // parquet artifacts; localCheckpoint stands in)
    val (sc12, sc1, sv) =
      (c12.localCheckpoint(true), c1.localCheckpoint(true),
        v.localCheckpoint(true))
    val collected = mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        collected ++= LmScore.scoreAgainst(sc12, sc1, sv, batch)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        ()
      }.start()
    docs.grouped(10).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val want = LmScore
      .scoreAgainst(sc12, sc1, sv, docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(collected.toSet == want && want.nonEmpty)
  }
}
