package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.{AudioHash, Blocklist, ImageHash, Markdown, Redact, VideoHash}

/** The r12 media/curation operators — perceptual signatures over all
  * three modalities and the secrets scan — are stateless projections,
  * so the SAME operator call must run unchanged over a Structured
  * Streaming source and produce exactly the batch answer: the
  * ingest-time dedup gate and the scrubbing pass compose with the bus
  * pipeline with no rewrite, no state store, no watermark.
  */
class MediaOpsStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def drain(df: org.apache.spark.sql.DataFrame, name: String) = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  private def agree(got: org.apache.spark.sql.DataFrame,
      exp: org.apache.spark.sql.DataFrame): Unit =
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)

  test("image, audio, and video signatures run unchanged on a " +
      "media stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imgRows = (0L to 20L).map(i => (i, ImageHash.render(i, 1, "png")))
    val ims = MemoryStream[(Long, Array[Byte])]
    ims.addData(imgRows: _*)
    agree(
      drain(ImageHash.signatures(
        ims.toDF().toDF("media_id", "payload")), "s_img_sig"),
      ImageHash.signatures(imgRows.toDF("media_id", "payload")))

    val audRows = (0L to 20L).map(i => (i, AudioHash.render(i, 0)))
    val ams = MemoryStream[(Long, Array[Byte])]
    ams.addData(audRows: _*)
    agree(
      drain(AudioHash.signatures(
        ams.toDF().toDF("media_id", "payload")), "s_aud_sig"),
      AudioHash.signatures(audRows.toDF("media_id", "payload")))

    val vidRows = (0L to 10L).map(i => (i, VideoHash.renderAvi(i, 0)))
    val vms = MemoryStream[(Long, Array[Byte])]
    vms.addData(vidRows: _*)
    agree(
      drain(VideoHash.signatures(
        vms.toDF().toDF("media_id", "payload")), "s_vid_sig"),
      VideoHash.signatures(vidRows.toDF("media_id", "payload")))
  }

  test("the secrets scan runs unchanged on a document stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = (0L to 60L).map(i => (i, "plain tokens only"))
      .toDF("doc_id", "text")
      .select($"doc_id", Redact.plantedText($"doc_id", $"text").as("text"))
      .as[(Long, String)].collect().toSeq
    val ms = MemoryStream[(Long, String)]
    ms.addData(docs: _*)
    val got = drain(Redact.secretsScan(
      ms.toDF().toDF("doc_id", "text")), "s_secrets")
    val exp = Redact.secretsScan(docs.toDF("doc_id", "text"))
    agree(got, exp)
    // the stream found the plants, not vacuous zeros
    assert(exp.selectExpr("sum(n_cards + n_keys + n_entropy)")
      .head().getLong(0) > 0)
  }

  test("the markdown structural ops — fences, links, tables, " +
      "sections — run unchanged on a document stream, with plants " +
      "split across TWO micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // one planted corpus carrying every op's fixtures
    val docs = (0L to 60L).map(i => (i, "plain tokens here"))
      .toDF("doc_id", "text")
      .select($"doc_id",
        Markdown.plantedSections($"doc_id",
          Markdown.plantedTables($"doc_id",
            Markdown.plantedLinks($"doc_id",
              Markdown.plantedMarkdown($"doc_id", $"text")))).as("text"))
      .as[(Long, String)].collect().toSeq
    val (batch1, batch2) = docs.splitAt(docs.length / 2)

    def twoBatchDrain(
        op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        name: String) = {
      val ms = MemoryStream[(Long, String)]
      val q = op(ms.toDF().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        ms.addData(batch1: _*); q.processAllAvailable()
        ms.addData(batch2: _*); q.processAllAvailable()
        assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
          s"$name did not see two non-empty micro-batches")
      } finally q.stop()
      spark.table(name)
    }

    val batch = docs.toDF("doc_id", "text")
    agree(twoBatchDrain(Markdown.codeFences(_), "s_md_fences"),
      Markdown.codeFences(batch))
    agree(twoBatchDrain(Markdown.extractLinks(_), "s_md_links"),
      Markdown.extractLinks(batch))
    agree(twoBatchDrain(Markdown.pipeTables(_), "s_md_tables"),
      Markdown.pipeTables(batch))
    agree(twoBatchDrain(Markdown.sections(_), "s_md_sections"),
      Markdown.sections(batch))
    // non-vacuous: every op found its plants
    assert(Markdown.codeFences(batch).count() > 0)
    assert(Markdown.extractLinks(batch).count() > 0)
    assert(Markdown.pipeTables(batch).count() > 0)
    assert(Markdown.sections(batch).count() > 0)
  }

  test("the blocklist scan runs unchanged on a document stream, with " +
      "plants split across TWO micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pats = Seq("bad phrase", "never fires", "tail")
    val docs = (0L to 60L).map { i =>
      val planted =
        if (i % 5 == 0) s"lead bad phrase mid bad phrase tail d$i"
        else s"clean text d$i"
      (i, planted)
    }
    val (batch1, batch2) = docs.splitAt(docs.length / 2)
    val ms = MemoryStream[(Long, String)]
    val q = Blocklist.scanCounts(ms.toDF().toDF("doc_id", "text"), pats)
      .writeStream.format("memory").queryName("s_blocklist")
      .outputMode("append").start()
    try {
      ms.addData(batch1: _*); q.processAllAvailable()
      ms.addData(batch2: _*); q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "blocklist stream did not see two non-empty micro-batches")
    } finally q.stop()
    val exp = Blocklist.scanCounts(docs.toDF("doc_id", "text"), pats)
    agree(spark.table("s_blocklist"), exp)
    // non-vacuous: the plants fired, including a multi-hit doc
    assert(exp.filter($"hits" >= 2).count() > 0)

    // redaction is the same stateless projection: stream ≡ batch
    val ms2 = MemoryStream[(Long, String)]
    ms2.addData(docs: _*)
    val q2 = Blocklist.redact(ms2.toDF().toDF("doc_id", "text"), pats)
      .writeStream.format("memory").queryName("s_blockredact")
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    val expR = Blocklist.redact(docs.toDF("doc_id", "text"), pats)
    agree(spark.table("s_blockredact"), expR)
    assert(expR.filter($"n_spans" >= 2).count() > 0)

    // the CONSERVATIVE (wildcard fixpoint) redact is also a stateless
    // projection: stream ≡ batch over already-masked inputs
    val masked = expR.select($"doc_id", $"masked".as("text"))
      .as[(Long, String)].collect().toSeq
    val delta = Seq("phrase tail") // straddles "bad phrase"'s mask
    val ms3 = MemoryStream[(Long, String)]
    ms3.addData(masked: _*)
    val q3 = Blocklist
      .redactConservative(ms3.toDF().toDF("doc_id", "text"), delta)
      .writeStream.format("memory").queryName("s_consredact")
      .outputMode("append").start()
    try q3.processAllAvailable() finally q3.stop()
    val expC = Blocklist
      .redactConservative(masked.toDF("doc_id", "text"), delta)
    agree(spark.table("s_consredact"), expC)
    assert(expC.filter($"n_masked" > 0).count() > 0) // the straddle fired
  }
}
