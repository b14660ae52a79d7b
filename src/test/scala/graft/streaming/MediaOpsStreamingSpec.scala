package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.{AudioHash, ImageHash, Redact, VideoHash}

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
}
