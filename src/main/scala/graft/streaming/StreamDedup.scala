package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the ingest-side guard of a training-data
  * pipeline: drop exact re-deliveries (at-least-once sources redeliver)
  * and content duplicates as data arrives, BEFORE they hit storage.
  *
  * Two tiers:
  *  - [[byKey]]: drop re-deliveries of the same record id within a
  *    watermark horizon. State = one entry per id seen inside the
  *    horizon (bounded; `dropDuplicatesWithinWatermark` evicts ids
  *    older than the watermark).
  *  - [[byContent]]: drop rows whose content hash was already seen —
  *    exact-dup dedup on the stream, same sha2 keying as the batch
  *    operator ([[graft.operators.Dedup.dedupByContentHash]]).
  */
object StreamDedup {

  /** Exact re-delivery dedup on a record-id column within the
    * watermark horizon.
    */
  def byKey(stream: DataFrame, idCol: String, tsCol: String,
      horizon: String = "1 hour"): DataFrame =
    stream.withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(idCol)

  /** Content dedup: key = sha2 of the content column. With a
    * watermark the state stays bounded to the horizon; without one
    * (batch input) this is exact global dedup.
    */
  def byContent(stream: DataFrame, contentCol: String, tsCol: String,
      horizon: String = "1 hour"): DataFrame = {
    val hashed = stream.withColumn("_content_hash",
      sha2(col(contentCol).cast("binary"), 256))
    val deduped =
      if (stream.isStreaming)
        hashed.withWatermark(tsCol, horizon)
          .dropDuplicatesWithinWatermark("_content_hash")
      else hashed.dropDuplicates("_content_hash")
    deduped.drop("_content_hash")
  }
}
