package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Spark-native feature store: the reference's dual online/offline
  * storage model (`core/feature_store_manager.py`) re-expressed without
  * managed services.
  *
  *  - **Offline store** = append-only parquet history. Every ingest and
  *    every upsert appends (SageMaker semantics: `put_record` lands in
  *    BOTH stores, `feature_store_manager.py:233-236` + offline
  *    replication). Partitioned by a derived `event_date` column so a
  *    100 TB history prunes to the queried date range (dynamic partition
  *    pruning reaches the scan).
  *  - **Online store** = latest-record-per-key VIEW over the history
  *    (window dedup, reference `feature_store_manager.py:101,165-168`),
  *    materialized on demand by [[FeatureStore#compactOnline]] so point
  *    lookups don't re-window the full history.
  *
  * Keys and event time are declared once per store (the reference's
  * record-identifier / event-time feature-group config,
  * `feature_store_manager.py:96-101`); a monotonically-increasing
  * `_seq` column breaks event-time ties deterministically (the
  * reference is silently nondeterministic here — SURVEY.md §7 risks).
  */
final case class FeatureStoreConf(
    path: String,
    keyCol: String,
    eventTimeCol: String)

class FeatureStore(spark: SparkSession, conf: FeatureStoreConf) {
  import spark.implicits._

  private val offlineDir = s"${conf.path}/offline"
  private val onlineDir  = s"${conf.path}/online"
  private val seqCol     = "_seq"

  private def key = col(conf.keyCol)
  private def ts  = col(conf.eventTimeCol)

  /** Next ingest sequence number (single writer — the reference
    * ingests with `max_workers=1`, `feature_store_manager.py:119`).
    * Read from storage once, then counted in memory: a full history
    * scan per micro-batch would dominate streaming upsert cost.
    */
  private var seqCounter: Long = -1L
  private def nextSeq(): Long = {
    if (seqCounter < 0L)
      seqCounter =
        if (!exists) 0L
        else offline().agg(max(col(seqCol))).head().getLong(0) + 1L
    val s = seqCounter
    seqCounter += 1L
    s
  }

  def exists: Boolean =
    new java.io.File(s"$offlineDir/_SUCCESS").exists() ||
      new java.io.File(offlineDir).exists()

  /** S5 — batch ingest: append the frame to the offline history and
    * merge it into the online compaction. One parquet append, no
    * per-row calls (vs the reference's row-at-a-time `PutRecord`
    * loop). The online merge is incremental — window-dedup of
    * (current online ∪ new batch), O(#keys + batch) — NOT a recompact
    * of the full history, which would make upsert cost grow with
    * history size (the thing that kills streaming at 100 TB).
    */
  def ingest(df: DataFrame): Unit = {
    val seq = nextSeq()
    val stamped = df.withColumn(seqCol, lit(seq))
    stamped.withColumn("event_date", to_date(ts))
      .write.mode("append").partitionBy("event_date").parquet(offlineDir)
    mergeOnline(stamped)
  }

  /** S6 — upsert semantics are identical to ingest at the storage
    * layer (append + re-compact); the matched/not-matched branching of
    * MERGE happens inside [[compactOnline]]'s window dedup: the newest
    * `(event_time, _seq)` record per key wins, whether it updated an
    * existing key or introduced a new one.
    */
  def putRecords(df: DataFrame): Unit = ingest(df)

  /** S3 — full append-only history (offline store scan). */
  def offline(): DataFrame = spark.read.parquet(offlineDir)

  /** Window-dedup to the newest `(event_time, _seq)` record per key.
    * Input must carry the `_seq` column.
    */
  private def dedupLatest(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts.desc, col(seqCol).desc)
    df.withColumn("_rn", row_number().over(w))
      .filter($"_rn" === 1)
      .drop("_rn")
  }

  /** W2 — latest record per key, computed from the full history. The
    * window shuffles once on the key; at scale this is the (rare) full
    * compaction pass — steady-state upserts use [[mergeOnline]].
    */
  def latestView(): DataFrame =
    dedupLatest(offline()).drop(seqCol, "event_date")

  /** Incremental MERGE: newest-wins dedup of (current online ∪ batch).
    * The matched/not-matched branches of a MERGE statement are exactly
    * the two sides of this dedup. Cost is O(#keys + batch), constant
    * in history size.
    */
  private def mergeOnline(stamped: DataFrame): Unit = {
    val base = stamped.drop("event_date")
    val merged =
      if (new java.io.File(onlineDir).exists())
        dedupLatest(spark.read.parquet(onlineDir).unionByName(base))
      else dedupLatest(base)
    writeOnline(merged)
  }

  private def writeOnline(df: DataFrame): Unit = {
    val tmp = s"$onlineDir.tmp"
    df.write.mode("overwrite").parquet(tmp)
    val dir = new java.io.File(onlineDir)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(dir)
    }
    new java.io.File(tmp).renameTo(dir): Unit
  }

  /** Full recompaction of the online table from history. Idempotent:
    * compact ∘ compact = compact.
    */
  def compactOnline(): Unit =
    writeOnline(dedupLatest(offline()).drop("event_date"))

  /** Compacted online table (falls back to computing the view). */
  def online(): DataFrame =
    if (new java.io.File(onlineDir).exists())
      spark.read.parquet(onlineDir).drop(seqCol)
    else latestView()

  /** S4 — online point lookup (`get_record`,
    * `feature_store_manager.py:165-168`). Equality predicate pushes
    * into the compacted parquet scan. Serving at scale keys the
    * compacted table by hash-partition; here one pruned scan suffices.
    */
  def getRecord(id: Any): Option[org.apache.spark.sql.Row] =
    online().filter(key === lit(id)).collect().headOption

  /** P2 — existence probe (`customer_features_exist`,
    * `feature_store_manager.py:155-172`).
    */
  def recordExists(id: Any): Boolean =
    !online().filter(key === lit(id)).isEmpty
}

object FeatureStore {
  def apply(spark: SparkSession, path: String, keyCol: String,
      eventTimeCol: String): FeatureStore =
    new FeatureStore(spark, FeatureStoreConf(path, keyCol, eventTimeCol))
}
