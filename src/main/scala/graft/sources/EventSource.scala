package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.core.Pin
import graft.store.VersionedTable

/** Message-bus streaming source seam (the reference's scaling plan
  * rides a Kinesis stream + SQS buffer, `Scaling and monitoring
  * strategies.md:5-21`; Spark's production equivalent is the Kafka
  * connector). The container has no bus, so the seam pins the bus's
  * WIRE CONTRACT instead: a streaming frame in the Kafka-connector
  * column shape, and an exactly-once hand-off into the offline store.
  *
  *   partition int, offset long, ts timestamp, key string, value string
  *
  * Offsets are monotone and gapless-or-not PER PARTITION (Kafka
  * guarantees per-partition order only — so does Kinesis per shard);
  * nothing may assume cross-partition order. Swapping in the real
  * `spark.readStream.format("kafka")` source is a column rename
  * (`timestamp`→`ts`, cast binary key/value to string) — every
  * downstream contract is already expressed against this shape.
  */
trait EventSource {
  /** The streaming frame in wire shape. */
  def stream(spark: SparkSession): DataFrame
}

object EventSource {
  /** The wire schema (see trait docs). */
  val wireSchema: StructType = StructType.fromDDL(
    "partition int, offset bigint, ts timestamp, key string, value string")

  /** File-backed impl: a drop directory of parquet files already in
    * wire shape (the SQS-buffer-to-S3 landing pattern). New files are
    * discovered per micro-batch; per-partition offset order inside the
    * frame is the producer's responsibility, replay safety is the
    * sink's (OffsetTrackedSink filters row-wise, so ordering only
    * affects latency, not correctness).
    */
  final class FileEventSource(dir: String) extends EventSource {
    def stream(spark: SparkSession): DataFrame =
      spark.readStream.schema(wireSchema).parquet(dir)
  }

  /** Memory-backed impl for specs: the caller appends wire tuples
    * (partition, offset, tsMicros, key, value) to the MemoryStream.
    */
  final class MemoryEventSource(
      val input: MemoryStream[(Int, Long, Long, String, String)])
      extends EventSource {
    def stream(spark: SparkSession): DataFrame =
      input.toDF().toDF("partition", "offset", "ts_us", "key", "value")
        .select(col("partition"), col("offset"),
          timestamp_micros(col("ts_us")).as("ts"), col("key"), col("value"))
  }

  /** Run the ingest loop: source → per-batch offset-fenced commit into
    * `table`. AvailableNow drains what exists and stops (specs/batch
    * backfill); pass `Trigger.ProcessingTime(..)` for a resident loop.
    * `transform` is the sink's post-fence parse (wire rows → typed
    * table rows); the offset fence stays on the wire columns.
    */
  def runIngest(source: EventSource, spark: SparkSession,
      sink: OffsetTrackedSink, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      transform: DataFrame => DataFrame = identity): StreamingQuery =
    source.stream(spark).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.commitBatch(batch, transform): Unit
      }
      .start()
}

/** Exactly-once bus→table hand-off: per-partition high-water marks
  * live INSIDE the transactional sink (encoded in `VersionedTable`
  * txn ids), and every micro-batch first drops rows at-or-below the
  * committed mark for their partition, then commits the remainder
  * together with the advanced marks — one atomic manifest publish.
  *
  * This is the "store offsets with the results" recipe from the Spark
  * Kafka integration guide, and it is strictly stronger than fencing
  * on batch ids (InferencePipeline's `txnPrefix-batchId`): batch-id
  * fencing only recognizes a replay of the SAME batch boundaries,
  * while the row-wise offset filter absorbs any re-split — a restart
  * that re-delivers offsets 0–9 as (0–6)(3–9) commits each offset
  * exactly once. At 100 TB/day the extra cost is one broadcast-sized
  * map lookup per row and an O(#partitions) groupBy per batch.
  *
  * Mark recovery folds every manifest's txn id into the per-partition
  * maxima (a batch touching only p0 advances only p0's mark).
  * Driver-side O(versions) text reads, once per sink instance —
  * vacuum retention must outlive the replay horizon, same contract as
  * txn replay fences.
  */
class OffsetTrackedSink(table: VersionedTable, streamId: String) {
  require(streamId.matches("[A-Za-z0-9._-]+"),
    s"streamId '$streamId' — use [A-Za-z0-9._-]+ (encoded into txn ids)")

  // optional ".ckpt-<topVersion>" suffix = a checkpoint re-record of
  // unchanged marks (see checkpointMarks — the suffix keeps the txn id
  // distinct from the original mark commit so the store's replay
  // dedup does not swallow the re-record)
  private val markRe = s"""${java.util.regex.Pattern.quote(streamId)}\\.offsets((?::\\d+-\\d+)+)(?:\\.ckpt-\\d+)?""".r

  private def encodeMarks(marks: Map[Int, Long]): String =
    streamId + ".offsets" + marks.toSeq.sorted
      .map { case (p, o) => s":$p-$o" }.mkString

  // Marks cache: the manifest scan runs ONCE (recovery), then marks
  // advance in-process with each commit. The single-writer assumption
  // behind the cache is VERIFIED, not trusted (round-8 verdict #3):
  // before every commit the sink compares the table's top VERSION
  // NUMBER against the one it recorded at its own last commit/scan.
  // Version numbers are monotone and never reused (vacuum keeps even
  // expired claim files for exactly this reason), so ANY foreign
  // commit — mark-bearing or not — necessarily bumps the top; on a
  // mismatch the cache is discarded and the marks re-scanned. The
  // probe is ONE directory listing, no manifest reads (an earlier
  // shape re-parsed the newest manifest every batch — per-batch cost
  // growing with snapshot size, the very pattern the cache exists to
  // avoid). So a crashed-driver restart race (two accidentally-live
  // sinks on one streamId) cannot double-commit rows on a stale
  // cache. Without the cache every micro-batch re-reads every
  // manifest: O(versions) per batch, quadratic over a long-running
  // stream's life.
  //
  // Residual window, stated honestly: the probe runs at batch START;
  // two sinks whose probe→publish intervals fully overlap (both
  // actively committing the SAME offsets at the SAME moment) can
  // still each pass the fence. PREVENTING that needs a
  // compare-and-swap at publish (epoch fencing, what Kafka's
  // transactional producer does with its epoch bump) — out of scope
  // for a filesystem manifest store. But it is DETECTED: after every
  // publish, [[commitBatch]] scans the (empty in the common case)
  // version window between its fence snapshot and its own manifest
  // for a foreign same-stream commit, folds any foreign marks into
  // the cache (without this, setting lastSeenVersion to our own
  // higher version would hide the interleaved foreign marks from
  // every future probe — duplicates FOREVER, not just in the race),
  // and raises a loud dual-writer alarm when the foreign frontier
  // overlaps the range this batch wrote. So the overlap window
  // yields a detected, repair-forward failure instead of silent
  // duplication, and the fence covers the failure that actually
  // occurs in practice (a stale survivor resuming AFTER the new
  // writer's commits).
  private var cachedMarks: Option[Map[Int, Long]] = None
  // the table's top version as of this instance's last scan/commit
  // (None = table empty then) — the dual-writer fence invalidates the
  // cache when the actual top has moved past it
  private var lastSeenVersion: Option[Long] = None

  /** Re-scan every manifest for this stream's marks; callers hold the
    * monitor. Also records the top version for the fence.
    */
  private def rescanMarks(): Map[Int, Long] = {
    lastSeenVersion = table.currentVersion
    val scanned = table.committedTxnIds.flatMap {
      case markRe(pairs) => decodePairs(pairs)
      case _             => Nil
    }.groupMapReduce(_._1)(_._2)(math.max(_, _))
    cachedMarks = Some(scanned)
    scanned
  }

  /** Per-partition committed high-water marks (max over every manifest
    * this stream has written). First call scans the manifests; later
    * calls serve the in-process cache maintained by [[commitBatch]].
    */
  def committedMarks(): Map[Int, Long] = synchronized {
    cachedMarks.getOrElse(rescanMarks())
  }

  /** The dual-writer fence: trust the cache only if the table's top
    * version is still the one this instance recorded; otherwise
    * re-scan. One directory LIST, zero manifest reads. Callers hold
    * the monitor.
    */
  private def fencedMarks(): Map[Int, Long] = {
    val cached = cachedMarks.getOrElse(rescanMarks())
    if (table.currentVersion == lastSeenVersion) cached else rescanMarks()
  }

  /** Test seam: runs between the fence probe and the data write —
    * the residual interleave window. Production: no-op.
    */
  protected def afterFence(): Unit = ()

  /** Decode one mark txn body (":p-o:p-o…") to per-partition marks. */
  private def decodePairs(pairs: String): Map[Int, Long] =
    pairs.split(":").iterator.filter(_.nonEmpty).map { pair =>
      val Array(p, o) = pair.split("-", 2)
      p.toInt -> o.toLong
    }.toMap

  /** Durably re-record the current marks in a FRESH manifest (an
    * empty-body commit under the table's own schema, txn id = the
    * marks plus a `.ckpt-<topVersion>` disambiguator). Mark recovery scans
    * committed manifests, and [[VersionedTable.vacuum]] forgets
    * dropped manifests' txn ids — so without checkpoints, vacuum
    * retention has to cover the WHOLE stream history or old-offset
    * replays stop being fenced. After a checkpoint, retention only
    * needs to reach back to the newest checkpoint (the vacuum-grace
    * contract every production offset store states). No-op on a
    * markless stream; returns the checkpoint's version otherwise.
    */
  def checkpointMarks(): Option[Long] = {
    val marks = synchronized(fencedMarks())
    if (marks.isEmpty) None
    else {
      val txn = encodeMarks(marks) + ".ckpt-" + table.currentVersion.getOrElse(0L)
      val v = table.commit(table.read().limit(0), txnId = Some(txn))
      // checkpoints are rare: pay one full re-scan instead of carrying
      // the interleave-window reasoning here too
      synchronized(rescanMarks()): Unit
      Some(v)
    }
  }

  /** Commit one micro-batch of wire-shaped rows. Returns the published
    * version, or None when every row was already committed (a fully
    * replayed batch — including the crash-between-commit-and-checkpoint
    * window).
    *
    * `transform` runs AFTER the offset fence and before the commit, so
    * the table can hold parsed/projected rows (e.g. wire `value` JSON →
    * typed purchase columns) while replay fencing still keys on the
    * bus's own (partition, offset) — the fence never depends on what
    * the parse keeps or drops. Default: store the wire rows as-is.
    */
  def commitBatch(batch: DataFrame,
      transform: DataFrame => DataFrame = identity): Option[Long] = {
    val (marks, fenceV) = synchronized {
      (fencedMarks(), lastSeenVersion.getOrElse(-1L))
    }
    afterFence()
    val live0 =
      if (marks.isEmpty) batch
      else {
        // literal map lookup (codegen'd, no UDF): offset must exceed
        // the committed mark for the row's partition
        val markMap = map(marks.toSeq.flatMap { case (p, o) =>
          Seq(lit(p), lit(o)) }: _*)
        batch.filter(col("offset") >
          coalesce(element_at(markMap, col("partition")), lit(-1L)))
      }
    // snapshot-pin the fenced batch: the frontier collect and the data
    // write both consume it — without the lineage cut each would
    // re-read every wire file of the batch (and re-run the caller's
    // transform side of the plan), doubling source I/O per micro-batch
    val live = Pin.snapshot(live0)
    // O(#partitions) rows to the driver — the batch's own frontier.
    // Null or negative identifiers cannot round-trip the mark codec
    // (and a null offset would be silently fenced as a replay); no
    // real bus emits either — fail the batch loudly instead.
    val advanced = live.groupBy(col("partition"))
      .agg(max(col("offset")).as("hi")).collect()
      .map { r =>
        require(!r.isNullAt(0) && !r.isNullAt(1),
          "bus rows carry null partition/offset")
        r.getInt(0) -> r.getLong(1)
      }.toMap
    require(advanced.forall { case (p, o) => p >= 0 && o >= 0 },
      s"bus rows carry negative partition/offset: ${advanced.take(4)}")
    if (advanced.isEmpty) None
    else {
      val merged = (marks.keySet ++ advanced.keySet).map { p =>
        p -> math.max(marks.getOrElse(p, -1L), advanced.getOrElse(p, -1L))
      }.toMap
      val ourTxn = encodeMarks(merged)
      val v = table.commit(transform(live), txnId = Some(ourTxn))
      // Post-publish interleave probe. If a FOREIGN same-stream commit
      // landed inside our fence→publish window (the residual overlap
      // window in the class docs), versions in (fenceV, v] now hold
      // its marks — and naively setting lastSeenVersion = v below
      // would hide them from every future fence probe (the top is
      // ours, the cache passes, the foreign marks stay invisible
      // FOREVER — duplicates well beyond the race itself). So: fold
      // any foreign marks in the window into the cache, and if the
      // foreign frontier overlaps the range this batch just wrote,
      // raise the dual-writer alarm loudly instead of leaving silent
      // duplicates in the table. The common case (no interleave) scans
      // an EMPTY version range — zero manifest reads.
      val windowTxns = table.txnIdsBetween(fenceV, v + 1)
      val markTxns = windowTxns.collect { case m @ markRe(_) => m }
      // exactly one of these is our own publish; every other is foreign
      // (string equality would mis-drop a foreign commit that wrote
      // the IDENTICAL marks — the clearest duplicate of all — so drop
      // one instance, not all)
      val i = markTxns.indexOf(ourTxn)
      require(i >= 0, s"$streamId: own commit's marks not found in " +
        s"versions (${fenceV}, $v] — store audit moved it unexpectedly")
      val foreign = markTxns.patch(i, Nil, 1)
        .collect { case markRe(pairs) => decodePairs(pairs) }
      val foreignMarks =
        if (foreign.isEmpty) Map.empty[Int, Long]
        else foreign.flatten.groupMapReduce(_._1)(_._2)(math.max(_, _))
      val repaired = (merged.keySet ++ foreignMarks.keySet).map { p =>
        p -> math.max(merged.getOrElse(p, -1L), foreignMarks.getOrElse(p, -1L))
      }.toMap
      synchronized { // commit landed: advance cache + fence watermark
        cachedMarks = Some(repaired)
        // v is the audited version our commit produced; if a heal or a
        // foreign writer lands above it, the next fence probe simply
        // triggers one (cheap, correct) re-scan
        lastSeenVersion = Some(v)
      }
      // overlap = a foreign frontier above our fence base on a
      // partition we also wrote: both writers committed some of the
      // same offsets. The cache above is already repaired (a catching
      // caller keeps exactly-once going FORWARD); the alarm makes the
      // duplicated history loud instead of silent.
      val overlapped = advanced.keys.filter { p =>
        foreignMarks.getOrElse(p, -1L) > marks.getOrElse(p, -1L)
      }
      if (overlapped.nonEmpty)
        throw new IllegalStateException(
          s"$streamId: dual-writer overlap — a concurrent sink committed " +
            s"offsets above the fence base on partition(s) " +
            s"${overlapped.mkString(",")} inside this batch's " +
            s"fence→publish window; duplicated rows are in versions " +
            s"(${fenceV}, $v]. Deduplicate by (partition, offset) and " +
            s"ensure a single live sink per streamId.")
      Some(v)
    }
  }
}
