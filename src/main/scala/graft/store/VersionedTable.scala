package graft.store

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal ACID snapshot layer over parquet — the Delta/Iceberg-shaped
  * table format the offline store's approach commits to, self-contained
  * (no extra deps). Replaces "a directory of parquet files IS the
  * table" with "a MANIFEST of files is the table":
  *
  *  - every commit writes its data files to a fresh, never-reused
  *    directory `data/c_<uuid>` (write once, no in-place mutation);
  *  - a version's manifest `_manifests/v_<n>.manifest` lists every
  *    live commit directory, carrying forward the previous version's
  *    entries (append) or starting over (replace/compaction);
  *  - readers resolve the table to the HIGHEST fully-published
  *    manifest and plan their scan from its file list alone — an
  *    in-flight writer is invisible until its manifest publishes, so
  *    reads are snapshot-isolated for free, and `readAt(n)` is time
  *    travel (old data dirs are never deleted by appends);
  *  - writers claim version n+1 by atomic exclusive create of a
  *    `.claim` marker, then publish the manifest via temp-write +
  *    rename — two phases so readers can never observe a
  *    half-written manifest. A loser of the claim race rebases on the
  *    new current manifest and retries; a writer that crashes between
  *    claim and publish wastes one version number (the claim is never
  *    reused) and nothing else.
  *
  * Scan planning: each manifest entry carries min/max bounds of an
  * optional stats column (the store uses `event_date`), so a
  * date-bounded read prunes whole commit directories BEFORE touching
  * the filesystem — the Iceberg manifest-pruning idea at commit
  * granularity. Within surviving files, the pushed-down predicate
  * still prunes parquet row groups by footer min/max. At 100 TB the
  * knobs are the same as any table format's: periodic `replace`
  * compaction bounds manifest length and file counts; manifests
  * themselves are O(commits) tiny text files read only on the driver.
  *
  * Idempotent replay: a commit may carry an application transaction
  * id; re-committing an id that any manifest already records is a
  * no-op returning the committed version — at-least-once ingest
  * pipelines (the store's streaming path) can replay a batch safely.
  *
  * Single-JVM caveat: exclusive-create is atomic on HDFS and
  * best-effort on local FS / object stores without conditional puts —
  * same caveat every manifest-pointer design documents.
  */
class VersionedTable(spark: SparkSession, root: String,
    statsCol: Option[String] = None) {

  private val manifestsDir = s"$root/_manifests"
  private val manifestRe = "v_(\\d+)\\.manifest".r
  private val claimRe = "v_(\\d+)\\.claim".r

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** One live commit directory with optional stats-column bounds. */
  final case class Entry(dir: String, minStat: Option[String],
      maxStat: Option[String])

  // ---- manifest encoding (minimal JSON lines, no library) -----------

  private def enc(e: Entry): String = {
    def q(s: String) = "\"" + s + "\""
    val stats = (e.minStat, e.maxStat) match {
      case (Some(lo), Some(hi)) => s""","min":${q(lo)},"max":${q(hi)}"""
      case _ => ""
    }
    s"""{"dir":${q(e.dir)}$stats}"""
  }

  private val entryRe =
    """\{"dir":"([^"]+)"(?:,"min":"([^"]*)","max":"([^"]*)")?\}""".r
  private val headerRe =
    """\{"version":(\d+),"txn":"([^"]*)"\}""".r

  private def readManifest(n: Long): (Option[String], Seq[Entry]) = {
    val in = fs.open(new Path(manifestsDir, s"v_$n.manifest"))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val txn = lines.headOption.collect {
      case headerRe(_, t) if t.nonEmpty => t
    }
    val entries = lines.tail.map {
      case entryRe(dir, lo, hi) =>
        Entry(dir, Option(lo), Option(hi))
      case bad =>
        throw new IllegalStateException(
          s"$root v_$n.manifest: unparseable entry '$bad'")
    }
    (txn, entries)
  }

  private def listNumbers(re: scala.util.matching.Regex): Seq[Long] = {
    val dir = new Path(manifestsDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case re(n) => Some(n.toLong)
        case _     => None
      }
    }
  }

  /** Committed (readable) versions, ascending. */
  def versions: Seq[Long] = listNumbers(manifestRe).sorted

  def currentVersion: Option[Long] = versions.lastOption

  /** True iff some committed manifest records `txnId`. Scans manifest
    * headers newest-first (replays are usually of recent batches);
    * O(versions) tiny driver-side reads — a production table format
    * keeps a txn index, a minimal one documents the scan.
    */
  def txnCommitted(txnId: String): Boolean =
    versions.reverse.exists(n => readManifest(n)._1.contains(txnId))

  // ---- reads --------------------------------------------------------

  private def readEntries(entries: Seq[Entry]): DataFrame = {
    require(entries.nonEmpty, s"$root: empty snapshot has no schema")
    spark.read.parquet(entries.map(e => s"$root/${e.dir}"): _*)
  }

  /** Snapshot read of the given version — the file list is frozen in
    * the manifest, so the frame is immune to later commits.
    */
  def readAt(version: Long): DataFrame = readEntries(readManifest(version)._2)

  /** Snapshot read of the current version. */
  def read(): DataFrame = readAt(currentVersion.getOrElse(
    throw new IllegalStateException(s"$root: no committed version")))

  /** Date-bounded snapshot read with manifest-level pruning: commits
    * whose [min,max] stats band misses [lo,hi] are dropped from the
    * scan BEFORE any filesystem touch (assert via `df.inputFiles`).
    * Commits without stats are conservatively kept. The returned
    * frame still carries the row-level filter, which also reaches the
    * parquet footers of surviving files.
    */
  def readRange(lo: String, hi: String): DataFrame = {
    val c = statsCol.getOrElse(throw new IllegalStateException(
      s"$root: readRange needs a statsCol-configured table"))
    val entries = readManifest(currentVersion.getOrElse(
      throw new IllegalStateException(s"$root: no committed version")))._2
    val kept = entries.filter { e =>
      (e.minStat, e.maxStat) match {
        case (Some(mn), Some(mx)) => mn <= hi && mx >= lo
        case _ => true
      }
    }
    if (kept.isEmpty)
      // all commits pruned: preserve the schema from an empty-filter
      // read of one commit (never happens with a sane query range on
      // a non-empty table, but the contract should not throw)
      readEntries(entries.take(1)).filter(lit(false))
    else readEntries(kept).filter(col(c) >= lo && col(c) <= hi)
  }

  /** CDC between two committed versions, rows tagged `change_type`
    * (`insert` / `delete`). Fast path: when the target's manifest
    * carries every source entry forward (the append-only chain —
    * the common case), the changes are EXACTLY the added commit
    * directories, so the diff reads O(delta) files and compares no
    * rows at all — the manifest IS the change log. After a `replace`
    * (compaction/rewrite) breaks the chain, falls back to
    * [[rowDiff]]'s multiset row comparison. Downstream incremental
    * consumers (online-view refresh, index maintenance, replication)
    * poll this instead of rescanning the table.
    */
  def changesSince(fromVersion: Long,
      toVersion: Option[Long] = None): DataFrame = {
    val to = toVersion.orElse(currentVersion).getOrElse(
      throw new IllegalStateException(s"$root: no committed version"))
    require(fromVersion <= to, s"changesSince($fromVersion > $to)")
    val fromDirs = readManifest(fromVersion)._2.map(_.dir).toSet
    val toEntries = readManifest(to)._2
    if (fromDirs.subsetOf(toEntries.map(_.dir).toSet)) {
      val added = toEntries.filterNot(e => fromDirs.contains(e.dir))
      if (added.isEmpty)
        readEntries(toEntries.take(1)).filter(lit(false))
          .withColumn("change_type", lit("insert"))
      else readEntries(added).withColumn("change_type", lit("insert"))
    } else rowDiff(fromVersion, to)
  }

  /** Multiset row diff between two snapshots: rows only in `to` tag
    * `insert`, rows only in `from` tag `delete` (an update appears as
    * its delete/insert pair — key-level pairing is the consumer's
    * join). Two `exceptAll` hash aggregations over the two snapshots —
    * the O(table) fallback the manifest fast path avoids.
    */
  def rowDiff(fromVersion: Long, toVersion: Long): DataFrame = {
    val from = readAt(fromVersion)
    val to = readAt(toVersion)
    to.exceptAll(from).withColumn("change_type", lit("insert"))
      .unionByName(from.exceptAll(to).withColumn("change_type", lit("delete")))
  }

  // ---- writes -------------------------------------------------------

  private def statsOf(dir: String): (Option[String], Option[String]) =
    statsCol match {
      case None => (None, None)
      case Some(c) =>
        val r = spark.read.parquet(s"$root/$dir")
          .agg(min(col(c)).cast("string"), max(col(c)).cast("string"))
          .head()
        (Option(r.getString(0)), Option(r.getString(1)))
    }

  private def header(version: Long, txnId: Option[String]): String = {
    txnId.foreach { t =>
      require(t.matches("[A-Za-z0-9._:-]+"),
        s"txnId '$t' — use [A-Za-z0-9._:-]+ (kept unescaped in manifests)")
    }
    s"""{"version":$version,"txn":"${txnId.getOrElse("")}"}"""
  }

  /** Claim-then-publish of version = max(any claim or manifest)+1;
    * returns the published version number.
    *
    * Writer concurrency contract: ONE writer at a time (the store's
    * own model — the reference ingests single-worker). The claim
    * protocol exists so that ACCIDENTAL concurrent writers collide on
    * the claim (and retry onto distinct versions) instead of
    * corrupting each other's files — the same stance as manifest
    * formats on stores without a CAS primitive, which also require
    * external writer coordination for true multi-writer appends.
    */
  private def publish(newEntries: Seq[Entry] => Seq[Entry],
      txnId: Option[String]): Long = {
    fs.mkdirs(new Path(manifestsDir))
    var attempts = 0
    while (attempts < 50) {
      attempts += 1
      val next = (listNumbers(claimRe) ++ listNumbers(manifestRe))
        .foldLeft(-1L)(math.max) + 1L
      val claimed =
        try { fs.create(new Path(manifestsDir, s"v_$next.claim"),
          false).close(); true }
        catch { case _: java.io.IOException => false } // lost the race
      if (claimed) {
        // base entries are read AFTER the claim: the claim winner
        // observes every manifest published before its claim
        val entries = newEntries(
          currentVersion.map(readManifest(_)._2).getOrElse(Seq.empty))
        val body = (header(next, txnId) +: entries.map(enc))
          .mkString("", "\n", "\n")
        val tmp = new Path(manifestsDir, s"v_$next.manifest.tmp")
        val out = fs.create(tmp, true)
        try out.write(body.getBytes("UTF-8")) finally out.close()
        if (!fs.rename(tmp, new Path(manifestsDir, s"v_$next.manifest")))
          throw new IllegalStateException(
            s"$root: publish of v_$next failed to rename its manifest")
        return next
      }
    }
    throw new IllegalStateException(
      s"$root: could not claim a version in $attempts attempts")
  }

  private def writeData(df: DataFrame): Entry = {
    val dir = s"data/c_${UUID.randomUUID().toString.take(8)}"
    df.write.mode("error").parquet(s"$root/$dir")
    val (lo, hi) = statsOf(dir)
    Entry(dir, lo, hi)
  }

  /** Append `df` as a new commit; returns the new version. With
    * `txnId`, replaying an already-committed id is a no-op returning
    * the current version (idempotent at-least-once ingest).
    */
  def commit(df: DataFrame, txnId: Option[String] = None): Long = {
    txnId.filter(txnCommitted) match {
      case Some(_) => currentVersion.get
      case None =>
        val entry = writeData(df)
        publish(prev => prev :+ entry, txnId)
    }
  }

  /** Replace the whole snapshot with `df` (compaction / rewrite): the
    * new manifest lists ONLY the new commit, but earlier versions
    * remain readable — time travel spans compactions. Old data dirs
    * are never deleted here; [[vacuum]] reclaims dirs unreferenced by
    * any retained manifest.
    */
  def replace(df: DataFrame, txnId: Option[String] = None): Long = {
    txnId.filter(txnCommitted) match {
      case Some(_) => currentVersion.get
      case None =>
        val entry = writeData(df)
        publish(_ => Seq(entry), txnId)
    }
  }

  /** Reclaim storage: keep the `retain` most recent versions, delete
    * every older manifest (and its claim marker) and every data
    * directory no retained manifest references. Returns the number of
    * data directories deleted.
    *
    * This SHRINKS the time-travel window to `retain` versions and
    * forgets dropped versions' txn ids (replay fences should outlive
    * retention by keeping `retain` ≥ the replay horizon). Run it from
    * the (single) writer only: an in-flight commit's data dir is
    * unreferenced until its manifest publishes and would be swept by
    * a concurrent vacuum. Readers pinned at a dropped version fail on
    * next execution — the same contract every table format's vacuum
    * documents.
    */
  def vacuum(retain: Int = 2): Int = {
    require(retain >= 1, "vacuum must retain at least the current version")
    val vs = versions
    val dropped = vs.dropRight(retain)
    val referenced = vs.takeRight(retain)
      .flatMap(readManifest(_)._2.map(_.dir)).toSet
    // drop old manifests first: once they're gone no reader can
    // resolve a version whose data is about to disappear
    dropped.foreach { n =>
      fs.delete(new Path(manifestsDir, s"v_$n.manifest"), false)
      fs.delete(new Path(manifestsDir, s"v_$n.claim"), false): Unit
    }
    val dataRoot = new Path(s"$root/data")
    if (!fs.exists(dataRoot)) 0
    else {
      val sweep = fs.listStatus(dataRoot).toSeq.filter(_.isDirectory)
        .filterNot(st => referenced.contains(s"data/${st.getPath.getName}"))
      sweep.foreach(st => fs.delete(st.getPath, true))
      sweep.size
    }
  }
}
