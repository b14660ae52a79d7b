package graft.store

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, NumericType, StructType}

/** Minimal ACID snapshot layer over parquet — the Delta/Iceberg-shaped
  * table format the offline store's approach commits to, self-contained
  * (no extra deps). Replaces "a directory of parquet files IS the
  * table" with "a MANIFEST of files is the table":
  *
  *  - every commit writes its data files to a fresh, never-reused
  *    directory `data/c_<uuid>` (write once, no in-place mutation);
  *  - a version's manifest `_manifests/v_<n>.manifest` lists every
  *    live data FILE (with its commit directory and per-file column
  *    stats), carrying forward the previous version's files (append)
  *    or starting over (replace/compaction);
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
  *    reused) and nothing else. After publishing an APPEND, the
  *    writer audits for the lost-append interleave (see below) and
  *    heals or fails loudly instead of silently dropping a commit.
  *
  * Schema evolution: each manifest records the snapshot's schema
  * (merged across commits — add-column appends widen it; a type
  * change fails loudly). Reads plan with the manifest schema, so
  * files written before a column existed backfill it with NULL —
  * the Delta/Iceberg add-column semantics — and `readAt` of a
  * pre-evolution version sees that version's own (narrower) schema.
  *
  * Scan planning: the manifest carries per-FILE min/max stats for the
  * configured `statsCols`, so a range read prunes individual files
  * BEFORE touching the filesystem (the Iceberg manifest-pruning idea
  * at file granularity — assert via `df.inputFiles`). Numeric stats
  * compare numerically, others lexicographically. Within surviving
  * files, the pushed-down predicate still prunes parquet row groups
  * by footer min/max. At 100 TB the knobs are the same as any table
  * format's: periodic `replace` compaction bounds manifest length and
  * file counts; manifests themselves are O(files) tiny text lines
  * read only on the driver.
  *
  * Idempotent replay: a commit may carry an application transaction
  * id; re-committing an id that any manifest already records is a
  * no-op returning the committed version — at-least-once ingest
  * pipelines (the store's streaming path) can replay a batch safely.
  *
  * Lost-append audit: with base entries read after the claim, two
  * ACCIDENTAL writers can interleave as claim(A,n) → claim(B,n+1) →
  * baseRead(B: n−1) → publish(either order) — B's manifest omits A's
  * commit, so A's append would silently vanish from the current
  * snapshot (readable only via readAt(n)). Both writers therefore
  * audit after publishing an append: a writer whose commit is missing
  * from the now-current snapshot re-appends its files on top; a
  * writer whose immediate predecessor's files it failed to carry
  * forward re-appends the missing files. Either way the final
  * current snapshot contains both appends (spec: lost-append heal).
  * The audit bounds its repair rounds and fails loudly past them; a
  * replace racing an append is outside the audit's scope (it cannot
  * be healed without knowing intent) and stays on the documented
  * single-writer contract.
  *
  * Single-JVM caveat: exclusive-create is atomic on HDFS and
  * best-effort on local FS / object stores without conditional puts —
  * same caveat every manifest-pointer design documents.
  */
class VersionedTable(spark: SparkSession, root: String,
    statsCols: Seq[String] = Nil) {

  private val manifestsDir = s"$root/_manifests"
  private val manifestRe = "v_(\\d+)\\.manifest".r
  private val claimRe = "v_(\\d+)\\.claim".r

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** One live data file: root-relative path, its commit directory,
    * and per-statsCol (min, max) string bounds (absent for a column
    * that is all-NULL in the file or missing from its commit).
    */
  final case class FileEntry(path: String, commit: String,
      stats: Map[String, (String, String)])

  /** One parsed manifest. `op` is what produced the version;
    * `schema` is the snapshot's reconciled read schema. `audit` is
    * the op's compliance-reportable evidence (delete-class commits:
    * key COUNTS, cutoffs, file/row removal totals — never the keys
    * themselves, which would re-retain forgotten identifiers inside
    * the manifest); empty for ops predating the field or without one.
    */
  final case class Manifest(txn: Option[String], op: String,
      schema: Option[StructType], files: Seq[FileEntry],
      audit: Map[String, String] = Map.empty)

  // ---- manifest encoding (minimal JSON lines, no library) -----------

  /** JSON-string escape for the characters the line regexes and the
    * quote delimiters care about — stats values and schema JSON are
    * arbitrary strings (the unescaped v1 encoding corrupted the whole
    * version on a quote/backslash/newline in a stats value).
    */
  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case c    => b.append(c)
    }
    b.toString
  }

  private def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => b.append('"')
          case '\\' => b.append('\\')
          case 'n'  => b.append('\n')
          case 'r'  => b.append('\r')
          case o    => b.append('\\').append(o)
        }
        i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Component escape inside the stats blob: the blob's own
    * separators (`;` between columns, `=` and `|` inside one) are
    * %-encoded in values, so any string-typed stat round-trips.
    */
  private def encComp(s: String): String = s.flatMap {
    case '%' => "%25"
    case ';' => "%3B"
    case '|' => "%7C"
    case '=' => "%3D"
    case c   => c.toString
  }

  private def decComp(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 >= s.length ||
            Character.digit(s.charAt(i + 1), 16) < 0 ||
            Character.digit(s.charAt(i + 2), 16) < 0)
          throw new IllegalStateException(
            s"corrupt %-escape in stats component '$s'")
        b.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private def encStats(stats: Map[String, (String, String)]): String =
    stats.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
      s"${encComp(c)}=${encComp(mn)}|${encComp(mx)}"
    }.mkString(";")

  private def decStats(blob: String): Map[String, (String, String)] =
    if (blob.isEmpty) Map.empty
    else blob.split(";", -1).iterator.map { part =>
      val eq = part.indexOf('=')
      val bar = part.indexOf('|', eq + 1)
      if (eq < 0 || bar < 0)
        throw new IllegalStateException(
          s"corrupt stats segment '$part' (missing '=' or '|')")
      decComp(part.substring(0, eq)) ->
        (decComp(part.substring(eq + 1, bar)), decComp(part.substring(bar + 1)))
    }.toMap

  private def encFile(e: FileEntry): String = {
    val stats =
      if (e.stats.isEmpty) ""
      else s""","stats":"${esc(encStats(e.stats))}""""
    s"""{"file":"${esc(e.path)}","commit":"${esc(e.commit)}"$stats}"""
  }

  private val fileRe =
    ("""\{"file":"((?:[^"\\]|\\.)*)","commit":"((?:[^"\\]|\\.)*)"""" +
      """(?:,"stats":"((?:[^"\\]|\\.)*)")?\}""").r
  private val headerRe =
    ("""\{"version":(\d+),"txn":"((?:[^"\\]|\\.)*)","op":"(append|replace|delete|update|compact|expire)"""" +
      """(?:,"schema":"((?:[^"\\]|\\.)*)")?(?:,"audit":"((?:[^"\\]|\\.)*)")?\}""").r
  // pre-v2 (op-less header) manifests are NOT readable: their entry
  // lines ({"dir":...,"min":...,"max":...}) don't parse either, and
  // guessing the op would poison auditAppend/changesSince (a v1
  // `replace` misread as `append` re-appends compacted-away files).
  // A v1 table requires explicit migration: re-commit its data
  // through this class. The regex is kept only to name the failure.
  private val headerV1Re =
    """\{"version":(\d+),"txn":"((?:[^"\\]|\\.)*)"\}""".r

  private def header(version: Long, txnId: Option[String], op: String,
      schema: StructType, audit: Map[String, String]): String = {
    txnId.foreach { t =>
      require(t.matches("[A-Za-z0-9._:-]+"),
        s"txnId '$t' — use [A-Za-z0-9._:-]+ (kept unescaped in manifests)")
    }
    val auditField =
      if (audit.isEmpty) ""
      else {
        val blob = audit.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${encComp(k)}=${encComp(v)}" }
          .mkString(";")
        s""","audit":"${esc(blob)}""""
      }
    s"""{"version":$version,"txn":"${txnId.getOrElse("")}","op":"$op"""" +
      s""","schema":"${esc(schema.json)}"$auditField}"""
  }

  private[store] def readManifest(n: Long): Manifest = {
    val in = fs.open(new Path(manifestsDir, s"v_$n.manifest"))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val (txn, op, schema, audit) = lines.headOption match {
      case Some(headerRe(_, t, o, s, a)) =>
        val parsed = Option(s).map { j =>
          // rewrap like decStats errors below: all manifest corruption
          // must identify the file it was found in
          try DataType.fromJson(unesc(j)).asInstanceOf[StructType]
          catch { case e: Exception => throw new IllegalStateException(
            s"$root v_$n.manifest: corrupt schema JSON (${e.getMessage})")
          }
        }
        val auditMap = Option(a).map(unesc).filter(_.nonEmpty)
          .map { blob =>
            try blob.split(";", -1).iterator.map { part =>
              val eq = part.indexOf('=')
              if (eq < 0) throw new IllegalStateException(
                s"corrupt audit segment '$part' (missing '=')")
              decComp(part.substring(0, eq)) ->
                decComp(part.substring(eq + 1))
            }.toMap
            catch { case e: IllegalStateException =>
              throw new IllegalStateException(
                s"$root v_$n.manifest: ${e.getMessage}")
            }
          }.getOrElse(Map.empty[String, String])
        (Option(t).map(unesc).filter(_.nonEmpty), o, parsed, auditMap)
      case Some(h @ headerV1Re(_, _)) => throw new IllegalStateException(
        s"$root v_$n.manifest: pre-v2 manifest (op-less header '$h') — " +
          "v1 tables require migration (re-commit their data); the v1 op " +
          "cannot be inferred safely and v1 entry lines do not parse")
      case other => throw new IllegalStateException(
        s"$root v_$n.manifest: unparseable header '${other.getOrElse("")}'")
    }
    val files = lines.tail.map {
      case fileRe(p, c, st) =>
        val stats =
          try Option(st).map(b => decStats(unesc(b))).getOrElse(Map.empty)
          catch { case e: IllegalStateException =>
            throw new IllegalStateException(
              s"$root v_$n.manifest: ${e.getMessage}")
          }
        FileEntry(unesc(p), unesc(c), stats)
      case bad =>
        throw new IllegalStateException(
          s"$root v_$n.manifest: unparseable entry '$bad'")
    }
    Manifest(txn, op, schema, files, audit)
  }

  /** Compliance-reportable audit evidence recorded by the op that
    * published `version` — removal counts, cutoffs, key counts
    * (never the keys themselves). Empty for ops without one or for
    * manifests predating the field.
    */
  def auditOf(version: Long): Map[String, String] =
    readManifest(version).audit

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

  /** True iff some committed manifest records `txnId`. Incremental:
    * this instance caches every txn id it has seen and reads only
    * manifests NEWER than its high-water mark, so a long-lived
    * per-batch caller (the bus sink commits every micro-batch) pays
    * O(new versions) amortized, not O(all versions) per call — after
    * 10k micro-batches the old full scan opened 10k manifests per
    * commit. Vacuum dropping old versions is safe here: a dropped
    * manifest's txn stays cached, and committed-ness never un-happens.
    * Cross-instance writers are still observed (the version LIST runs
    * every call; only the manifest READS are memoized).
    */
  def txnCommitted(txnId: String): Boolean = synchronized {
    versions.filter(_ > txnScannedUpTo).foreach { n =>
      readManifest(n).txn.foreach(txnSeen += _)
      txnScannedUpTo = math.max(txnScannedUpTo, n)
    }
    txnSeen.contains(txnId)
  }
  private var txnScannedUpTo: Long = -1L
  private val txnSeen = scala.collection.mutable.HashSet.empty[String]

  /** All committed txn ids, ascending version order. Consumers that
    * encode durable state in their txn ids (the bus sink's offset
    * high-water marks, `graft.sources.OffsetTrackedSink`) recover it
    * from here; same O(versions) driver-side scan as [[txnCommitted]].
    */
  def committedTxnIds: Seq[String] = versions.flatMap(n => readManifest(n).txn)

  /** Txn ids of manifests with `fromExcl < version < toExcl` only —
    * the post-publish interleave probe ([[graft.sources
    * .OffsetTrackedSink]] scans exactly the window between its fence
    * snapshot and its own publish for a foreign writer's marks).
    * Empty range → zero manifest reads, so the common no-interleave
    * case costs nothing.
    */
  def txnIdsBetween(fromExcl: Long, toExcl: Long): Seq[String] =
    versions.filter(n => n > fromExcl && n < toExcl)
      .flatMap(n => readManifest(n).txn)

  // ---- reads --------------------------------------------------------

  private def readFiles(schema: Option[StructType],
      files: Seq[FileEntry]): DataFrame = {
    if (files.isEmpty) {
      val s = schema.getOrElse(throw new IllegalStateException(
        s"$root: empty snapshot has no schema"))
      return spark.createDataFrame(
        java.util.Collections.emptyList[Row](), s)
    }
    val paths = files.map(f => s"$root/${f.path}")
    schema match {
      // the manifest schema is the reconciliation contract: files
      // written before a column existed backfill it with NULL, and a
      // column dropped from one commit's frame reads as NULL there
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None    => spark.read.parquet(paths: _*)
    }
  }

  /** Snapshot read of the given version — the file list AND schema
    * are frozen in the manifest, so the frame is immune to later
    * commits and later schema evolution.
    */
  def readAt(version: Long): DataFrame = {
    val m = readManifest(version)
    readFiles(m.schema, m.files)
  }

  /** Snapshot read of the current version. */
  def read(): DataFrame = readAt(currentVersion.getOrElse(
    throw new IllegalStateException(s"$root: no committed version")))

  /** Type-aware stats overlap: numeric columns compare as numbers
    * (their cast-to-string forms don't order lexicographically),
    * everything else as strings (dates/timestamps in ISO form order
    * correctly). Unparseable numerics fall back to keeping the file.
    */
  private def overlaps(dt: DataType, mn: String, mx: String,
      lo: String, hi: String): Boolean = dt match {
    case _: NumericType =>
      try BigDecimal(mn) <= BigDecimal(hi) && BigDecimal(mx) >= BigDecimal(lo)
      catch { case _: NumberFormatException => true }
    case _ => mn <= hi && mx >= lo
  }

  /** Range read with FILE-level manifest pruning on `statsCol`: files
    * whose [min,max] band misses [lo,hi] are dropped from the scan
    * BEFORE any filesystem touch (assert via `df.inputFiles`). Files
    * without stats for the column are conservatively kept. The
    * returned frame still carries the row-level filter, which also
    * reaches the parquet footers of surviving files.
    */
  def readRange(statsCol: String, lo: String, hi: String): DataFrame = {
    require(statsCols.contains(statsCol),
      s"$root: readRange($statsCol) needs the column in statsCols=$statsCols")
    val m = readManifest(currentVersion.getOrElse(
      throw new IllegalStateException(s"$root: no committed version")))
    val dt = m.schema.flatMap(s =>
      s.fields.find(_.name == statsCol).map(_.dataType))
      .getOrElse(org.apache.spark.sql.types.StringType)
    val kept = m.files.filter { f =>
      f.stats.get(statsCol) match {
        case Some((mn, mx)) => overlaps(dt, mn, mx, lo, hi)
        case None           => true
      }
    }
    val base =
      if (kept.isEmpty) readFiles(m.schema, m.files).filter(lit(false))
      else readFiles(m.schema, kept)
    // row filter with TYPED bounds: comparing a numeric column against
    // a string literal coerces both to double, which loses exactness
    // past 2^53 — while the manifest pruning above (BigDecimal) stays
    // exact. Cast the bounds to the column's own type instead.
    val rowDt = base.schema.fields.find(_.name == statsCol)
      .map(_.dataType).getOrElse(org.apache.spark.sql.types.StringType)
    base.filter(col(statsCol) >= lit(lo).cast(rowDt) &&
      col(statsCol) <= lit(hi).cast(rowDt))
  }

  /** Single-stats-column convenience (the store's event_date path). */
  def readRange(lo: String, hi: String): DataFrame = {
    require(statsCols.nonEmpty, s"$root: readRange needs statsCols")
    readRange(statsCols.head, lo, hi)
  }

  /** CDC between two committed versions, rows tagged `change_type`
    * (`insert` / `delete`). Fast path: when the target's manifest
    * carries every source commit forward (the append-only chain —
    * the common case), the changes are EXACTLY the added commit
    * directories, so the diff reads O(delta) files and compares no
    * rows at all — the manifest IS the change log. After a `replace`
    * (compaction/rewrite) breaks the chain, falls back to
    * [[rowDiff]]'s multiset row comparison. Downstream incremental
    * consumers (online-view refresh, index maintenance, replication)
    * poll this instead of rescanning the table. Rows read with the
    * TARGET version's schema (evolution-safe).
    */
  def changesSince(fromVersion: Long,
      toVersion: Option[Long] = None): DataFrame = {
    val to = toVersion.orElse(currentVersion).getOrElse(
      throw new IllegalStateException(s"$root: no committed version"))
    require(fromVersion <= to, s"changesSince($fromVersion > $to)")
    // FILE-path-level subset, not commit-dir-level: [[deleteKeys]]
    // carries the UNTOUCHED files of a commit dir forward while
    // dropping its touched siblings, so a dir-set test would misread
    // a delete as a pure append and tag the rewritten survivors as
    // inserts (while losing the deletes entirely)
    val fromPaths = readManifest(fromVersion).files.map(_.path).toSet
    val toM = readManifest(to)
    if (fromPaths.subsetOf(toM.files.map(_.path).toSet)) {
      val added = toM.files.filterNot(f => fromPaths.contains(f.path))
      if (added.isEmpty)
        readFiles(toM.schema, toM.files).filter(lit(false))
          .withColumn("change_type", lit("insert"))
      else readFiles(toM.schema, added).withColumn("change_type", lit("insert"))
    } else rowDiff(fromVersion, to)
  }

  /** Multiset row diff between two snapshots: rows only in `to` tag
    * `insert`, rows only in `from` tag `delete` (an update appears as
    * its delete/insert pair — key-level pairing is the consumer's
    * join). Both sides read with the LATER version's schema so an
    * evolved column diffs as NULL→value instead of failing the union.
    *
    * FILE-pruned: a data file carried VERBATIM between the two
    * manifests contributes the identical row multiset to both sides,
    * and multiset subtraction cancels common parts exactly
    * ((F + A) ∖ (F + B) = A ∖ B for any common F) — so the diff reads
    * only each side's files NOT in the other manifest. A takedown or
    * retention sweep therefore diffs O(touched files), never
    * O(table): the CDC feed standing-index repair consumes after an
    * expire costs what the expire touched (the fallback full read
    * survives only for schema-less legacy manifests).
    */
  def rowDiff(fromVersion: Long, toVersion: Long): DataFrame = {
    val later = readManifest(math.max(fromVersion, toVersion))
    val fromM = readManifest(fromVersion)
    val toM = readManifest(toVersion)
    val (fromFiles, toFiles) =
      if (later.schema.isEmpty) (fromM.files, toM.files)
      else {
        val fromPaths = fromM.files.map(_.path).toSet
        val toPaths = toM.files.map(_.path).toSet
        (fromM.files.filterNot(f => toPaths.contains(f.path)),
          toM.files.filterNot(f => fromPaths.contains(f.path)))
      }
    val from = readFiles(later.schema, fromFiles)
    val to = readFiles(later.schema, toFiles)
    to.exceptAll(from).withColumn("change_type", lit("insert"))
      .unionByName(from.exceptAll(to).withColumn("change_type", lit("delete")))
  }

  // ---- writes -------------------------------------------------------

  private def absRootPath: String =
    fs.makeQualified(new Path(root)).toUri.getPath

  /** Inventory + per-file stats of a freshly written commit dir: the
    * file list comes from the filesystem (authoritative — zero-row
    * part files still belong to the commit), the stats from ONE
    * grouped scan keyed by `input_file_name()` (per-file min/max of
    * every configured stats column present in the commit's schema,
    * plus its NULL count under the reserved `<col>#nulls` stats key —
    * min/max ignore NULLs, so pruning decisions that must account for
    * NULL rows, like [[expireBefore]]'s whole-file drop, need the
    * count recorded separately; manifests written before this stat
    * existed simply lack the key and such decisions degrade to the
    * conservative rewrite).
    */
  /** Footer-only row count of one parquet part file — O(footer), no
    * data scan. Backs the reserved `#rows` per-file stat that lets
    * delete-class commits report ROWS REMOVED (the audit surface)
    * without re-reading any file: removed = Σ touched `#rows` −
    * Σ rewritten `#rows`, all manifest arithmetic. None when the
    * footer is unreadable — the audit then degrades to file counts.
    */
  private def footerRowCount(p: Path): Option[Long] =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(p, spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try Some(r.getRecordCount) finally r.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One-footer-read stats for a freshly written part file (r16
    * optimization): record count plus, for every wanted column that
    * is a PLAIN SIGNED INTEGER primitive (INT32/INT64, no logical
    * annotation beyond signed int — timestamps/dates/decimals render
    * differently from `cast(c as string)`, and binary stats may be
    * truncated), the exact (min, max, nulls) across row groups. The
    * integer restriction is what makes footer stats EQUAL to the
    * read-back aggregation's `cast to string` values, so the manifest
    * is byte-identical either way. Returns None when any wanted
    * column is present but not footer-exact — the caller then falls
    * back to the read-back aggregation job for the whole commit.
    */
  private def footerStats(p: Path, wanted: Seq[String])
      : Option[(Long, Map[String, (String, String)])] =
    try {
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(p, spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val schema = r.getFooter.getFileMetaData.getSchema
        val rows = r.getRecordCount
        val blocks = r.getFooter.getBlocks
        // per-column outcome, explicit (r17, ADVICE — the old form
        // used non-local `return` through two try blocks, correct only
        // because ControlThrowable is not NonFatal and broken under
        // any wrapper catching Throwable):
        //   None              — footer not exact: fail the fast path
        //   Some(None)        — column absent from the file schema or
        //                       all-NULL: no stats entries, which is
        //                       exactly what the read-back path
        //                       records (its `present` filter skips
        //                       absent columns; an all-NULL min is
        //                       NULL and records nothing)
        //   Some(Some(tuple)) — exact (min, max, nulls)
        def colExact(c: String): Option[Option[(Long, Long, Long)]] =
          if (!schema.containsField(c)) Some(None)
          else {
            val tpe = schema.getType(Seq(c): _*)
            val okType = tpe.isPrimitive && {
              val pt = tpe.asPrimitiveType()
              val name = pt.getPrimitiveTypeName
              val ann = pt.getLogicalTypeAnnotation
              (name == PrimitiveTypeName.INT64 ||
                name == PrimitiveTypeName.INT32) &&
              (ann == null || (ann match {
                case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
                  i.isSigned &&
                    (i.getBitWidth == 32 || i.getBitWidth == 64)
                case _ => false
              }))
            }
            if (!okType) None
            else {
              var nulls = 0L
              var mn = Option.empty[Long]
              var mx = Option.empty[Long]
              var exact = true
              val it = blocks.iterator()
              while (exact && it.hasNext) {
                val b = it.next()
                scala.jdk.CollectionConverters
                  .ListHasAsScala(b.getColumns).asScala
                  .find(_.getPath.toDotString == c) match {
                  case None => exact = false
                  case Some(cc) =>
                    val st = cc.getStatistics
                    if (st == null || !st.isNumNullsSet) exact = false
                    else {
                      nulls += st.getNumNulls
                      if (st.hasNonNullValue) {
                        (st.genericGetMin, st.genericGetMax) match {
                          case (a: java.lang.Long, b2: java.lang.Long) =>
                            mn = Some(mn.fold(a.longValue)(
                              math.min(_, a.longValue)))
                            mx = Some(mx.fold(b2.longValue)(
                              math.max(_, b2.longValue)))
                          case (a: java.lang.Integer,
                              b2: java.lang.Integer) =>
                            mn = Some(mn.fold(a.longValue.toLong)(
                              math.min(_, a.longValue)))
                            mx = Some(mx.fold(b2.longValue.toLong)(
                              math.max(_, b2.longValue)))
                          case _ => exact = false
                        }
                      }
                    }
                }
              }
              if (!exact) None
              else Some((mn, mx) match {
                case (Some(lo), Some(hi)) => Some((lo, hi, nulls))
                case _                    => None // all-NULL column
              })
            }
          }
        val out = scala.collection.mutable.Map
          .empty[String, (String, String)]
        var allExact = true
        wanted.foreach { c =>
          if (allExact) colExact(c) match {
            case None => allExact = false
            case Some(None) => ()
            case Some(Some((lo, hi, nulls))) =>
              out += c -> (lo.toString, hi.toString)
              out += s"$c#nulls" -> (nulls.toString, nulls.toString)
          }
        }
        if (allExact) Some((rows, out.toMap)) else None
      } finally r.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Σ `#rows` over entries, as long as EVERY entry carries the stat
    * (a partial sum would misreport removals) — None otherwise.
    */
  private def rowsOf(entries: Seq[FileEntry]): Option[Long] = {
    val counts = entries.map(_.stats.get("#rows").map(_._1.toLong))
    if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
  }

  private def filesOf(dir: String): Seq[FileEntry] = {
    val absRoot = absRootPath
    def rel(p: Path): String =
      p.toUri.getPath.stripPrefix(absRoot).stripPrefix("/")
    val partPaths = fs.listStatus(new Path(s"$root/$dir")).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(_.getPath)
    val parts = partPaths.map(rel)
    if (parts.isEmpty) return Seq.empty
    // fast path (r16): ONE footer read per file yields the row count
    // AND exact integer-column stats — no read-back aggregation job.
    // Any non-footer-exact stats column drops the whole commit to the
    // read-back path below, so manifests are identical either way.
    val fromFooters: Option[Seq[FileEntry]] = {
      val per = partPaths.map(p => rel(p) -> footerStats(p, statsCols))
      if (per.forall(_._2.isDefined))
        Some(per.map { case (p, info) =>
          val (rows, st) = info.get
          FileEntry(p, dir,
            st + ("#rows" -> (rows.toString, rows.toString)))
        })
      else None
    }
    fromFooters.foreach(entries => return entries)
    val rowCounts: Map[String, Long] = partPaths.flatMap(p =>
      footerRowCount(p).map(rel(p) -> _)).toMap
    val df = spark.read.parquet(s"$root/$dir")
    val present = statsCols.filter(df.columns.contains)
    val statsByFile: Map[String, Map[String, (String, String)]] =
      if (present.isEmpty) Map.empty
      else {
        val aggs = present.flatMap(c => Seq(
          min(col(c)).cast("string").as(s"mn_$c"),
          max(col(c)).cast("string").as(s"mx_$c"),
          sum(when(col(c).isNull, lit(1L)).otherwise(lit(0L)))
            .cast("string").as(s"nl_$c")))
        df.groupBy(input_file_name().as("f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val file = rel(new Path(new java.net.URI(r.getString(0))))
            val st = present.zipWithIndex.flatMap { case (c, i) =>
              val mn = r.getString(1 + 3 * i)
              val mx = r.getString(2 + 3 * i)
              val nl = r.getString(3 + 3 * i)
              if (mn == null || mx == null) None
              else Seq(c -> (mn, mx), s"$c#nulls" -> (nl, nl))
            }.toMap
            file -> st
          }.toMap
      }
    parts.map { p =>
      val rows = rowCounts.get(p)
        .map(n => "#rows" -> (n.toString, n.toString)).toMap
      FileEntry(p, dir, statsByFile.getOrElse(p, Map.empty) ++ rows)
    }
  }

  /** Widen `prev` with `cur`'s new columns; a column present in both
    * must keep its type (loud failure — silent type change is the
    * corruption every table format refuses). All fields are stored
    * nullable: a column absent from some commit reads as NULL there.
    */
  private def mergeSchemas(prev: StructType, cur: StructType): StructType = {
    val prevNames = prev.fieldNames.toSet
    prev.fields.foreach { f =>
      cur.fields.find(_.name == f.name).foreach { g =>
        require(g.dataType == f.dataType,
          s"$root: schema evolution cannot change '${f.name}' from " +
            s"${f.dataType.simpleString} to ${g.dataType.simpleString}")
      }
    }
    StructType((prev.fields ++ cur.fields.filterNot(f =>
      prevNames.contains(f.name))).map(_.copy(nullable = true)))
  }

  /** Claim-then-publish of version = max(any claim or manifest)+1;
    * returns the published version number. For `append`, the new
    * manifest is the current files plus `addFiles` under the merged
    * schema; for `replace`, exactly `addFiles` under `addSchema`.
    *
    * Writer concurrency contract: ONE writer at a time (the store's
    * own model — the reference ingests single-worker). The claim
    * protocol plus the post-publish lost-append audit (see class
    * docs) make ACCIDENTAL concurrent appends converge to a snapshot
    * containing both, instead of silently dropping one.
    */
  private[store] def publishManifest(op: String, addFiles: Seq[FileEntry],
      addSchema: StructType, txnId: Option[String],
      audit: Map[String, String] = Map.empty): Long = {
    fs.mkdirs(new Path(manifestsDir))
    var attempts = 0
    while (attempts < 50) {
      attempts += 1
      val next = (listNumbers(claimRe) ++ listNumbers(manifestRe))
        .foldLeft(-1L)(math.max) + 1L
      val claimed =
        try {
          // the claim body names the commit dirs this writer will
          // publish: vacuum spares dirs named by a PENDING claim (see
          // vacuum), closing the claim→publish window during which a
          // commit's data is on disk but referenced by no manifest
          val out = fs.create(new Path(manifestsDir, s"v_$next.claim"), false)
          try out.write(addFiles.map(_.commit).distinct.sorted
            .mkString("\n").getBytes("UTF-8"))
          finally out.close()
          true
        }
        catch { case _: java.io.IOException => false } // lost the race
      if (claimed) try {
        // base entries are read AFTER the claim: the claim winner
        // observes every manifest published before its claim
        val base = currentVersion.map(readManifest)
        val (files, schema) = op match {
          case "append" =>
            val prevSchema = base.flatMap(_.schema).getOrElse(addSchema)
            // de-dup by path: two concurrent lost-append healers each
            // computed their re-append set against a snapshot read
            // BEFORE this claim — whichever publishes second would
            // otherwise re-append files the first already restored
            // (duplicate rows). Base order wins; only genuinely-new
            // paths append.
            val merged = (base.map(_.files).getOrElse(Seq.empty) ++ addFiles)
              .distinctBy(_.path)
            (merged, mergeSchemas(prevSchema, addSchema))
          case _ => (addFiles, StructType(
            addSchema.fields.map(_.copy(nullable = true))))
        }
        // BUDGET CARRY-FORWARD (r15 ADVICE #2): the privacy ledger's
        // running totals must survive vacuum, but vacuum retains
        // purely by count — if ordinary commits (appends, maintain's
        // compact/replace) follow the last DP release and vacuum runs
        // with a small retain, every manifest carrying the totals
        // would drop and the budget gate would silently reset. So the
        // monotone ledger keys fold FORWARD onto EVERY manifest this
        // table publishes: the newest manifest — which vacuum always
        // retains (retain >= 1) — always carries the full history,
        // structurally, with no vacuum-side special case. A release
        // commit's own audit map overrides the carried values (it
        // computed the new totals).
        val carried = base.map(_.audit).getOrElse(Map.empty)
          .view.filterKeys(VersionedTable.CarryForwardAuditKeys).toMap
        val body = (header(next, txnId, op, schema, carried ++ audit) +:
          files.map(encFile))
          .mkString("", "\n", "\n")
        val tmp = new Path(manifestsDir, s"v_$next.manifest.tmp")
        val out = fs.create(tmp, true)
        try out.write(body.getBytes("UTF-8")) finally out.close()
        if (!fs.rename(tmp, new Path(manifestsDir, s"v_$next.manifest")))
          throw new IllegalStateException(
            s"$root: publish of v_$next failed to rename its manifest")
        return next
      } catch {
        // release our claim before propagating (schema-merge reject,
        // manifest-write failure): the claimant itself is giving the
        // number back SYNCHRONOUSLY, so reuse is safe — without this,
        // every failed attempt of a retry loop leaks a claim file
        // that vacuum never reclaims and that pins the commit's
        // orphan data dirs for a full grace period each
        case e: Throwable =>
          val m = new Path(manifestsDir, s"v_$next.manifest")
          if (!fs.exists(m)) // only if OUR manifest didn't publish
            fs.delete(new Path(manifestsDir, s"v_$next.claim"), false)
          throw e
      }
    }
    throw new IllegalStateException(
      s"$root: could not claim a version in $attempts attempts")
  }

  /** Post-publish lost-append audit (class docs): ensure the CURRENT
    * snapshot contains (a) our own commit and (b) our immediate
    * predecessor's commits if it was an append. Heals by re-appending
    * the missing files; bounded rounds, loud failure past them.
    * Returns the version whose snapshot passed the audit.
    */
  private[store] def auditAppend(published: Long, myFiles: Seq[FileEntry],
      mySchema: StructType): Long = {
    val myDirs = myFiles.map(_.commit).toSet
    var round = 0
    while (round < 5) {
      round += 1
      val vs = versions
      val top = vs.last
      val topM = readManifest(top)
      val topDirs = topM.files.map(_.commit).toSet
      if (!myDirs.subsetOf(topDirs)) {
        // a later writer published from a snapshot predating our
        // commit — re-append our files on top of the current snapshot
        publishManifest("append",
          myFiles.filterNot(f => topDirs.contains(f.commit)), mySchema, None)
      } else {
        val below = vs.filter(_ < top).lastOption.map(readManifest)
        val missing = below match {
          case Some(b) if b.op == "append" =>
            b.files.filterNot(f => topDirs.contains(f.commit))
          case _ => Seq.empty // replace below us resets the chain by design
        }
        if (missing.isEmpty) return vs.last
        // we published without carrying a just-published append
        // forward — restore its files (schema: the dropped manifest's)
        publishManifest("append", missing,
          below.flatMap(_.schema).getOrElse(mySchema), None)
      }
    }
    throw new IllegalStateException(
      s"$root: lost-append audit did not converge after $round rounds " +
        s"(concurrent writers exceeded the accidental-interleave contract)")
  }

  private def writeData(df: DataFrame): Seq[FileEntry] = {
    val dir = s"data/c_${UUID.randomUUID().toString.take(8)}"
    df.write.mode("error").parquet(s"$root/$dir")
    filesOf(dir)
  }

  /** Append `df` as a new commit; returns the new version (after the
    * lost-append audit — under an accidental concurrent append this
    * may be a healed version above the first published one). With
    * `txnId`, replaying an already-committed id is a no-op returning
    * the current version (idempotent at-least-once ingest). A frame
    * with NEW columns widens the table schema (add-column evolution);
    * a changed column type fails loudly.
    */
  def commit(df: DataFrame, txnId: Option[String] = None): Long = {
    txnId.filter(txnCommitted) match {
      case Some(_) => currentVersion.get
      case None =>
        val files = writeData(df)
        val v = publishManifest("append", files, df.schema, txnId)
        auditAppend(v, files, df.schema)
    }
  }

  /** [[commit]] with compliance audit evidence attached to the
    * manifest — the RELEASE-side counterpart of the deletion audit:
    * a privacy release records what mechanism ran and what privacy
    * budget it spent (`graft.operators.Privacy.releaseDp` writes
    * `privacy.epsilon_ticks`, and [[auditLog]] then answers "what ε
    * has this table consumed"). Same append semantics and txn replay
    * fence as [[commit]]; the audit map carries metadata only, never
    * data. (On the accidental-concurrent-append HEAL path the
    * re-published manifest keeps the files but not the audit field —
    * the lost-append audit's rescue manifests are system commits; the
    * originally-published manifest, which [[auditLog]] also reads,
    * retains it.)
    */
  def commitAudited(df: DataFrame, audit: Map[String, String],
      txnId: Option[String] = None): Long = {
    txnId.filter(txnCommitted) match {
      case Some(_) => currentVersion.get
      case None =>
        val files = writeData(df)
        val v = publishManifest("append", files, df.schema, txnId, audit)
        auditAppend(v, files, df.schema)
    }
  }

  /** DELETE rows whose `keyCol` is in `keys` — the takedown /
    * retention commit every corpus store needs (VERDICT r11 #3). The
    * Delta-style copy-on-write rewrite with FILE-level manifest
    * pruning: a data file whose [min,max] stats band for `keyCol`
    * misses every key is carried into the new manifest VERBATIM
    * (never read, never rewritten — assert via FileEntry identity);
    * only overlapping files are re-read, anti-filtered, and
    * rewritten. Work is O(touched files + |keys|·files), not
    * O(table) — on a store whose commits arrive key-clustered (the
    * ingest norm: doc ids are monotone per batch) a takedown touches
    * the handful of files holding those docs.
    *
    * `keys` is a DRIVER-side list: takedown/retention sets are
    * catalog-sized (a legal request, an expired-source purge), the
    * same bounded-driver-state contract as Curation's source
    * catalogs. NULL keys are not supported in the DELETE LIST (NOT
    * IN over a NULL would drop every row of a touched file), but
    * NULL VALUES in the column are retained: the keep-predicate is
    * explicitly `NOT isin(keys) OR isNull`, because a bare
    * `!isin` evaluates to NULL (not true) on NULL-keyed rows and a
    * copy-on-write rewrite would silently drop them from every
    * touched file (r12 advice) — a delete must remove exactly the
    * rows the predicate matches TRUE, nothing else.
    *
    * Semantics: publishes op `delete` whose manifest is
    * untouched ++ rewritten — earlier versions stay readable (time
    * travel spans deletes), [[changesSince]] across the delete takes
    * the [[rowDiff]] path and tags removed rows `delete` (the CDC
    * feed standing-index repair consumes, see
    * `operators.IndexMaintenance`), and [[vacuum]] later reclaims
    * the superseded files. Idempotent under `txnId` replay. A delete
    * matching nothing (no overlapping file) publishes nothing and
    * returns the current version.
    */
  def deleteKeys(keyCol: String, keys: Seq[Any],
      txnId: Option[String] = None): Long = {
    require(keys.nonEmpty, s"$root: deleteKeys with an empty key list")
    require(keys.forall(_ != null), s"$root: deleteKeys with a NULL key")
    txnId.filter(txnCommitted) match {
      case Some(_) => currentVersion.get
      case None =>
        val v = currentVersion.getOrElse(
          throw new IllegalStateException(s"$root: no committed version"))
        val m = readManifest(v)
        val dt = m.schema.flatMap(s =>
          s.fields.find(_.name == keyCol).map(_.dataType))
          .getOrElse(org.apache.spark.sql.types.StringType)
        val keyStrs = keys.map(_.toString)
        // a file with no stats for the column is conservatively
        // touched (same contract as readRange)
        val (touched, untouched) = m.files.partition { f =>
          f.stats.get(keyCol) match {
            case Some((mn, mx)) =>
              keyStrs.exists(k => overlaps(dt, mn, mx, k, k))
            case None => true
          }
        }
        if (touched.isEmpty) return v
        val kept = readFiles(m.schema, touched)
          .filter(!col(keyCol).isin(keys: _*) || col(keyCol).isNull)
        val rewritten = writeData(kept)
        // audit evidence: counts only, never the keys (storing them
        // in the manifest would re-retain forgotten identifiers)
        val audit = Map(
          "key_col" -> keyCol,
          "key_count" -> keys.distinct.size.toString,
          "files_touched" -> touched.size.toString,
          "files_carried" -> untouched.size.toString) ++
          (for { t <- rowsOf(touched); r <- rowsOf(rewritten) }
            yield "rows_removed" -> (t - r).toString)
        publishManifest("delete", untouched ++ rewritten,
          m.schema.getOrElse(kept.schema), txnId, audit)
    }
  }

  /** COPY-ON-WRITE ROW UPDATE — one commit rewriting the rows whose
    * `keyCol` is in `keys` through `transform`, everything else
    * untouched: the third delete-class primitive (delete by key,
    * delete by age, now UPDATE by key), built for retroactive
    * rewrites like [[graft.operators.Blocklist]]'s rescrub — a
    * catalog-growth event must scrub ALREADY-LANDED documents
    * without rewriting the whole table.
    *
    * Same file-stats pruning as [[deleteKeys]]: files whose [min,max]
    * band misses every key carry into the new manifest VERBATIM
    * (never read); touched files are re-read, their NON-matching rows
    * carried as-is, their matching rows replaced by
    * `transform(matching)`. The transform must preserve the row
    * SCHEMA (same columns and types — loud failure otherwise: a
    * shape-changing rewrite is [[replace]]'s job) but may change any
    * value, drop rows (return fewer), or expand rows. NULL-keyed rows
    * are never matched (the delete-class predicate contract).
    *
    * Publishes op `update`; time travel spans it; [[changesSince]]
    * takes the [[rowDiff]] path and reports each changed row as its
    * delete/insert pair over ONLY the touched files — the CDC feed
    * standing-index repair consumes. Idempotent under `txnId` replay;
    * keys that touch no file publish nothing.
    */
  def updateRows(keyCol: String, keys: Seq[Any],
      transform: DataFrame => DataFrame,
      txnId: Option[String] = None): Long = {
    require(keys.nonEmpty, s"$root: updateRows with an empty key list")
    require(keys.forall(_ != null), s"$root: updateRows with a NULL key")
    txnId.filter(txnCommitted) match {
      case Some(_) => currentVersion.get
      case None =>
        val v = currentVersion.getOrElse(
          throw new IllegalStateException(s"$root: no committed version"))
        val m = readManifest(v)
        val dt = m.schema.flatMap(s =>
          s.fields.find(_.name == keyCol).map(_.dataType))
          .getOrElse(org.apache.spark.sql.types.StringType)
        val keyStrs = keys.map(_.toString)
        val (touched, untouched) = m.files.partition { f =>
          f.stats.get(keyCol) match {
            case Some((mn, mx)) =>
              keyStrs.exists(k => overlaps(dt, mn, mx, k, k))
            case None => true
          }
        }
        if (touched.isEmpty) return v
        val base = readFiles(m.schema, touched)
        val matchPred = col(keyCol).isin(keys: _*)
        val transformed = transform(base.filter(matchPred))
        val want = base.schema.fields
          .map(f => (f.name, f.dataType)).toSeq
        val got = transformed.schema.fields
          .map(f => (f.name, f.dataType)).toSeq
        require(got == want,
          s"$root: updateRows transform changed the schema " +
            s"($want -> $got) — a shape-changing rewrite is replace()")
        val kept = base.filter(!matchPred || col(keyCol).isNull)
          .unionByName(transformed)
        val rewritten = writeData(kept)
        val audit = Map(
          "key_col" -> keyCol,
          "key_count" -> keys.distinct.size.toString,
          "files_touched" -> touched.size.toString,
          "files_carried" -> untouched.size.toString)
        publishManifest("update", untouched ++ rewritten,
          m.schema.getOrElse(kept.schema), txnId, audit)
    }
  }

  /** AGE-BASED RETENTION EXPIRY — one commit dropping every row whose
    * `tsCol` orders strictly BELOW `cutoff`. Rows at/above the cutoff
    * are retained, and so are rows with a NULL timestamp: like
    * [[deleteKeys]], a delete removes exactly the rows its predicate
    * matches TRUE, nothing else (the r12 NULL-retention contract) —
    * an unstamped row's age is unknown, not expired.
    *
    * Where [[deleteKeys]] must rewrite every touched file (a key set
    * can hit anywhere inside a band), the one-sided age predicate
    * admits the cheaper THREE-WAY file classification on the
    * manifest's [min,max] bands:
    *  - `max < cutoff` AND the file's `tsCol#nulls` stat is 0 →
    *    every row is provably expired: the file is DROPPED from the
    *    new manifest without ever being read (earlier versions still
    *    reference it — time travel spans the expiry, [[vacuum]]
    *    reclaims it later);
    *  - `min >= cutoff`, or no stats for the column at all (an
    *    all-NULL or column-absent file — every row NULL ⇒ retained) →
    *    carried into the new manifest VERBATIM (same FileEntry,
    *    never read);
    *  - anything else (band straddles the cutoff, unparseable bound,
    *    expired band with NULL rows present or a pre-`#nulls`-stat
    *    manifest) → read, filtered `tsCol >= cutoff OR tsCol IS
    *    NULL`, rewritten.
    * On a store whose ingest lands time-clustered commits (the norm:
    * batch timestamps are monotone), a retention sweep therefore
    * drops the old files whole and rewrites at most the boundary
    * file — O(boundary), not O(expired) and certainly not O(table).
    * This is the third leg of the index/store lifecycle: grow
    * (ingest), shrink by key (takedown), shrink by age (retention);
    * standing indexes repair from the expiry's [[changesSince]]
    * delete feed exactly as for a takedown (`IndexMaintenance`).
    *
    * `cutoff` is a string bound compared with the column's own type
    * ([[readRange]]'s typed contract: numeric columns numerically,
    * everything else lexicographically — ISO dates/timestamps order
    * correctly). Publishes op `expire`; idempotent under `txnId`
    * replay; a sweep that touches nothing publishes nothing and
    * returns the current version.
    *
    * Two loud-failure guards protect the compliance contract
    * (retention believed running but silently doing the wrong thing
    * is the worst failure mode for this op):
    *  - `tsCol` must be in `statsCols` (the [[readRange]] /
    *    [[clusteringDepth]] require). Without it every file lacks
    *    stats for the column, every file classifies as carry-verbatim
    *    and the sweep is a silent permanent no-op. The PER-FILE
    *    no-stats → carry branch stays: with the column configured,
    *    a file lacking its stats is one whose commit lacked the
    *    column entirely (schema evolution — every row reads NULL and
    *    NULLs are retained by contract).
    *  - on a numeric column the cutoff must PARSE as a number.
    *    Otherwise every band comparison is indeterminate (boundary
    *    rewrite) and the row filter's `cast(cutoff)` yields NULL, so
    *    `ts >= NULL` is never TRUE and the rewrite would expire
    *    EVERY non-NULL-timestamp row — a typo'd policy constant must
    *    throw, not truncate the table.
    */
  def expireBefore(tsCol: String, cutoff: String,
      txnId: Option[String] = None): Long = {
    require(statsCols.contains(tsCol),
      s"$root: expireBefore($tsCol) needs the column in " +
        s"statsCols=$statsCols — without file stats every file " +
        "carries verbatim and the retention sweep silently retains " +
        "everything")
    txnId.filter(txnCommitted) match {
      case Some(_) => currentVersion.get
      case None =>
        val v = currentVersion.getOrElse(
          throw new IllegalStateException(s"$root: no committed version"))
        val m = readManifest(v)
        val dt = m.schema.flatMap(s =>
          s.fields.find(_.name == tsCol).map(_.dataType))
          .getOrElse(org.apache.spark.sql.types.StringType)
        dt match {
          case _: NumericType =>
            try { BigDecimal(cutoff): Unit }
            catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"$root: expireBefore($tsCol, $cutoff) — cutoff does " +
                    s"not parse as the column's numeric type $dt; the " +
                    "row filter's cast would yield NULL and expire " +
                    "every stamped row")
            }
          case _ => ()
        }
        def cmpOpt(a: String, b: String): Option[Int] = dt match {
          case _: NumericType =>
            try Some(BigDecimal(a).compare(BigDecimal(b)))
            catch { case _: NumberFormatException => None }
          case _ => Some(a.compareTo(b))
        }
        // 0 = drop whole file, 1 = carry verbatim, 2 = boundary rewrite
        def classify(f: FileEntry): Int = f.stats.get(tsCol) match {
          case None => 1
          case Some((mn, mx)) =>
            val provablyNoNulls =
              f.stats.get(s"$tsCol#nulls").exists(_._1 == "0")
            if (cmpOpt(mx, cutoff).exists(_ < 0) && provablyNoNulls) 0
            else if (cmpOpt(mn, cutoff).exists(_ >= 0)) 1
            else 2
        }
        val classed = m.files.map(f => (f, classify(f)))
        val verbatim = classed.collect { case (f, 1) => f }
        val boundary = classed.collect { case (f, 2) => f }
        if (boundary.isEmpty && verbatim.size == m.files.size) return v
        val rewritten =
          if (boundary.isEmpty) Seq.empty[FileEntry]
          else {
            val base = readFiles(m.schema, boundary)
            val rowDt = base.schema.fields.find(_.name == tsCol)
              .map(_.dataType)
              .getOrElse(org.apache.spark.sql.types.StringType)
            // same NULL-cast hazard as the numeric guard above, for
            // the remaining castable types (date/timestamp): a cutoff
            // the cast cannot parse yields NULL and `ts >= NULL` would
            // expire every stamped boundary row. One driver-side probe.
            val castOk = spark.range(1)
              .select(lit(cutoff).cast(rowDt).isNotNull).head().getBoolean(0)
            require(castOk,
              s"$root: expireBefore($tsCol, $cutoff) — cutoff does not " +
                s"cast to the column type $rowDt; refusing the rewrite " +
                "(the NULL cast would expire every stamped row)")
            writeData(base.filter(
              col(tsCol) >= lit(cutoff).cast(rowDt) || col(tsCol).isNull))
          }
        val dropped = classed.collect { case (f, 0) => f }
        val audit = Map(
          "ts_col" -> tsCol,
          "cutoff" -> cutoff,
          "files_dropped" -> dropped.size.toString,
          "files_carried" -> verbatim.size.toString,
          "files_rewritten" -> boundary.size.toString) ++
          (for {
            d <- rowsOf(dropped); b <- rowsOf(boundary)
            r <- rowsOf(rewritten)
          } yield "rows_removed" -> (d + b - r).toString)
        publishManifest("expire", verbatim ++ rewritten,
          m.schema.getOrElse(readFiles(m.schema, m.files).schema), txnId,
          audit)
    }
  }

  /** Result of [[clusteringDepth]]: how many data files a point
    * lookup on the profiled column must read. `maxDepth` is the
    * worst-case count over any key (the classic interval
    * max-overlap); `meanStartDepthTicks` is 1e6 × the mean depth
    * sampled at every band's min endpoint (1e6 = perfectly
    * clustered: every lookup touches one file). Files without stats
    * for the column are reported in `nUnbanded` — they overlap every
    * key conservatively, so a real lookup adds them on top of the
    * banded depth.
    */
  final case class ClusteringDepth(nFiles: Int, nBanded: Int,
      nUnbanded: Int, maxDepth: Int, meanStartDepthTicks: Long)

  /** CLUSTERING-DEPTH profile of the current snapshot on `statsCol` —
    * the measurement that decides WHEN to run [[compact]] or re-sort
    * (Z-order/repartitionByRange) a table: ingest lands key-clustered
    * commits, but interleaved or replayed batches overlap their
    * [min,max] bands, and every overlap multiplies the files a
    * point/range read must open even WITH manifest pruning. One
    * sweep-line over the manifest's bands (starts before ends at
    * equal coordinates — bounds are inclusive, so touching bands
    * overlap), typed like [[readRange]]'s pruning: numeric columns
    * compare numerically (falling back to lexicographic if any bound
    * fails to parse — deterministic either way), everything else
    * lexicographically. Driver-side manifest work, O(F log F).
    */
  def clusteringDepth(statsCol: String): ClusteringDepth = {
    require(statsCols.contains(statsCol),
      s"$root: clusteringDepth($statsCol) needs the column in " +
        s"statsCols=$statsCols")
    val m = readManifest(currentVersion.getOrElse(
      throw new IllegalStateException(s"$root: no committed version")))
    val dt = m.schema.flatMap(s =>
      s.fields.find(_.name == statsCol).map(_.dataType))
      .getOrElse(org.apache.spark.sql.types.StringType)
    val bands = m.files.flatMap(_.stats.get(statsCol))
    val nUnbanded = m.files.size - bands.size
    if (bands.isEmpty)
      return ClusteringDepth(m.files.size, 0, nUnbanded, 0, 0L)
    val numeric = dt.isInstanceOf[NumericType] &&
      bands.forall { case (mn, mx) =>
        try { BigDecimal(mn); BigDecimal(mx); true }
        catch { case _: NumberFormatException => false }
      }
    def cmp(a: String, b: String): Int =
      if (numeric) BigDecimal(a).compare(BigDecimal(b)) else a.compareTo(b)
    // events: (coord, kind) with kind 0 = band start, 1 = band end;
    // starts sort before ends at the same coordinate (inclusive
    // bounds: [a,x] and [x,b] DO share key x)
    val events = bands.flatMap { case (mn, mx) => Seq((mn, 0), (mx, 1)) }
      .sortWith { case ((c1, k1), (c2, k2)) =>
        val c = cmp(c1, c2)
        c < 0 || (c == 0 && k1 < k2)
      }
    // coordinate groups: every start at a coordinate samples the SAME
    // depth (all bands containing that point — including ones ending
    // exactly there, which still cover it under inclusive bounds)
    var active = 0
    var maxDepth = 0
    var startDepthSum = 0L
    var i = 0
    while (i < events.length) {
      var j = i
      var starts = 0
      var ends = 0
      while (j < events.length && cmp(events(j)._1, events(i)._1) == 0) {
        if (events(j)._2 == 0) starts += 1 else ends += 1
        j += 1
      }
      active += starts
      if (active > maxDepth) maxDepth = active
      startDepthSum += active.toLong * starts
      active -= ends
      i = j
    }
    ClusteringDepth(m.files.size, bands.size, nUnbanded, maxDepth,
      math.round(startDepthSum * 1e6 / bands.size))
  }

  /** SMALL-FILE COMPACTION PLAN: group the current snapshot's files
    * smaller than `targetBytes` into next-fit byte-budget groups
    * (deterministic path order — the q46 packing rule applied to
    * files), returning only groups of ≥ 2 (a lone small file gains
    * nothing from a rewrite). Files ≥ targetBytes are never touched.
    * Driver-side manifest work, one `getFileStatus` per live file —
    * the same bounded class as [[vacuum]]'s directory walk.
    *
    * Why this op exists at 100 TB: streaming ingest lands a commit
    * per micro-batch, so a hot table accretes thousands of KB-sized
    * files; every scan then pays per-file open/footer costs and the
    * manifest grows without bound. Periodic compaction folds the
    * small tail into right-sized files WITHOUT rewriting the big
    * ones — O(small tail), never O(table), the same economics as
    * [[deleteKeys]]' file pruning.
    */
  def compactionPlan(targetBytes: Long): Seq[Seq[FileEntry]] = {
    require(targetBytes > 0, s"$root: targetBytes must be positive")
    val v = currentVersion.getOrElse(return Seq.empty)
    val small = readManifest(v).files
      .map(f => f -> fs.getFileStatus(new Path(s"$root/${f.path}")).getLen)
      .filter(_._2 < targetBytes)
      .sortBy(_._1.path)
    val groups = Seq.newBuilder[Seq[FileEntry]]
    var cur = List.empty[FileEntry]
    var fill = 0L
    small.foreach { case (f, len) =>
      if (fill > 0 && fill + len > targetBytes) {
        groups += cur.reverse
        cur = Nil
        fill = 0L
      }
      cur ::= f
      fill += len
    }
    if (cur.nonEmpty) groups += cur.reverse
    groups.result().filter(_.size >= 2)
  }

  /** COMPACT the current snapshot's small-file tail: each
    * [[compactionPlan]] group is re-read under the snapshot schema
    * and rewritten as ONE file (`coalesce(1)` — the group is
    * byte-budgeted to be a single right-sized file); every other
    * file is carried into the new manifest VERBATIM (FileEntry
    * identity — never read). Publishes op `compact`.
    *
    * Semantics: row content is IDENTICAL across the commit — time
    * travel spans it, [[changesSince]] across a compaction takes the
    * [[rowDiff]] path and reports NO changes (a maintenance commit
    * is invisible to CDC consumers), stats re-derive for the
    * rewritten files, and [[vacuum]] later reclaims the superseded
    * dirs. Idempotent under `txnId` replay; a snapshot with no
    * compactable group publishes nothing and returns the current
    * version.
    */
  def compact(targetBytes: Long, txnId: Option[String] = None): Long = {
    txnId.filter(txnCommitted) match {
      case Some(_) => currentVersion.get
      case None =>
        val v = currentVersion.getOrElse(
          throw new IllegalStateException(s"$root: no committed version"))
        val m = readManifest(v)
        val groups = compactionPlan(targetBytes)
        if (groups.isEmpty) return v
        val grouped = groups.flatten.map(_.path).toSet
        val untouched = m.files.filterNot(f => grouped.contains(f.path))
        val rewritten = groups.flatMap(g =>
          writeData(readFiles(m.schema, g).coalesce(1)))
        publishManifest("compact", untouched ++ rewritten,
          m.schema.getOrElse(readFiles(m.schema, m.files).schema), txnId)
    }
  }

  /** One row of [[maintenancePlan]]: `action` ∈ {compact, resort,
    * vacuum}, `target` the column (resort) or "" (table-wide),
    * `metric` the measured evidence, `threshold` what it exceeded.
    */
  final case class MaintenanceAction(action: String, target: String,
      metric: Long, threshold: Long, reason: String)

  /** MAINTENANCE ADVISOR (r13 VERDICT #6) — the measurement ops
    * ([[compactionPlan]], [[clusteringDepth]], the version ledger)
    * turned into recommendations, the encoding-advisor pattern
    * applied to the store itself. Pure driver-side manifest work, no
    * data read, no side effects — an operator (or a cron-driven
    * maintenance job) reads the plan and runs the named op:
    *
    *  - **compact** when [[compactionPlan]] finds ≥ 1 foldable
    *    small-file group (a fragmented streaming-ingest tail):
    *    metric = small files in the plan, threshold 2 (a lone small
    *    file gains nothing, the plan's own rule);
    *  - **resort** per stats column whose [[clusteringDepth]] mean
    *    start depth exceeds `maxMeanDepthTicks` with ≥ 2 banded
    *    files (interleaved/replayed batches overlap their bands, so
    *    point reads open `mean/1e6` files even with pruning —
    *    Z-order or `repartitionByRange` + [[replace]] restores
    *    depth ~1);
    *  - **vacuum** when data dirs are referenced ONLY by versions
    *    outside the `vacuumRetain` newest (durably superseded
    *    storage a [[vacuum]] call would reclaim): metric = dir
    *    count. A dry run of vacuum's reference walk — nothing is
    *    deleted here.
    *
    * A freshly compacted AND vacuumed well-clustered table yields an
    * EMPTY plan (the advisor's fixed point, spec-pinned). An empty
    * store yields an empty plan.
    */
  def maintenancePlan(
      targetBytes: Long = 128L * 1024 * 1024,
      maxMeanDepthTicks: Long = 2000000L,
      vacuumRetain: Int = 2): Seq[MaintenanceAction] = {
    require(vacuumRetain >= 1,
      s"$root: maintenancePlan needs vacuumRetain >= 1")
    if (currentVersion.isEmpty) return Seq.empty
    val out = Seq.newBuilder[MaintenanceAction]
    val plan = compactionPlan(targetBytes)
    if (plan.nonEmpty) {
      val nSmall = plan.map(_.size).sum
      out += MaintenanceAction("compact", "", nSmall.toLong, 2L,
        s"$nSmall files under $targetBytes bytes fold into " +
          s"${plan.size} group(s) — run compact($targetBytes)")
    }
    statsCols.foreach { c =>
      val d = clusteringDepth(c)
      if (d.nBanded >= 2 && d.meanStartDepthTicks > maxMeanDepthTicks)
        out += MaintenanceAction("resort", c, d.meanStartDepthTicks,
          maxMeanDepthTicks,
          s"mean lookup depth ${d.meanStartDepthTicks / 1e6} files on " +
            s"'$c' (max ${d.maxDepth}) — re-sort (Z-order/range) and " +
            "replace()")
    }
    val vs = versions
    val droppedVs = vs.dropRight(vacuumRetain)
    if (droppedVs.nonEmpty) {
      val retainedDirs = vs.takeRight(vacuumRetain)
        .flatMap(readManifest(_).files.map(_.commit)).toSet
      val reclaimable = droppedVs.flatMap { n =>
        try readManifest(n).files.map(_.commit)
        catch { case _: Exception => Nil }
      }.toSet -- retainedDirs
      if (reclaimable.nonEmpty)
        out += MaintenanceAction("vacuum", "", reclaimable.size.toLong, 0L,
          s"${reclaimable.size} data dir(s) referenced only by " +
            s"versions older than the $vacuumRetain newest — run " +
            s"vacuum($vacuumRetain)")
    }
    out.result()
  }

  /** The COMPLIANCE LEDGER as a DataFrame: one row per (version,
    * audit key) across the table's retained history — (version, op,
    * txn, key, value). A deletion-evidence report ("what did every
    * delete/expire/update remove, and under which transaction") is a
    * filter on this; versions without audit evidence (appends,
    * pre-audit manifests) contribute no rows. Driver-side manifest
    * reads, O(versions).
    */
  def auditLog(): DataFrame = {
    import spark.implicits._
    versions.flatMap { v =>
      val m = readManifest(v)
      m.audit.toSeq.sortBy(_._1).map { case (k, x) =>
        (v, m.op, m.txn.getOrElse(""), k, x)
      }
    }.toDF("version", "op", "txn", "key", "value")
  }

  /** Execute [[maintenancePlan]]'s recommendations in the safe
    * order — re-sort or compact first (both create supersedure),
    * vacuum last. Returns the plan it acted on. The cron-job
    * composition of the advisor: call periodically, a table needing
    * nothing runs nothing.
    *
    * Re-sort advisories execute ONLY for columns the caller opts into
    * via `resortBy` (r14 verdict missing #8 — choosing the sort
    * columns is still the operator's call, but now an opted-in
    * advisory RUNS instead of merely reporting): the snapshot is
    * range-repartitioned and sorted on those columns and published as
    * one [[replace]] commit, restoring [[clusteringDepth]] ~1 so the
    * advisory disappears from the next plan. A `resortBy` column with
    * no standing advisory does nothing (execution is advisory-driven,
    * never speculative). When a resort runs, the compact advisory is
    * subsumed — the replace rewrites every byte anyway; running
    * compact first would rewrite the same data twice.
    */
  def maintain(targetBytes: Long = 128L * 1024 * 1024,
      vacuumRetain: Int = 2,
      graceMs: Long = VersionedTable.DefaultVacuumGraceMs,
      resortBy: Seq[String] = Nil)
      : Seq[MaintenanceAction] = {
    require(resortBy.forall(statsCols.contains),
      s"$root: resortBy must be stats columns " +
        s"(got $resortBy, statsCols=$statsCols)")
    val plan = maintenancePlan(targetBytes, vacuumRetain = vacuumRetain)
    val resorts = plan
      .filter(a => a.action == "resort" && resortBy.contains(a.target))
    if (resorts.nonEmpty) {
      val cols = resorts.map(a => col(a.target))
      replace(read()
        .repartitionByRange(cols: _*)
        .sortWithinPartitions(cols: _*)): Unit
    } else if (plan.exists(_.action == "compact")) {
      compact(targetBytes): Unit
    }
    if (plan.exists(_.action == "vacuum"))
      vacuum(vacuumRetain, graceMs): Unit
    plan
  }

  /** Replace the whole snapshot with `df` (compaction / rewrite): the
    * new manifest lists ONLY the new commit, but earlier versions
    * remain readable — time travel spans compactions. Old data dirs
    * are never deleted here; [[vacuum]] reclaims dirs unreferenced by
    * any retained manifest. The snapshot schema resets to `df`'s.
    */
  def replace(df: DataFrame, txnId: Option[String] = None): Long = {
    txnId.filter(txnCommitted) match {
      case Some(_) => currentVersion.get
      case None => publishManifest("replace", writeData(df), df.schema, txnId)
    }
  }

  /** Reclaim storage: keep the `retain` most recent versions, delete
    * every older manifest (and its claim marker) and every data
    * directory no retained manifest references. Returns the number of
    * data directories deleted.
    *
    * This SHRINKS the time-travel window to `retain` versions and
    * forgets dropped versions' txn ids (replay fences should outlive
    * retention by keeping `retain` ≥ the replay horizon). Readers
    * pinned at a dropped version fail on next execution — the same
    * contract every table format's vacuum documents.
    *
    * Concurrent-writer safety rests on TWO rules (round-8 advice —
    * the old "a newer manifest proves the claimant dead" heuristic was
    * unsound: A claims v5, B claims+publishes v6, A is still mid-write):
    *
    *  1. Dirs named by any PENDING claim (a claim number with NO
    *     matching manifest — regardless of newer manifests above it)
    *     are spared while the claim file is younger than `graceMs`.
    *     A claim older than `graceMs` is presumed a crashed writer:
    *     it stops pinning its dirs, but the claim FILE is kept —
    *     deleting it would let a later writer re-allocate the number,
    *     and a resumed claimant's publish would then silently clobber
    *     that writer's manifest (rename REPLACES on POSIX). Version
    *     numbers must never be reusable while any claimant could
    *     still be alive, so only dropped-version claims (whose
    *     manifest existed) are ever deleted.
    *  2. An unreferenced data dir is reclaimed IMMEDIATELY only when a
    *     manifest dropped by THIS vacuum referenced it (durably
    *     superseded data). A dir referenced by nothing — which is what
    *     an in-flight commit looks like during `writeData`, BEFORE its
    *     claim exists — is reclaimed only once its mtime is older than
    *     `graceMs`.
    *
    * So `graceMs` must exceed the longest plausible write+publish
    * duration (the same age-based contract as Delta's vacuum retention
    * or Iceberg's remove-orphan-files `olderThan`). The default is a
    * day; an operator certain no writer is live may pass 0 for
    * immediate reclaim of everything unreferenced.
    */
  def vacuum(retain: Int = 2,
      graceMs: Long = VersionedTable.DefaultVacuumGraceMs): Int = {
    require(retain >= 1, "vacuum must retain at least the current version")
    require(graceMs >= 0, "graceMs must be non-negative")
    val now = System.currentTimeMillis()
    val vs = versions
    val dropped = vs.dropRight(retain)
    val manifestSet = vs.toSet
    // rule 1: pending claims (no matching manifest, ANY number). An
    // expired claim stops PINNING but is never deleted (see scaladoc:
    // number reuse would let a resumed claimant clobber a later
    // writer's manifest).
    val pendingClaimDirs = listNumbers(claimRe)
      .filterNot(manifestSet.contains).flatMap { n =>
        val p = new Path(manifestsDir, s"v_$n.claim")
        try {
          if (now - fs.getFileStatus(p).getModificationTime > graceMs) Nil
          else {
            val in = fs.open(p)
            val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
            body.linesIterator.map(_.trim).filter(_.nonEmpty)
          }
        } catch { case _: java.io.IOException => Nil } // claim raced away
      }.toSet
    val retained = vs.takeRight(retain)
      .flatMap(readManifest(_).files.map(_.commit)).toSet ++ pendingClaimDirs
    // rule 2 bookkeeping: read the manifests we are about to drop —
    // dirs they reference are durably superseded and reclaim NOW
    val droppedReferenced = dropped.flatMap { n =>
      try readManifest(n).files.map(_.commit)
      catch { case _: Exception => Nil } // unreadable ⇒ treat as orphan
    }.toSet -- retained
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
        .filterNot(st => retained.contains(s"data/${st.getPath.getName}"))
        .filter { st =>
          droppedReferenced.contains(s"data/${st.getPath.getName}") ||
            now - st.getModificationTime > graceMs
        }
      sweep.foreach(st => fs.delete(st.getPath, true))
      sweep.size
    }
  }
}

object VersionedTable {
  /** Default age below which vacuum presumes an unreferenced dir or an
    * unmatched claim may belong to a LIVE writer (see [[VersionedTable.vacuum]]).
    */
  val DefaultVacuumGraceMs: Long = 24L * 3600 * 1000

  /** Audit keys that fold forward onto every subsequent manifest —
    * the MONOTONE ledger state (privacy-budget running totals and the
    * per-scope composition state) that must survive vacuum dropping
    * the release manifests that first recorded it. Per-release
    * evidence keys (epsilon_ticks, mechanism, removal counts) do NOT
    * carry: they describe one commit, and losing them to vacuum is
    * the normal retention trade every table format documents.
    */
  val CarryForwardAuditKeys: Set[String] = Set(
    "privacy.epsilon_spent_total_ticks",
    "privacy.delta_spent_total_ticks",
    "privacy.budget_state")
}
