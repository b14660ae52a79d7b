package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The takedown commit ([[VersionedTable.deleteKeys]]): row
  * semantics, file-level stats pruning (untouched files carried
  * verbatim, never re-read), time travel across the delete, CDC
  * tagging, and txn idempotence.
  */
class VersionedTableDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(statsCols: Seq[String] = Nil) = new VersionedTable(
    spark, Files.createTempDirectory("vtdel").toString, statsCols)

  test("deleteKeys removes exactly the keyed rows; earlier versions " +
      "still read the full snapshot; CDC tags the removed rows") {
    val vt = fresh(statsCols = Seq("doc_id"))
    val v1 = vt.commit((1L to 20L).map(i => (i, s"d$i")).toDF("doc_id", "text"))
    val v2 = vt.deleteKeys("doc_id", Seq(3L, 7L, 20L))
    assert(v2 > v1)
    assert(vt.read().select($"doc_id").as[Long].collect().sorted.toSeq ===
      ((1L to 20L).toSet -- Set(3L, 7L, 20L)).toSeq.sorted)
    // time travel: the pre-delete snapshot is intact
    assert(vt.readAt(v1).count() === 20L)
    // CDC across the delete: exactly the removed rows, tagged delete
    val changes = vt.changesSince(v1)
      .filter($"change_type" === "delete")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(changes === Seq(3L, 7L, 20L))
  }

  test("file-level pruning: commits whose stats band misses every key " +
      "are carried into the new manifest verbatim (same FileEntry), " +
      "and a no-overlap delete publishes nothing") {
    val vt = fresh(statsCols = Seq("doc_id"))
    // three key-clustered single-file commits, the ingest norm
    vt.commit((1L to 10L).map(i => (i, s"a$i")).toDF("doc_id", "text")
      .coalesce(1))
    vt.commit((11L to 20L).map(i => (i, s"b$i")).toDF("doc_id", "text")
      .coalesce(1))
    vt.commit((21L to 30L).map(i => (i, s"c$i")).toDF("doc_id", "text")
      .coalesce(1))
    val before = vt.readManifest(vt.currentVersion.get).files
    val v = vt.deleteKeys("doc_id", Seq(15L))
    val after = vt.readManifest(v).files
    // the commit-1 and commit-3 entries survive IDENTICALLY (path,
    // commit dir, stats) — they were never read, let alone rewritten
    val untouchedBefore = before.filter(f =>
      f.stats("doc_id")._2.toLong < 11L || f.stats("doc_id")._1.toLong > 20L)
    assert(untouchedBefore.nonEmpty)
    assert(untouchedBefore.forall(after.contains))
    // the middle commit's entries were replaced
    assert(!before.forall(after.contains))
    assert(vt.read().count() === 29L)
    // keys hitting no file's band: no new version
    assert(vt.deleteKeys("doc_id", Seq(999L)) === v)
  }

  test("txnId idempotence: replaying a committed delete is a no-op") {
    val vt = fresh(statsCols = Seq("doc_id"))
    vt.commit((1L to 5L).map(i => (i, i * 10L)).toDF("doc_id", "v"))
    val v = vt.deleteKeys("doc_id", Seq(2L), txnId = Some("take-1"))
    assert(vt.deleteKeys("doc_id", Seq(2L), txnId = Some("take-1")) === v)
    assert(vt.read().count() === 4L)
  }

  test("NULL-keyed rows in a touched file survive the rewrite: the " +
      "keep-predicate is NOT-isin OR isNull, not bare NOT-isin (which " +
      "is NULL, hence dropped, on NULL keys)") {
    val vt = fresh(statsCols = Seq("doc_id"))
    // one file holding keyed rows AND a NULL-keyed row: no stats band
    // covers NULL, so the file is conservatively touched by any delete
    vt.commit(Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"),
      (null, "orphan")).toDF("doc_id", "text").coalesce(1))
    vt.deleteKeys("doc_id", Seq(1L))
    val rows = vt.read().select($"doc_id", $"text")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(rows === Set((Some(2L), "b"), (None, "orphan")))
  }

  test("guards: empty and NULL key lists are rejected") {
    val vt = fresh()
    vt.commit(Seq((1L, "x")).toDF("doc_id", "text"))
    intercept[IllegalArgumentException](vt.deleteKeys("doc_id", Seq.empty))
    intercept[IllegalArgumentException](
      vt.deleteKeys("doc_id", Seq(1L, null)))
  }
}
