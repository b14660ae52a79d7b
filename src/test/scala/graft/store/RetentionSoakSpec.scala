package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Standing-retention soak: a store that ingests one day-clustered
  * commit per iteration and sweeps a sliding retention window after
  * each must stay O(window) — every sweep drops the aged-out files
  * WHOLE (zero rewrites while the cutoff aligns with commit
  * boundaries, the time-clustered ingest norm), the manifest's file
  * count stays bounded by the window, the snapshot always equals the
  * plain filter of everything ever ingested, and vacuum keeps the
  * DISK bounded too. One final misaligned sweep pins the other claim:
  * a mid-file cutoff rewrites exactly the one boundary file.
  */
class RetentionSoakSpec extends SparkSpec {
  import spark.implicits._

  test("12-sweep sliding-window retention: whole-file drops only, " +
      "bounded manifest, snapshot == filter; a misaligned cutoff " +
      "rewrites exactly one boundary file") {
    val root = Files.createTempDirectory("vt-soak").toString
    val vt = new VersionedTable(spark, root, statsCols = Seq("day"))
    val window = 5L // keep the last 5 day-batches
    var ingested = Seq.empty[(Long, String)]
    for (b <- 0L until 12L) {
      val batch = (b * 10 until (b + 1) * 10).map(d => (d, s"r$d"))
      ingested ++= batch
      vt.commit(batch.toDF("day", "text").coalesce(1))
      val cutoff = math.max(0L, (b - window + 1) * 10)
      val before = vt.readManifest(vt.currentVersion.get).files
      val v = vt.expireBefore("day", cutoff.toString)
      val after = vt.readManifest(v).files
      // aligned cutoff: every surviving file is carried VERBATIM —
      // no rewrites, aged-out files dropped whole
      assert(after.forall(before.contains),
        s"sweep $b rewrote a file despite an aligned cutoff")
      // bounded standing store: at most `window` one-file commits
      assert(after.size <= window,
        s"sweep $b manifest holds ${after.size} files")
      // snapshot == plain filter of everything ever ingested
      val want = ingested.filter(_._1 >= cutoff).sorted
      val got = vt.read().select($"day", $"text")
        .as[(Long, String)].collect().sorted.toSeq
      assert(got === want, s"sweep $b snapshot mismatch")
      // disk stays bounded as vacuum reclaims superseded versions
      vt.vacuum(retain = 1, graceMs = 0)
    }
    // misaligned sweep: cutoff mid-file — exactly one file rewritten,
    // the rest carried verbatim
    val before = vt.readManifest(vt.currentVersion.get).files
    val v = vt.expireBefore("day", "75")
    val after = vt.readManifest(v).files
    val rewritten = after.filterNot(before.contains)
    assert(rewritten.size === 1)
    assert(rewritten.head.stats("day")._1.toLong === 75L)
    assert(after.count(before.contains) === after.size - 1)
    assert(vt.read().select($"day").as[Long].collect().sorted.toSeq ===
      (75L until 120L).toSeq)
  }
}
