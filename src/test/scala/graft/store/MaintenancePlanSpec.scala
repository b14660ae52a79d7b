package graft.store

import java.nio.file.Files

import graft.SparkSpec

/** [[VersionedTable.maintenancePlan]] — the maintenance advisor
  * (r13 VERDICT #6): a fragmented streaming tail recommends compact,
  * interleaved bands recommend a re-sort, superseded storage
  * recommends vacuum, and a compacted + vacuumed well-clustered
  * table reaches the EMPTY plan fixed point.
  */
class MaintenancePlanSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(statsCols: Seq[String] = Nil) = new VersionedTable(
    spark, Files.createTempDirectory("vtmaint").toString, statsCols)

  test("fragmented small-file tail recommends compact; running " +
      "compact clears it; the superseded dirs then recommend vacuum; " +
      "after vacuum the plan is empty") {
    val vt = fresh(statsCols = Seq("day"))
    // five KB-scale day-clustered single-file commits — the
    // streaming-ingest shape
    (0L until 5L).foreach { b =>
      vt.commit((b * 10 to b * 10 + 9).map(i => (i, s"d$i"))
        .toDF("day", "text").coalesce(1))
    }
    val p1 = vt.maintenancePlan(targetBytes = 1L << 20)
    assert(p1.map(_.action).contains("compact"))
    assert(p1.find(_.action == "compact").get.metric === 5L)
    // clustered, non-overlapping bands: no resort recommendation
    assert(!p1.exists(_.action == "resort"))

    vt.compact(1L << 20)
    // at vacuumRetain=1 the five folded commits are superseded
    // storage (the pre-compact manifest still references them, so
    // retain=2 correctly reports nothing reclaimable — the dry run
    // matches what vacuum at the same retain would do)
    val p2 = vt.maintenancePlan(targetBytes = 1L << 20, vacuumRetain = 1)
    assert(!p2.exists(_.action == "compact"))
    assert(p2.map(_.action) === Seq("vacuum"))
    assert(vt.maintenancePlan(targetBytes = 1L << 20, vacuumRetain = 2)
      .isEmpty)

    assert(vt.vacuum(retain = 1, graceMs = 0) >= 1)
    assert(vt.maintenancePlan(targetBytes = 1L << 20, vacuumRetain = 1)
      .isEmpty)
    // the data survived the whole maintenance cycle
    assert(vt.read().count() === 50L)
  }

  test("interleaved bands recommend a re-sort on the overlapping " +
      "column; a re-sorted replace clears it") {
    val vt = fresh(statsCols = Seq("day"))
    // four interleaved commits: every band spans [b, 27+b] — a point
    // lookup opens up to all four files (mean start depth 2.5)
    (0L until 4L).foreach { b =>
      vt.commit((b to 27L + b by 4L).map(i => (i, s"x$i"))
        .toDF("day", "text").coalesce(1))
    }
    val p = vt.maintenancePlan(targetBytes = 1L)
    val resort = p.filter(_.action == "resort")
    assert(resort.map(_.target) === Seq("day"))
    assert(resort.head.metric > resort.head.threshold)

    // the recommended fix: range-sorted rewrite, then reclaim
    vt.replace(vt.read().repartitionByRange(3, $"day")
      .sortWithinPartitions($"day"))
    vt.vacuum(retain = 1, graceMs = 0)
    val after = vt.maintenancePlan(targetBytes = 1L)
    assert(!after.exists(_.action == "resort"))
    assert(!after.exists(_.action == "vacuum"))
  }

  test("maintain() executes compact then vacuum off the plan and " +
      "reaches the empty fixed point; a clean table runs nothing") {
    val vt = fresh(statsCols = Seq("day"))
    (0L until 4L).foreach { b =>
      vt.commit((b * 10 to b * 10 + 9).map(i => (i, s"d$i"))
        .toDF("day", "text").coalesce(1))
    }
    val ran = vt.maintain(targetBytes = 1L << 20, vacuumRetain = 1,
      graceMs = 0)
    assert(ran.map(_.action).contains("compact"))
    assert(vt.read().count() === 40L)
    // compact ran, then its supersedure was NOT yet in that same
    // plan — one more pass vacuums it, the third is the fixed point
    vt.maintain(targetBytes = 1L << 20, vacuumRetain = 1, graceMs = 0)
    assert(vt.maintain(targetBytes = 1L << 20, vacuumRetain = 1,
      graceMs = 0).isEmpty)
    assert(vt.read().count() === 40L)
  }

  test("maintain(resortBy) executes an opted-in resort advisory as " +
      "ONE replace commit: clustering depth restores, the advisory " +
      "disappears, CDC sees the replace; a resortBy column with no " +
      "advisory does nothing (r14 verdict missing #8)") {
    val vt = fresh(statsCols = Seq("day"))
    (0L until 4L).foreach { b =>
      vt.commit((b to 27L + b by 4L).map(i => (i, s"x$i"))
        .toDF("day", "text").coalesce(1))
    }
    val before = vt.clusteringDepth("day")
    val plan0 = vt.maintenancePlan(targetBytes = 1L)
    assert(plan0.exists(a => a.action == "resort" && a.target == "day"))
    val v0 = vt.currentVersion.get

    // opting in executes the resort; compact (if advised) is subsumed
    val ran = vt.maintain(targetBytes = 1L, vacuumRetain = 1,
      graceMs = 0, resortBy = Seq("day"))
    assert(ran.exists(a => a.action == "resort" && a.target == "day"))
    assert(vt.read().count() === 28L) // nothing lost
    val after = vt.clusteringDepth("day")
    assert(after.meanStartDepthTicks < before.meanStartDepthTicks)
    assert(!vt.maintenancePlan(targetBytes = 1L)
      .exists(_.action == "resort"))
    // exactly one replace commit landed on top
    val newOps = ((v0 + 1) to vt.currentVersion.get)
      .map(v => vt.readManifest(v).op)
    assert(newOps === Seq("replace"))

    // no standing advisory -> resortBy is a no-op (advisory-driven)
    val v1 = vt.currentVersion.get
    val again = vt.maintain(targetBytes = 1L, vacuumRetain = 1,
      graceMs = 0, resortBy = Seq("day"))
    assert(!again.exists(_.action == "resort"))
    assert(vt.currentVersion.get === v1)

    // a non-stats column is a loud error, not a silent skip
    intercept[IllegalArgumentException] {
      vt.maintain(resortBy = Seq("text"))
    }
  }

  test("auditLog exposes every delete-class commit's evidence as one " +
      "ledger frame; appends contribute no rows and keys never appear") {
    val vt = fresh(statsCols = Seq("day"))
    vt.commit((1L to 20L).map(i => (i, s"d$i")).toDF("day", "text")
      .coalesce(1))
    vt.deleteKeys("day", Seq(3L, 4L), txnId = Some("takedown-7"))
    vt.expireBefore("day", "10", txnId = Some("sweep-1"))
    vt.updateRows("day", Seq(15L),
      m => m.withColumn("text", org.apache.spark.sql.functions.lit("x")))
    val log = vt.auditLog()
      .as[(Long, String, String, String, String)].collect().toSeq
    val ops = log.map(_._2).toSet
    assert(ops === Set("delete", "expire", "update"))
    // the delete's evidence: 2 keys, 2 rows removed, txn recorded
    val del = log.filter(_._2 == "delete")
    assert(del.forall(_._3 == "takedown-7"))
    assert(del.exists(r => r._4 == "key_count" && r._5 == "2"))
    assert(del.exists(r => r._4 == "rows_removed" && r._5 == "2"))
    val exp = log.filter(_._2 == "expire")
    assert(exp.exists(r => r._4 == "cutoff" && r._5 == "10"))
    assert(exp.exists(r => r._4 == "rows_removed" && r._5 == "7"))
    // the forgotten key values never enter the ledger
    assert(!log.exists(r => r._5 == "3" && r._4 != "key_count"))
  }

  test("empty store yields an empty plan; pure appends with no " +
      "superseded dirs never recommend vacuum") {
    val vt = fresh(statsCols = Seq("day"))
    assert(vt.maintenancePlan().isEmpty)
    (0L until 4L).foreach { b =>
      vt.commit(Seq((b * 100, s"v$b")).toDF("day", "text").coalesce(1))
    }
    // appends reference their ancestors' dirs: nothing is superseded,
    // so no vacuum recommendation even with versions beyond retain
    val p = vt.maintenancePlan(targetBytes = 1L)
    assert(!p.exists(_.action == "vacuum"))
  }
}
