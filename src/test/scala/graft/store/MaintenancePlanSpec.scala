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
