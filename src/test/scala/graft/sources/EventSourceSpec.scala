package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.store.VersionedTable

/** The bus-source seam's exactly-once contract: per-partition offset
  * high-water marks live in the sink's txn ids, and replayed offsets
  * are dropped ROW-WISE — so idempotence holds across arbitrary
  * micro-batch RE-SPLITS, not just same-boundary redelivery (the
  * stronger contract batch-id fencing cannot give).
  */
class EventSourceSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable = new VersionedTable(
    spark, Files.createTempDirectory("bus").toString)

  private def wire(rows: Seq[(Int, Long)]) =
    rows.map { case (p, o) => (p, o, o * 1000000L, s"k$o", s"v$p-$o") }
      .toDF("partition", "offset", "ts_us", "key", "value")
      .selectExpr("partition", "offset", "timestamp_micros(ts_us) as ts",
        "key", "value")

  private def committed(t: VersionedTable): Set[(Int, Long)] =
    t.read().select("partition", "offset").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet

  test("offset replay across RE-SPLIT micro-batches commits each offset exactly once") {
    val t = freshTable
    val sink = new OffsetTrackedSink(t, "s1")
    // first delivery: p0 offsets 0-6 in one batch
    assert(sink.commitBatch(wire((0L to 6L).map(o => 0 -> o))).nonEmpty)
    // checkpoint lost; redelivery re-splits 0-9 as (0-4)(3-9):
    // overlapping, different boundaries
    sink.commitBatch(wire((0L to 4L).map(o => 0 -> o)))
    sink.commitBatch(wire((3L to 9L).map(o => 0 -> o)))
    assert(committed(t) == (0L to 9L).map(o => (0, o)).toSet)
    assert(t.read().count() == 10, "no duplicate rows from the overlap")
  }

  test("a fully-replayed batch is a no-op (crash between commit and checkpoint)") {
    val t = freshTable
    val sink = new OffsetTrackedSink(t, "s1")
    val v = sink.commitBatch(wire(Seq(0 -> 0L, 0 -> 1L, 1 -> 0L)))
    assert(v.nonEmpty)
    assert(sink.commitBatch(wire(Seq(0 -> 0L, 0 -> 1L, 1 -> 0L))).isEmpty)
    assert(t.currentVersion.get == v.get, "replay must not publish a version")
    assert(t.read().count() == 3)
  }

  test("marks advance independently per partition (Kafka's order contract)") {
    val t = freshTable
    val sink = new OffsetTrackedSink(t, "s1")
    sink.commitBatch(wire(Seq(0 -> 5L, 1 -> 2L)))
    // p1-only batch advances p1's mark; p0's fence stays at 5
    sink.commitBatch(wire(Seq(1 -> 3L)))
    assert(sink.committedMarks() == Map(0 -> 5L, 1 -> 3L))
    // a p0 replay at-or-below 5 drops; above 5 commits
    sink.commitBatch(wire(Seq(0 -> 5L, 0 -> 6L)))
    assert(committed(t) == Set(0 -> 5L, 1 -> 2L, 1 -> 3L, 0 -> 6L))
  }

  test("marks recover from the manifests alone (fresh sink instance)") {
    val t = freshTable
    new OffsetTrackedSink(t, "s1").commitBatch(wire(Seq(0 -> 7L, 1 -> 1L)))
    // interleaved non-bus commit must not disturb mark recovery
    t.commit(wire(Seq(9 -> 99L)), txnId = Some("other.writer"))
    val recovered = new OffsetTrackedSink(t, "s1")
    assert(recovered.committedMarks() == Map(0 -> 7L, 1 -> 1L))
    assert(recovered.commitBatch(wire(Seq(0 -> 7L))).isEmpty)
  }

  test("two live sinks on one streamId cannot double-commit (dual-writer fence)") {
    // the crashed-driver restart race: sink A (the old driver) and sink
    // B (the restarted one) are both live with warm caches. A commits;
    // B's cache no longer reflects the table — the fence must detect
    // the foreign mark and re-scan instead of trusting the stale cache.
    val t = freshTable
    val a = new OffsetTrackedSink(t, "s1")
    val b = new OffsetTrackedSink(t, "s1")
    // both warm their caches before any commit
    assert(a.committedMarks().isEmpty && b.committedMarks().isEmpty)
    assert(a.commitBatch(wire((0L to 4L).map(o => 0 -> o))).nonEmpty)
    // B's next batch overlaps A's commit; a stale-cache B would fence
    // against {} and re-commit offsets 0-4
    assert(b.commitBatch(wire((0L to 6L).map(o => 0 -> o))).nonEmpty)
    assert(committed(t) == (0L to 6L).map(o => (0, o)).toSet)
    assert(t.read().count() == 7, "no offset may commit twice across sinks")
    // and the other direction: A (now the stale one) replays fully
    assert(a.commitBatch(wire((0L to 6L).map(o => 0 -> o))).isEmpty)
    assert(t.read().count() == 7)
    // marks agree from both instances after the dance
    assert(a.committedMarks() == Map(0 -> 6L))
    assert(b.committedMarks() == Map(0 -> 6L))
  }

  test("the fence re-scan folds a foreign sink's marks into the union") {
    val t = freshTable
    val a = new OffsetTrackedSink(t, "s1")
    val b = new OffsetTrackedSink(t, "s1")
    assert(b.committedMarks().isEmpty) // warm B's cache
    a.commitBatch(wire(Seq(0 -> 3L)))       // A advances p0
    b.commitBatch(wire(Seq(1 -> 5L)))       // B advances p1 — must re-scan
    b.commitBatch(wire(Seq(0 -> 2L, 0 -> 4L, 1 -> 4L))) // p0≤3 and p1≤5 fenced
    assert(committed(t) == Set(0 -> 3L, 1 -> 5L, 0 -> 4L))
  }

  test("transform commits parsed rows while the fence stays on wire offsets") {
    val t = freshTable
    val sink = new OffsetTrackedSink(t, "s1")
    // wire value is "v<p>-<o>"; the parse keeps typed columns only
    def parseAmount(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("offset as purchase_id", "ts as purchase_timestamp",
        "cast(regexp_extract(value, '([0-9]+)$', 1) as double) as amount")
    assert(sink.commitBatch(wire((0L to 4L).map(o => 0 -> o)), parseAmount).nonEmpty)
    // replay re-split with overlap: fence drops 0-4, commits 5-7 parsed
    sink.commitBatch(wire((2L to 7L).map(o => 0 -> o)), parseAmount)
    val got = t.read().collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got.keySet == (0L to 7L).toSet, "each offset exactly once, parsed")
    assert(got(7L) == 7.0, "parsed amount from wire value")
    assert(t.read().columns.toSeq ==
      Seq("purchase_id", "purchase_timestamp", "amount"))
  }

  test("negative partition/offset fails the batch loudly (mark-codec guard)") {
    val sink = new OffsetTrackedSink(freshTable, "s1")
    val e = intercept[IllegalArgumentException](
      sink.commitBatch(wire(Seq(0 -> -1L))))
    assert(e.getMessage.contains("negative"))
  }

  test("end-to-end: MemoryEventSource through runIngest drains into the table") {
    implicit val sqlCtx = spark.sqlContext
    val t = freshTable
    val sink = new OffsetTrackedSink(t, "bus")
    val src = new EventSource.MemoryEventSource(
      MemoryStream[(Int, Long, Long, String, String)])
    src.input.addData((0, 0L, 0L, "k0", "a"), (0, 1L, 1000000L, "k1", "b"),
      (1, 0L, 0L, "k2", "c"))
    val cp = Files.createTempDirectory("bus-cp").toString
    EventSource.runIngest(src, spark, sink, cp, Trigger.AvailableNow())
      .awaitTermination()
    assert(committed(t) == Set(0 -> 0L, 0 -> 1L, 1 -> 0L))
    assert(t.read().columns.toSeq ==
      Seq("partition", "offset", "ts", "key", "value"))
    // second run over the SAME drained stream from a fresh checkpoint:
    // the bus redelivers everything, the sink fences every row
    val cp2 = Files.createTempDirectory("bus-cp2").toString
    EventSource.runIngest(src, spark, sink, cp2, Trigger.AvailableNow())
      .awaitTermination()
    assert(t.read().count() == 3)
  }

  test("a foreign commit inside the fence window: overlap raises the dual-writer alarm, cache repairs forward") {
    // the residual overlap window itself (probe→publish), driven via
    // the afterFence test seam: a foreign sink commits the same
    // offsets INSIDE the victim's window. The duplicates in history
    // are the documented race cost — but they must be LOUD (alarm),
    // and the victim's cache must fold the foreign marks so
    // exactly-once holds from the very next batch.
    val t = freshTable
    val foreign = new OffsetTrackedSink(t, "s1")
    var invade: () => Unit = () => ()
    val victim = new OffsetTrackedSink(t, "s1") {
      override protected def afterFence(): Unit = { invade(); invade = () => () }
    }
    assert(victim.commitBatch(wire(Seq(0 -> 0L))).nonEmpty)
    foreign.committedMarks(): Unit // warm → will re-fence on its commit
    invade = () => foreign.commitBatch(wire(Seq(0 -> 1L, 0 -> 2L))): Unit
    val e = intercept[IllegalStateException](
      victim.commitBatch(wire(Seq(0 -> 1L, 0 -> 2L, 0 -> 3L))))
    assert(e.getMessage.contains("dual-writer overlap"))
    // offsets 1-2 are duplicated in history (the race cost, now loud);
    // 0 and 3 exactly once
    val byOffset = t.read().groupBy("offset").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byOffset == Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 1L))
    // forward repair: marks reflect the union, and the next batch
    // commits only genuinely-new offsets
    assert(victim.committedMarks() == Map(0 -> 3L))
    victim.commitBatch(wire(Seq(0 -> 3L, 0 -> 4L)))
    assert(t.read().filter("offset = 4").count() == 1)
    assert(t.read().filter("offset = 3").count() == 1, "no new duplicates")
  }

  test("a disjoint-partition foreign commit inside the window folds into the cache without an alarm") {
    // the stale-cache-forever hole: the foreign commit lands at a
    // version BELOW the victim's own publish, so after the victim
    // sets its fence watermark to its own (higher) version, a naive
    // cache would never see the foreign partition's marks again — and
    // a later redelivery of that partition would double-commit.
    val t = freshTable
    val foreign = new OffsetTrackedSink(t, "s1")
    var invade: () => Unit = () => ()
    val victim = new OffsetTrackedSink(t, "s1") {
      override protected def afterFence(): Unit = { invade(); invade = () => () }
    }
    assert(victim.commitBatch(wire(Seq(0 -> 0L))).nonEmpty)
    foreign.committedMarks(): Unit
    invade = () => foreign.commitBatch(wire(Seq(1 -> 0L, 1 -> 1L))): Unit
    // p0-only batch: the foreign p1 commit is disjoint — no alarm
    assert(victim.commitBatch(wire(Seq(0 -> 1L))).nonEmpty)
    assert(victim.committedMarks() == Map(0 -> 1L, 1 -> 1L),
      "foreign partition marks folded into the victim's cache")
    // the bus redelivers p1 0-1 (plus one new): only offset 2 commits
    victim.commitBatch(wire(Seq(1 -> 0L, 1 -> 1L, 1 -> 2L)))
    assert(committed(t) ==
      Set(0 -> 0L, 0 -> 1L, 1 -> 0L, 1 -> 1L, 1 -> 2L))
    assert(t.read().count() == 5, "no duplicate rows after the fold")
  }

  test("without a checkpoint, vacuum past the mark history un-fences old replays (the hazard)") {
    // the documented contract under test: vacuum forgets dropped
    // manifests' txn ids, so marks only reach back as far as retention
    val dir = Files.createTempDirectory("bus").toString
    val t = new VersionedTable(spark, dir)
    val sink = new OffsetTrackedSink(t, "s1")
    sink.commitBatch(wire(Seq(0 -> 0L, 0 -> 1L)))            // v0: marks
    t.commit(wire(Seq(9 -> 99L)), txnId = Some("w.a"))       // v1
    t.commit(wire(Seq(9 -> 98L)), txnId = Some("w.b"))       // v2
    t.vacuum(retain = 2, graceMs = 0L)                       // drops v0
    // the hazard is a RESTART hazard: a fresh table handle (new
    // driver) has no in-memory txn cache, so only the surviving
    // manifests fence — the same handle would still remember the
    // vacuumed txn id and dedup the replay
    val t2 = new VersionedTable(spark, dir)
    val recovered = new OffsetTrackedSink(t2, "s1")
    assert(recovered.committedMarks().isEmpty, "marks gone with v0")
    recovered.commitBatch(wire(Seq(0 -> 0L, 0 -> 1L)))       // replay re-commits
    assert(t2.read().filter("partition = 0").count() == 4, "duplicates — the hazard")
  }

  test("checkpointMarks makes the replay fence survive vacuum beyond the mark history") {
    val t = freshTable
    val sink = new OffsetTrackedSink(t, "s1")
    sink.commitBatch(wire(Seq(0 -> 0L, 0 -> 1L)))            // v0
    sink.commitBatch(wire(Seq(0 -> 2L, 1 -> 0L)))            // v1
    assert(sink.checkpointMarks().nonEmpty)                  // v2: marks re-record
    t.commit(wire(Seq(9 -> 99L)), txnId = Some("other.writer")) // v3
    // retention (2) reaches the checkpoint but NOT the original mark
    // manifests v0/v1 — the exact window the hazard test shows failing
    t.vacuum(retain = 2, graceMs = 0L)
    val recovered = new OffsetTrackedSink(t, "s1")
    assert(recovered.committedMarks() == Map(0 -> 2L, 1 -> 0L),
      "marks recovered from the checkpoint manifest alone")
    // data survives vacuum (the retained snapshot still references the
    // old commits' files), and a full replay stays fenced
    recovered.commitBatch(wire(Seq(0 -> 0L, 0 -> 1L, 0 -> 2L, 0 -> 3L)))
    assert(committed(t).filter(_._1 == 0) ==
      Set(0 -> 0L, 0 -> 1L, 0 -> 2L, 0 -> 3L))
    assert(t.read().filter("partition = 0").count() == 4, "no duplicates")
    // a checkpoint on a markless stream is a no-op
    assert(new OffsetTrackedSink(freshTable, "s9").checkpointMarks().isEmpty)
  }

  test("model: random redelivery/crash/dual-writer schedules commit each offset exactly once") {
    // the sink's whole claim, model-tested: an at-least-once bus
    // (per-partition in-order NEW offsets, arbitrary-depth contiguous
    // replay from at-most the delivered frontier — the Kafka consumer
    // restart shape), crashed-and-recovered sink instances, and an
    // alternating second live sink may interleave in any order, and
    // every delivered (partition, offset) still lands in the table
    // EXACTLY once. Complements the fixed-scenario specs above the
    // same way the vacuum model test complements its pointwise specs.
    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      val t = freshTable
      var main = new OffsetTrackedSink(t, "s1")
      val other = new OffsetTrackedSink(t, "s1")
      other.committedMarks(): Unit // warm the foreign cache → stale later
      // per-partition offset logs with random gaps (compacted-topic
      // shape), and the index up to which each has been delivered
      val logs: Map[Int, IndexedSeq[Long]] = (0 to 1).map { p =>
        p -> (1 to 30).scanLeft(0L)((o, _) => o + 1 + rnd.nextInt(3)).toIndexedSeq
      }.toMap
      val frontier = scala.collection.mutable.Map(0 -> 0, 1 -> 0)
      def deliver(sink: OffsetTrackedSink): Unit = {
        val batch = (0 to 1).filter(_ => rnd.nextInt(4) > 0).flatMap { p =>
          val log = logs(p)
          val d = frontier(p)
          val start = rnd.nextInt(d + 1)                   // replay depth
          val end = math.min(log.size, d + rnd.nextInt(5)) // new offsets
          frontier(p) = math.max(d, end)
          log.slice(start, end).map(o => p -> o) // end >= d >= start
        }
        if (batch.nonEmpty) sink.commitBatch(wire(batch)): Unit
      }
      for (step <- 1 to 12) {
        rnd.nextInt(6) match {
          case 0 => // crash: lose the instance, recover marks from manifests
            main = new OffsetTrackedSink(t, "s1")
          case 1 => // the other (stale-cached) sink delivers this batch
            deliver(other)
          case _ =>
            deliver(main)
        }
        // exactly-once invariant after every step
        val want = (0 to 1).flatMap(p =>
          logs(p).take(frontier(p)).map(o => p -> o)).toSet
        assert(committed(t) == want,
          s"seed=$seed step=$step: table != delivered frontier set")
        assert(t.read().count() == want.size,
          s"seed=$seed step=$step: duplicate rows")
      }
    }
  }

  test("FileEventSource reads a wire-shaped drop directory as a stream") {
    val t = freshTable
    val sink = new OffsetTrackedSink(t, "files")
    val dir = Files.createTempDirectory("bus-files").toString
    wire(Seq(0 -> 0L, 0 -> 1L)).write.mode("append").parquet(dir)
    val cp = Files.createTempDirectory("bus-files-cp").toString
    EventSource.runIngest(new EventSource.FileEventSource(dir), spark, sink, cp)
      .awaitTermination()
    // a second drop file with one replayed + one new offset
    wire(Seq(0 -> 1L, 0 -> 2L)).write.mode("append").parquet(dir)
    EventSource.runIngest(new EventSource.FileEventSource(dir), spark, sink,
      Files.createTempDirectory("bus-files-cp2").toString)
      .awaitTermination()
    assert(committed(t) == Set(0 -> 0L, 0 -> 1L, 0 -> 2L))
  }
}
