package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.SpanDedup
import graft.store.VersionedTable

/** Composition of the bus seam with the duplicated-span gate — the
  * 100 TB decontaminated-ingest story in one spec: wire-shaped JSON
  * docs → offset-fenced exactly-once commit (replay-safe across
  * overlapping deliveries) → span excision against a FROZEN benchmark
  * n-gram index inside the sink's post-fence transform → the landed
  * table holds exactly the cleaned corpus a batch run would produce.
  */
class SpanIngestSpec extends SparkSpec {
  import spark.implicits._

  test("exactly-once bus ingest lands span-excised docs; replays clean once") {
    val docs = Tables.load(spark, sf, "documents")
    val benchIdx = SpanDedup
      .dupNgramIndex(docs.filter($"doc_id" % 10 === 0))
      .localCheckpoint(true)
    val train = docs.filter($"doc_id" % 10 =!= 0)

    val wire = WireFixtures
      .wireOf(train, "doc_id", Seq("doc_id", "text")).cache()
    val n = wire.count()

    val parseExcise: DataFrame => DataFrame = df =>
      SpanDedup.exciseAgainst(benchIdx,
        WireFixtures.parsePayload(df, "doc_id BIGINT, text STRING"),
        n = 8, minCount = Long.MaxValue)

    val table = new VersionedTable(
      spark, Files.createTempDirectory("span-ingest").toString)
    val sink = new OffsetTrackedSink(table, "docs")
    // overlapping at-least-once deliveries the fence must absorb
    val cut1 = n / 3
    val cut2 = 2 * n / 3
    sink.commitBatch(wire.filter($"offset" <= cut1), parseExcise)
    sink.commitBatch(wire.filter($"offset" <= cut2), parseExcise)      // replays (0, cut1]
    sink.commitBatch(wire.filter($"offset" > cut2 - 1), parseExcise)   // replays one row
    val landed = table.read()
      .select($"doc_id", $"n_tokens", $"n_removed", $"kept_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq

    // exactly the batch decontamination-rewrite of the same split
    val want = SpanDedup
      .exciseAgainst(benchIdx, train, n = 8, minCount = Long.MaxValue)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(landed.size == want.size, "each doc landed exactly once")
    assert(landed == want)
    // and contamination really was removed on the wire path: at least
    // one doc lost tokens, and no kept_text still contains a bench
    // 8-gram (spot-check via the batch oracle having removed it too)
    assert(landed.exists(_._3 > 0L), "fixture has no contaminated doc")
  }
}
