package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.NearDup
import graft.store.VersionedTable

/** The bus seam composed with a STANDING winnowing-fingerprint index
  * (the q168 selected set as the per-batch extraction inside the
  * offset-fenced sink — the [[PositionalIngestSpec]] pattern on the
  * fifth index family): winnowing windows never cross documents, so
  * per-batch selection over the delta equals whole-corpus selection
  * restricted to the batch, replays dedup through the fence, and the
  * grown store serves the q168 match report exactly like a fresh
  * corpus pass.
  */
class WinnowingIngestSpec extends SparkSpec {
  import spark.implicits._

  test("exactly-once winnowing ingest under overlapping deliveries; " +
      "grown selected-fp store == fresh whole-corpus selection and " +
      "serves the q168 report identically") {
    val docs = Tables.load(spark, sf, "documents").limit(300)
      .localCheckpoint(true)
    val wire = WireFixtures
      .wireOf(docs, "doc_id", Seq("doc_id", "text")).cache()
    val n = wire.count()

    val parseSelect: DataFrame => DataFrame = df =>
      NearDup.winnowedFingerprints(
        WireFixtures.parsePayload(df, "doc_id BIGINT, text STRING"))

    val table = new VersionedTable(
      spark, Files.createTempDirectory("win-ingest").toString)
    val sink = new OffsetTrackedSink(table, "winnowing")
    val cut1 = n / 3
    val cut2 = 2 * n / 3
    sink.commitBatch(wire.filter($"offset" <= cut1), parseSelect)
    sink.commitBatch(wire.filter($"offset" <= cut2), parseSelect) // replay
    sink.commitBatch(wire.filter($"offset" > cut2 - 1), parseSelect)

    val landed = table.read().select($"doc_id", $"fp")
    val fresh = NearDup.winnowedFingerprints(docs)
    // per-doc selection: the grown store IS the fresh selection —
    // replays absorbed by the fence, no doc selected twice
    assert(landed.as[(Long, Long)].collect().toSet ===
      fresh.as[(Long, Long)].collect().toSet)

    def rows(df: DataFrame) = df.as[(Long, Long, Long)].collect().toSeq
    assert(rows(NearDup.winnowingPairsFromSelected(landed, minShared = 2L))
      === rows(NearDup.winnowingPairsFromSelected(fresh, minShared = 2L)))
  }
}
