package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.Retrieval
import graft.store.VersionedTable

/** Composition of the bus seam with the standing BM25 index — the
  * searchable-corpus ingest story: wire-shaped JSON docs →
  * offset-fenced exactly-once commit → per-doc postings extraction
  * ([[Retrieval.docTermStats]]) inside the sink's post-fence
  * transform → the landed postings table scores queries through
  * [[Retrieval.bm25TopKFromIndex]] exactly like a fresh scan of the
  * whole corpus would (df, N, and avgdl all derive from the grown
  * index — correct global BM25 semantics after every batch).
  */
class Bm25IngestSpec extends SparkSpec {
  import spark.implicits._

  test("exactly-once postings ingest; grown index scores like a corpus scan") {
    val docs = Tables.load(spark, sf, "documents")
    val wire = WireFixtures
      .wireOf(docs, "doc_id", Seq("doc_id", "text")).cache()
    val n = wire.count()

    val parseIndex: DataFrame => DataFrame = df =>
      Retrieval.docTermStats(
        WireFixtures.parsePayload(df, "doc_id BIGINT, text STRING"))

    val table = new VersionedTable(
      spark, Files.createTempDirectory("bm25-ingest").toString)
    val sink = new OffsetTrackedSink(table, "bm25")
    val cut1 = n / 3
    val cut2 = 2 * n / 3
    sink.commitBatch(wire.filter($"offset" <= cut1), parseIndex)
    sink.commitBatch(wire.filter($"offset" <= cut2), parseIndex)     // replay overlap
    sink.commitBatch(wire.filter($"offset" > cut2 - 1), parseIndex)  // replays one row

    val landed = table.read()
    // exactly one postings row set per doc despite the overlaps
    assert(landed.select($"doc_id").distinct().count() ==
      docs.count())
    assert(landed.count() ==
      Retrieval.docTermStats(docs).count())

    // the landed index answers queries identically to a corpus scan
    val queries = Retrieval.prefixQueries(docs).localCheckpoint(true)
    def rows(df: DataFrame) = df.orderBy($"query_id", $"rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(rows(Retrieval.bm25TopKFromIndex(landed, queries, k = 5)) ==
      rows(Retrieval.bm25TopK(docs, queries, k = 5)))
  }
}
