package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.Retrieval
import graft.store.VersionedTable

/** Composition of the bus seam with the STANDING positional-postings
  * index (VERDICT r11 #2) — the phrase/proximity analogue of
  * [[Bm25IngestSpec]]: wire-shaped JSON docs → offset-fenced
  * exactly-once commit → per-doc positional-postings extraction
  * ([[Retrieval.positionalPostings]]) inside the sink's post-fence
  * transform → the landed `(doc_id, pos, th)` table serves phrase
  * (q145 contract) and proximity (q152 contract) queries through
  * `*FromIndex` exactly like a fresh corpus scan. Positional
  * extraction is per-document (no corpus statistics), so growth can
  * never shift already-landed docs' matches — the strongest form of
  * the standing-index equivalence.
  */
class PositionalIngestSpec extends SparkSpec {
  import spark.implicits._

  test("exactly-once positional-postings ingest; grown index answers " +
      "phrase and proximity like a corpus scan") {
    val docs = Tables.load(spark, sf, "documents")
    val wire = WireFixtures
      .wireOf(docs, "doc_id", Seq("doc_id", "text")).cache()
    val n = wire.count()

    val parseIndex: DataFrame => DataFrame = df =>
      Retrieval.positionalPostings(
        WireFixtures.parsePayload(df, "doc_id BIGINT, text STRING"))

    val table = new VersionedTable(
      spark, Files.createTempDirectory("pos-ingest").toString)
    val sink = new OffsetTrackedSink(table, "positional")
    // overlapping at-least-once deliveries the fence must absorb
    val cut1 = n / 3
    val cut2 = 2 * n / 3
    sink.commitBatch(wire.filter($"offset" <= cut1), parseIndex)
    sink.commitBatch(wire.filter($"offset" <= cut2), parseIndex)     // replay overlap
    sink.commitBatch(wire.filter($"offset" > cut2 - 1), parseIndex)  // replays one row

    val landed = table.read()
    // exactly one postings row set per doc despite the overlaps:
    // |postings| = corpus token count
    assert(landed.count() === Retrieval.positionalPostings(docs).count())
    assert(landed.select($"doc_id").distinct().count() === docs.count())

    val phrases = Retrieval.phraseQueries(docs).localCheckpoint(true)
    def rows(df: DataFrame) = df.orderBy($"query_id", $"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows(Retrieval.phraseSearchFromIndex(landed, phrases)) ===
      rows(Retrieval.phraseSearch(docs, phrases)))
    assert(rows(Retrieval.proximitySearchFromIndex(landed, phrases, 8)) ===
      rows(Retrieval.proximitySearch(docs, phrases, 8)))
  }

  /** Soak: per-batch ingest cost stays flat as the standing postings
    * store grows — extraction is a per-row generator over the batch
    * DELTA and the append never re-reads history, so nothing scales
    * with the corpus.
    */
  test("12 postings batches: flat per-batch cost; grown store == fresh extraction") {
    val NBatches = 12
    val DocsPerBatch = 30
    def batchDocs(b: Int): DataFrame = {
      val rnd = new scala.util.Random(7100L + b)
      (0 until DocsPerBatch).map { i =>
        val id = (b.toLong * DocsPerBatch) + i
        (id, Array.fill(8 + rnd.nextInt(8))(s"w${rnd.nextInt(23)}")
          .mkString(" "))
      }.toDF("doc_id", "text")
    }

    val table = new VersionedTable(
      spark, Files.createTempDirectory("pos-soak").toString)
    val sink = new OffsetTrackedSink(table, "pos-soak")
    val postDir = Files.createTempDirectory("pos-soak-idx").toString
    val parse: DataFrame => DataFrame = df =>
      WireFixtures.parsePayload(df, "doc_id BIGINT, text STRING")

    val wall = new Array[Double](NBatches)
    var lastVersion = -1L
    for (b <- 0 until NBatches) {
      val t0 = System.nanoTime()
      val wire = WireFixtures
        .wireOf(batchDocs(b), "doc_id", Seq("doc_id", "text"))
        .withColumn("offset", $"offset" + lit(b.toLong * DocsPerBatch))
      sink.commitBatch(wire, parse)
      // postings extract from the batch DELTA only, append-only store
      val delta = (if (lastVersion < 0L) table.read()
        else table.changesSince(lastVersion).drop("change_type"))
        .select($"doc_id", $"text")
      lastVersion = table.currentVersion.get
      Retrieval.positionalPostings(delta)
        .write.mode("append").parquet(postDir)
      wall(b) = (System.nanoTime() - t0) / 1e9
    }

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val mid = median(wall.slice(2, 7).toSeq)
    val tail = median(wall.slice(NBatches - 5, NBatches).toSeq)
    info(f"per-batch wall: early median $mid%.2f s, last-5 median $tail%.2f s")
    assert(tail <= mid * 2.0,
      s"per-batch cost crept: $mid s -> $tail s " +
        s"(raw: ${wall.map(w => f"$w%.2f").mkString(",")})")

    // grown store ≡ fresh whole-corpus extraction, and it serves
    // phrase queries identically
    val grown = spark.read.parquet(postDir)
    val corpus = table.read().select($"doc_id", $"text")
    assert(grown.count() === Retrieval.positionalPostings(corpus).count())
    val phrases = Retrieval
      .phraseQueries(corpus, mod = 7L, start = 2, len = 3)
      .localCheckpoint(true)
    def rows(df: DataFrame) = df.orderBy($"query_id", $"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows(Retrieval.phraseSearchFromIndex(grown, phrases)) ===
      rows(Retrieval.phraseSearch(corpus, phrases)))
  }
}
