package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{GraphRank, HtmlExtract}
import graft.sources.{EventSource, OffsetTrackedSink}
import graft.store.VersionedTable

/** Incremental GRAPH maintenance soak (VERDICT r10 #8): the q101
  * standing-index pattern applied to the link-graph family. Pages
  * arrive as wire batches through the bus; each batch rides the
  * offset-fenced exactly-once landing, its links are extracted from
  * the batch DELTA only (never the history), and the raw edge
  * occurrences append to a standing edge store. Two claims no
  * single-batch spec proves:
  *
  *  1. AMORTIZED O(batch): per-batch cost (ingest → delta → extract →
  *     append) stays flat across 20 batches — link extraction is a
  *     pure projection and the append never re-reads the store, so
  *     nothing scales with history.
  *  2. CONVERGENCE under the frozen rank contract: PageRank (fixed
  *     damping ×17/20, fixed 5 iterations — the q114 contract) over
  *     the grown edge store is EXACTLY the rank over a fresh
  *     whole-corpus extraction, for both the plain and the
  *     dangling-mass-redistributing form. Rank itself is a global
  *     computation run ON the standing store — the incremental part
  *     is the store, exactly like postings (q103) and IVF cells
  *     (q101).
  */
class GraphIngestSoakSpec extends SparkSpec {
  import spark.implicits._

  private val NBatches = 20
  private val DocsPerBatch = 25

  /** Deterministic batch pages: each doc links via the q113/q114
    * fixture rule (two or three targets, multiplicity for even ids)
    * over a 500-doc id universe, so cross-batch links point at docs
    * from other batches — the graph genuinely GROWS connected.
    */
  private def batchPages(b: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(3000L + b)
    (0 until DocsPerBatch).map { i =>
      val id = (b.toLong * DocsPerBatch) + i
      (id, Array.fill(6 + rnd.nextInt(6))(s"t${rnd.nextInt(9)}").mkString(" "))
    }
  }

  /** Wire value = the rendered page; the soak extracts from markup
    * exactly as production would.
    */
  private def renderedBatch(b: Int): DataFrame =
    batchPages(b).toDF("doc_id", "text")
      .select($"doc_id",
        HtmlExtract.syntheticLinkedHtml($"doc_id", $"text").as("html"))

  /** Link extraction over (doc_id, html): raw edge OCCURRENCES
    * (src, dst) — multiplicity preserved as row count; the rank's own
    * groupBy-sum aggregates. Targets parse from the href; the id
    * universe is closed by the fixture (mod 500), so no existence
    * probe against the landed history is needed — per-batch work
    * stays strictly O(batch).
    */
  private def extractEdges(pages: DataFrame): DataFrame =
    HtmlExtract.extractLinks(pages)
      .select($"doc_id".as("src"),
        regexp_extract($"href", "/doc/([0-9]+)", 1).cast("long").as("dst"))
      .filter($"dst".isNotNull)

  test("20 link batches: flat per-batch cost; grown-store rank == fresh rank") {
    val dropDir = Files.createTempDirectory("gsoak-bus").toString
    val checkpoint = Files.createTempDirectory("gsoak-cp").toString
    val landing = new VersionedTable(
      spark, Files.createTempDirectory("gsoak-landing").toString)
    val edgeDir = Files.createTempDirectory("gsoak-edges").toString
    val sink = new OffsetTrackedSink(landing, "gsoak")
    val parse: DataFrame => DataFrame = df => df.selectExpr(
      "cast(key as bigint) as doc_id", "value as html")

    val wall = new Array[Double](NBatches)
    var lastVersion = -1L
    for (b <- 0 until NBatches) {
      val t0 = System.nanoTime()
      renderedBatch(b)
        .select(lit(0).as("partition"), $"doc_id".as("offset"),
          expr("timestamp_micros(doc_id * 1000000)").as("ts"),
          $"doc_id".cast("string").as("key"), $"html".as("value"))
        .write.mode("append").parquet(dropDir)
      EventSource.runIngest(
        new EventSource.FileEventSource(dropDir), spark, sink,
        checkpoint, transform = parse).awaitTermination()
      // the batch DELTA only — the edge append never re-reads history
      val delta = (if (lastVersion < 0L) landing.read()
        else landing.changesSince(lastVersion).drop("change_type"))
        .select($"doc_id", $"html")
      lastVersion = landing.currentVersion.get
      extractEdges(delta).write.mode("append").parquet(edgeDir)
      wall(b) = (System.nanoTime() - t0) / 1e9
    }

    // ---- flatness: no O(history) creep -----------------------------
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val mid = median(wall.slice(5, 10).toSeq)
    val tail = median(wall.slice(NBatches - 5, NBatches).toSeq)
    info(f"per-batch wall: mid-5 median $mid%.2f s, last-5 median $tail%.2f s")
    assert(tail <= mid * 2.0,
      s"per-batch cost crept: $mid s -> $tail s " +
        s"(raw: ${wall.map(w => f"$w%.2f").mkString(",")})")

    // ---- exactly-once landing --------------------------------------
    assert(landing.read().count() === (NBatches * DocsPerBatch).toLong)

    // ---- convergence under the frozen rank contract -----------------
    val grown = spark.read.parquet(edgeDir)
      .groupBy($"src", $"dst").agg(count(lit(1)).as("wt"))
    val fresh = extractEdges(landing.read().select($"doc_id", $"html"))
      .groupBy($"src", $"dst").agg(count(lit(1)).as("wt"))
    // the stores themselves agree (multiplicity included) …
    assert(grown.exceptAll(fresh).isEmpty && fresh.exceptAll(grown).isEmpty,
      "grown edge store must equal fresh whole-corpus extraction")
    // … and so do the ranks, plain and redistributing (the fixture's
    // id universe is mod 500 but only 500 docs land across batches —
    // targets of never-landed ids are rank vertices with no out-edge,
    // i.e. genuine sinks for the redistributing form)
    for (redis <- Seq(false, true)) {
      val a = GraphRank.pageRankTicksDirected(grown, iters = 5, redis)
      val c = GraphRank.pageRankTicksDirected(fresh, iters = 5, redis)
      assert(a.exceptAll(c).isEmpty && c.exceptAll(a).isEmpty,
        s"rank divergence (redistribute=$redis)")
    }
  }
}
