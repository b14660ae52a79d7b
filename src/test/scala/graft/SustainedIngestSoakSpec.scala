package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Retrieval, SpanDedup}
import graft.sources.{EventSource, OffsetTrackedSink}
import graft.store.VersionedTable

/** Sustained-ingest soak (VERDICT r9 #6): the standing-index claims
  * (offset-fenced landing, frozen span gate, BM25 postings, IVF
  * assignment) are each spec'd per batch elsewhere — this drives the
  * WHOLE chain through 40 consecutive micro-batches and proves two
  * things no single-batch spec can:
  *
  *  1. AMORTIZED O(batch): per-batch wall time stays flat — an
  *     accidental O(history) step (a full landing re-scan, a postings
  *     rebuild, a mark-recovery re-read that grows with versions)
  *     would make batch 35 several times batch 10; the median of the
  *     last ten batches must stay within noise of the middle ten.
  *  2. CONVERGENCE: after 40 batches, the incrementally-grown indexes
  *     answer EXACTLY like a fresh whole-corpus computation — same
  *     BM25 top-k from the appended postings, same IVF cells from
  *     per-batch assignment, exactly-once landing row count.
  *
  * Numbers from a representative run land in BASELINE.md ("Sustained
  * ingest soak").
  */
class SustainedIngestSoakSpec extends SparkSpec {
  import spark.implicits._

  private val NBatches = 40
  private val DocsPerBatch = 25
  private val N = 4 // span-gate n-gram width

  /** Deterministic batch text: small alphabet so the frozen gate has
    * real n-gram overlap to excise; doc 7 of every batch embeds a
    * verbatim benchmark span so the gate always has work.
    */
  private def batchDocs(b: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(9000L + b)
    (0 until DocsPerBatch).map { i =>
      val id = (b.toLong * DocsPerBatch) + i
      val toks = Array.fill(12 + rnd.nextInt(20))(s"w${rnd.nextInt(12)}")
      val text =
        if (i == 7) (toks.take(6) ++ Array("b0", "b1", "b2", "b3", "b4")
          ++ toks.drop(6)).mkString(" ")
        else toks.mkString(" ")
      (id, text)
    }
  }

  private def batchEmb(b: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7000L + b)
    (0 until DocsPerBatch).map { i =>
      ((b.toLong * DocsPerBatch) + i,
        Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    }
  }

  test("40 micro-batches: flat per-batch cost; final indexes == fresh scan") {
    val dropDir = Files.createTempDirectory("soak-bus").toString
    val checkpoint = Files.createTempDirectory("soak-cp").toString
    val landing = new VersionedTable(
      spark, Files.createTempDirectory("soak-landing").toString)
    val postingsDir = Files.createTempDirectory("soak-postings").toString
    val ivfDir = Files.createTempDirectory("soak-ivf").toString

    // frozen artifacts: the benchmark span-gate index and the IVF
    // quantizer — fit once, reused by every batch (the serving shape)
    val benchDocs = Seq((100000L,
      "x0 x1 b0 b1 b2 b3 b4 x2 x3 x4 x5 x6 x7 x8")).toDF("doc_id", "text")
    val gateIdx = SpanDedup.dupNgramIndex(benchDocs, N)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(gateIdx.count() > 0)
    val (_, model) = IvfIndex.buildPivots(
      batchEmb(-1).toDF("vec_id", "embedding"), nLists = 4)

    val sink = new OffsetTrackedSink(landing, "soak")
    val parse: DataFrame => DataFrame = df => df.selectExpr(
      "cast(key as bigint) as doc_id", "value as text")

    val wall = new Array[Double](NBatches)
    var lastVersion = -1L
    for (b <- 0 until NBatches) {
      val t0 = System.nanoTime()
      // 1. producer drops a wire file; the resident stream drains it
      //    (same checkpoint across batches — true incremental ingest)
      batchDocs(b).map { case (id, text) =>
        (0, id, id * 1000000L, id.toString, text)
      }.toDF("partition", "offset", "ts_us", "key", "value")
        .selectExpr("partition", "offset",
          "timestamp_micros(ts_us) as ts", "key", "value")
        .write.mode("append").parquet(dropDir)
      EventSource.runIngest(
        new EventSource.FileEventSource(dropDir), spark, sink,
        checkpoint, transform = parse).awaitTermination()
      // 2. the batch DELTA (never the history) rides the span gate
      val delta = (if (lastVersion < 0L) landing.read()
        else landing.changesSince(lastVersion).drop("change_type"))
        .select($"doc_id", $"text")
      lastVersion = landing.currentVersion.get
      val cleaned = SpanDedup
        .exciseAgainst(gateIdx, delta, N, minCount = Long.MaxValue)
        .select($"doc_id", $"kept_text".as("text"))
      // 3. standing-index appends: BM25 postings + IVF assignment
      Retrieval.docTermStats(cleaned)
        .write.mode("append").parquet(postingsDir)
      IvfIndex.assign(batchEmb(b).toDF("vec_id", "embedding"), model)
        .write.mode("append").parquet(ivfDir)
      wall(b) = (System.nanoTime() - t0) / 1e9
    }

    // ---- flatness: no O(history) creep -----------------------------
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val mid = median(wall.slice(10, 20).toSeq)
    val tail = median(wall.slice(NBatches - 10, NBatches).toSeq)
    info(f"per-batch wall: mid-10 median $mid%.2f s, last-10 median $tail%.2f s")
    assert(tail <= mid * 2.0,
      s"per-batch cost crept: mid median $mid s -> tail median $tail s " +
        s"(raw: ${wall.map(w => f"$w%.2f").mkString(",")})")

    // ---- exactly-once landing --------------------------------------
    assert(landing.read().count() === (NBatches * DocsPerBatch).toLong)

    // ---- convergence: incremental == fresh scan ---------------------
    // span gate ran per batch; a fresh gate over the whole landed
    // corpus must produce the same cleaned text (probe-only gate is
    // batch-decomposable by construction — prove it end-to-end)
    val allDocs = landing.read().select($"doc_id", $"text")
    val freshClean = SpanDedup
      .exciseAgainst(gateIdx, allDocs, N, minCount = Long.MaxValue)
      .select($"doc_id", $"kept_text".as("text"))
    // every batch-7 doc lost its planted benchmark span
    assert(freshClean.filter($"text".contains("b0 b1 b2 b3 b4")).isEmpty)
    val queries = Retrieval.prefixQueries(freshClean, mod = 11L, nTerms = 3)
    val fromIndex = Retrieval.bm25TopKFromIndex(
      spark.read.parquet(postingsDir), queries, k = 5)
    val fromScan = Retrieval.bm25TopK(freshClean, queries, k = 5)
    assert(fromIndex.exceptAll(fromScan).isEmpty &&
      fromScan.exceptAll(fromIndex).isEmpty,
      "incrementally-appended postings must answer like a fresh scan")
    // IVF: 40 appended assignments == one whole-corpus assignment
    val grownIvf = spark.read.parquet(ivfDir).select($"vec_id", $"cell")
    val allEmb = (0 until NBatches).flatMap(batchEmb)
      .toDF("vec_id", "embedding")
    val rebuilt = IvfIndex.assign(allEmb, model).select($"vec_id", $"cell")
    assert(grownIvf.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(grownIvf).isEmpty,
      "incrementally-assigned IVF cells must equal whole-corpus assignment")
    gateIdx.unpersist(): Unit
  }
}
