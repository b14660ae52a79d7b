package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Benchmark decontamination — flag training docs that share long
  * token n-grams with an evaluation/benchmark set, the standard
  * pre-training hygiene pass (n-gram overlap decontamination as
  * described in public LM training reports; 8-grams long enough that
  * chance collisions are negligible, short enough to catch partial
  * copies).
  *
  * Scale shape: both sides reduce to distinct-shingle postings
  * ([[NearDup.shingleHashSets]] — typed loop, 8-byte hashes), and the
  * overlap is one equi-join on the hash followed by a per-doc
  * partial+final agg. The benchmark side is usually tiny (eval sets
  * are MBs against a 100 TB corpus) so AQE broadcasts it; nothing in
  * the plan is all-pairs, and the corpus is touched exactly once.
  * Against a pathological benchmark with hot shingles, the same
  * df-cut used by [[NearDup.jaccardPairsDfCut]] applies.
  *
  * Reference scope: the reference pipeline has no decontamination
  * stage; this extends the curation family (`SURVEY.md` §2.13) for
  * the training-data use-case the engine targets.
  */
object Contamination {

  /** Corpus docs (doc_id % benchMod ≠ 0) sharing ≥ 1 distinct
    * n-gram with any benchmark doc (doc_id % benchMod = 0):
    * (doc_id, n_shared distinct shingles, n_bench_docs hit).
    *
    * `dfCut` is the postings-skew knob for adversarial benchmarks: a
    * shingle present in more than `dfCut` documents (across both
    * sides) is dropped from the index before the join — the same
    * stop-shingling as [[NearDup.jaccardPairsDfCut]]. This makes the
    * check approximate (overlap carried ONLY by ubiquitous n-grams
    * is missed — at n = 8 such n-grams are boilerplate, which
    * decontamination pipelines ignore anyway); q51's oracle contract
    * keeps the default ∞.
    */
  def contaminated(docs: DataFrame, n: Int = 8,
      benchMod: Long = 10L, dfCut: Int = Int.MaxValue): DataFrame = {
    import docs.sparkSession.implicits._
    val sets = NearDup.shingleHashSets(docs, n)
    val postings = sets.select($"doc_id", explode($"shs").as("sh"))
    val kept =
      if (dfCut == Int.MaxValue) postings
      else {
        val hot = postings.groupBy($"sh")
          .agg(count(lit(1)).as("df")) // sets are distinct per doc
          .filter($"df" > dfCut).select($"sh")
        postings.join(hot, Seq("sh"), "left_anti")
      }
    val bench = kept.filter($"doc_id" % benchMod === 0)
      .select($"doc_id".as("bench_id"), $"sh")
    val corpus = kept.filter($"doc_id" % benchMod =!= 0)
    corpus.join(bench, "sh")
      .groupBy($"doc_id")
      .agg(countDistinct($"sh").as("n_shared"),
        countDistinct($"bench_id").as("n_bench_docs"))
  }

  /** Serving shape: check arriving docs against a FIXED benchmark
    * shingle index — the stream-static form (fit the index once from
    * the eval sets, gate every ingest batch; no state, no corpus
    * re-read). `benchIndex` is `indexOf(benchDocs)`, persisted by a
    * real deployment like any artifact.
    */
  def indexOf(bench: DataFrame, n: Int = 8): DataFrame = {
    import bench.sparkSession.implicits._
    NearDup.shingleHashSets(bench, n)
      .select($"doc_id".as("bench_id"), explode($"shs").as("sh"))
  }

  /** Contamination of `batch` docs against a prebuilt bench index. */
  def contaminatedAgainst(benchIndex: DataFrame, batch: DataFrame,
      n: Int = 8): DataFrame = {
    import batch.sparkSession.implicits._
    NearDup.shingleHashSets(batch, n)
      .select($"doc_id", explode($"shs").as("sh"))
      .join(benchIndex, "sh")
      .groupBy($"doc_id")
      .agg(countDistinct($"sh").as("n_shared"),
        countDistinct($"bench_id").as("n_bench_docs"))
  }

  /** Q51 — 8-gram contamination of `documents` against the held-out
    * tenth (doc_id % 10 = 0) as the stand-in benchmark set.
    */
  def q51Contamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    contaminated(Tables.load(spark, dir, "documents"))
      .orderBy($"doc_id")
  }

  /** WITHIN-corpus duplicated n-gram profile — the cross-document
    * repetition diagnostic public LM data reports filter on (the
    * "fraction of a document's n-grams duplicated elsewhere" family;
    * q52 measures repetition INSIDE a doc, this measures it ACROSS
    * docs): per document, its distinct n-gram count, how many of
    * those n-grams also occur in ≥ 1 OTHER document, and the
    * duplicated fraction. High-dup_frac docs are boilerplate/template
    * copies that survive exact and even near dedup when padded.
    *
    * Scale shape: the inverted-index pattern end to end — distinct
    * 8-byte shingle hashes per doc (typed loop), explode to postings,
    * document frequency by one partial-agg'd shuffle on the hash, a
    * colocated postings⋈df equi-join (same key as the agg — the
    * exchange is reused), and a per-doc final agg. Nothing is
    * all-pairs and the corpus is scanned once; hot-shingle skew only
    * inflates one df row per shingle, not a pair explosion.
    */
  def duplicatedNgrams(docs: DataFrame, n: Int = 8): DataFrame = {
    import docs.sparkSession.implicits._
    val postings = NearDup.shingleHashSets(docs, n)
      .select($"doc_id", explode($"shs").as("sh"))
    val df = postings.groupBy($"sh")
      .agg(count(lit(1)).as("df")) // sets are distinct per doc → df
    postings.join(df, "sh")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"df" > 1L, 1L).otherwise(0L)).as("n_dup"))
      .select($"doc_id", $"n_grams", $"n_dup",
        round($"n_dup".cast("double") / $"n_grams", 6).as("dup_frac"))
  }

  /** Q88 — duplicated 8-gram rate per document over `documents`. */
  def q88DuplicatedNgrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    duplicatedNgrams(Tables.load(spark, dir, "documents"))
      .orderBy($"doc_id")
  }

  /** CROSS-SOURCE overlap matrix — the provenance diagnostic behind
    * "source B is mostly a re-crawl of source A": for every source
    * pair, how many distinct n-grams they share. Feeds source-level
    * dedup priority and mixture double-counting corrections (two
    * sources covering the same underlying text should not both get
    * full mixture weight).
    *
    * Scale shape: postings annotated with their doc's source (one
    * equi-join on doc_id — co-partitioned at scale), reduced to
    * DISTINCT (shingle, source) — so a shingle contributes one
    * posting per source no matter how many of that source's docs
    * repeat it — then a per-shingle source-pair self-join whose
    * fan-out is bounded by (|sources| choose 2) per shingle, NEVER
    * doc-pair-shaped: with s sources the worst shingle emits s²/2
    * rows, and |sources| is a catalog-sized constant.
    */
  def sourceOverlap(docs: DataFrame, n: Int = 8): DataFrame = {
    import docs.sparkSession.implicits._
    val srcPost = NearDup.shingleHashSets(docs, n)
      .select($"doc_id", explode($"shs").as("sh"))
      .join(docs.select($"doc_id", $"source"), "doc_id")
      .select($"sh", $"source").distinct()
    srcPost.select($"sh", $"source".as("src_a"))
      .join(srcPost.select($"sh", $"source".as("src_b")), "sh")
      .filter($"src_a" < $"src_b")
      .groupBy($"src_a", $"src_b")
      .agg(count(lit(1)).as("shared"))
  }

  /** Q95 — shared distinct 8-grams for every source pair. */
  def q95SourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sourceOverlap(Tables.load(spark, dir, "documents"))
      .orderBy($"src_a", $"src_b")
  }
}
