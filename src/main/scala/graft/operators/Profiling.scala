package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data-quality utilities for pipeline ingest: one-pass profiling and
  * deterministic stratified sampling.
  */
object Profiling {

  /** Q39 — one-pass profile of `events`: row/null counts and ranges.
    * All aggregates fold in a single partial+final pass — profiling
    * 100 TB costs one scan, not one scan per metric.
    */
  def q39Profile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .agg(
        count(lit(1)).as("n_rows"),
        count($"value").as("n_value"),
        count($"props").as("n_props"),
        min($"value").as("min_value"),
        max($"value").as("max_value"),
        min($"ts").as("min_ts"),
        max($"ts").as("max_ts"),
        countDistinct($"event_type").as("n_types"))
  }

  /** Q53 — exact per-source length quantiles over `documents`:
    * the distribution summary a curation pipeline thresholds on
    * (truncation budgets, length filters). `percentile` is the exact
    * linear-interpolation quantile — identical definition
    * ((n−1)·q rank) in Spark and DuckDB `quantile_cont`, computed on
    * exact BIGINT inputs, so the doubles agree; rounded to 6 as the
    * stable float contract. One partial+final agg pass; exact
    * quantiles hold sorted per-group state, so at 100 TB per-group
    * cardinality this switches to [[approxQuantiles]] (mergeable
    * fixed-size sketch, same call shape) — implemented below and
    * spec-bounded against the exact values.
    */
  def q53Quantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n"),
        round(avg($"n_chars"), 6).as("mean_chars"),
        round(percentile($"n_chars", lit(0.25)), 6).as("p25"),
        round(percentile($"n_chars", lit(0.5)), 6).as("p50"),
        round(percentile($"n_chars", lit(0.75)), 6).as("p75"),
        round(percentile($"n_chars", lit(0.9)), 6).as("p90"))
      .orderBy($"source")
  }

  /** The IMPLEMENTED 100 TB switch [[q53Quantiles]] documents: the
    * same per-source summary via `approx_percentile` — a mergeable
    * fixed-size sketch, so per-group state is O(accuracy) regardless
    * of group cardinality (exact `percentile` buffers the whole
    * group sorted). Guarantee: each returned value is an actual data
    * point whose rank is within n/accuracy of the target — the spec
    * checks that empirical-CDF bound against the exact quantiles.
    * Values are data points, not interpolations, so this is NOT the
    * q53 oracle contract — it is the scale form, spec-bounded.
    */
  def approxQuantiles(df: DataFrame, groupCol: String, valCol: String,
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9),
      accuracy: Int = 10000): DataFrame = {
    import df.sparkSession.implicits._
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        percentile_approx(col(valCol),
          typedLit(qs), lit(accuracy)).as("qv"))
      .select((Seq(col(groupCol), $"n") ++
        qs.indices.map(i => $"qv".getItem(i).as(s"q${(qs(i) * 100).round}"))): _*)
  }

  /** [[skewReport]]'s bounded-state 100 TB form: Misra–Gries
    * heavy-hitter counters ([[graft.functions.HeavyHittersAgg]])
    * instead of an exact per-key groupBy. The exact report shuffles
    * one row per DISTINCT key; the sketch's exchange carries ≤
    * k·partitions counters whatever the key cardinality, and still
    * guarantees every key with share > 1/(k+1) is present with its
    * count underestimated by at most n/(k+1) — exactly the keys the
    * salting decision needs. Returns (key, est) sorted hot-first.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int = 16): DataFrame = {
    import df.sparkSession.implicits._
    val hh = udaf(new graft.functions.HeavyHittersAgg(k),
      org.apache.spark.sql.Encoders.STRING)
    df.select(col(keyCol).cast("string").as("key"))
      .agg(hh($"key").as("hits"))
      .select(explode($"hits").as("h"))
      .select($"h.item".as("key"), $"h.est".as("est"))
  }

  /** Token-distribution DRIFT between a reference corpus and an
    * arriving batch — the ingest-monitoring gate that catches a
    * source changing under the pipeline (new crawler, new template,
    * language shift) before it pollutes training data. Per token,
    * the chi-square contribution of its (ref, new) count split
    * against the homogeneity expectation; the report is the top
    * contributors plus their counts.
    *
    * Determinism: inputs are exact integer counts; expectations and
    * contributions are a fixed dag of IEEE double ops on those
    * integers, so any engine computes identical bits and the
    * contribution ranking is engine-stable (the q90 argument, not
    * the float-sum trap: nothing here ACCUMULATES doubles).
    *
    * Shape: two partial-agg'd token counts, a full-outer merge on
    * token (a vanished or newborn token is exactly the signal),
    * 1-row totals broadcast, TakeOrdered for the report head.
    *
    * `contrib` is emitted UNROUNDED: rounding is the caller's
    * presentation contract, and ordering the report by a rounded
    * value can swap two tokens whose true contributions differ below
    * the rounding grain (callers re-sorting the head must sort the
    * unrounded value — q96 does). An empty side contributes expected
    * counts of 0 for the tokens it lacks; those terms are defined as
    * 0 (not 0/0) so a cold-start reference or an empty batch yields a
    * pure newborn/vanished report instead of NaN rows.
    */
  def tokenDrift(ref: DataFrame, cur: DataFrame, topK: Int = 20): DataFrame = {
    import ref.sparkSession.implicits._
    def counts(df: DataFrame, as: String) =
      df.select(explode(split(col("text"), " ", -1)).as("token"))
        .groupBy($"token").agg(count(lit(1)).as(as))
    val cr = counts(ref, "cnt_ref")
    val cn = counts(cur, "cnt_new")
    val merged = cr.join(cn, Seq("token"), "full_outer")
      .na.fill(0L, Seq("cnt_ref", "cnt_new"))
    // totals read the per-side count frames (their exchanges are
    // plan-reused), NOT the merged frame — summing over the
    // full-outer join would execute the vocab merge a second time
    val totals = cr.agg(sum($"cnt_ref").as("n_ref"))
      .crossJoin(cn.agg(sum($"cnt_new").as("n_new")))
    val withE = merged.crossJoin(broadcast(totals))
      .withColumn("rowt", $"cnt_ref" + $"cnt_new")
      .withColumn("e_ref",
        $"rowt".cast("double") * $"n_ref" / ($"n_ref" + $"n_new"))
      .withColumn("e_new",
        $"rowt".cast("double") * $"n_new" / ($"n_ref" + $"n_new"))
      .withColumn("contrib",
        when($"e_ref" > 0,
          ($"cnt_ref" - $"e_ref") * ($"cnt_ref" - $"e_ref") / $"e_ref")
          .otherwise(lit(0.0)) +
        when($"e_new" > 0,
          ($"cnt_new" - $"e_new") * ($"cnt_new" - $"e_new") / $"e_new")
          .otherwise(lit(0.0)))
    withE.orderBy($"contrib".desc, $"token").limit(topK)
      .select($"token", $"cnt_ref", $"cnt_new", $"contrib")
  }

  /** Q96 — drift report between the lower-half (reference) and
    * upper-half (arriving) documents, the q55/q91 split convention.
    * The final sort runs on the UNROUNDED contribution (the oracle
    * orders by the unrounded expression too — sorting the rounded
    * value could swap sub-grain neighbors); rounding is applied in
    * the projection after the sort.
    */
  def q96TokenDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val top = docs.agg(max($"doc_id")).head() // null on an empty corpus
    val cut = if (top.isNullAt(0)) 0L else (top.getLong(0) + 1L) / 2L
    tokenDrift(docs.filter($"doc_id" < cut), docs.filter($"doc_id" >= cut))
      .orderBy($"contrib".desc, $"token")
      .select($"token", $"cnt_ref", $"cnt_new",
        round($"contrib", 6).as("contrib"))
  }

  /** Pearson correlation from EXACT integer moments — the
    * deterministic form of `corr()` for integer-valued columns:
    * the five sufficient moments (Σx, Σy, Σxy, Σx², Σy²) are exact
    * decimal(38,0) sums (order-independent integer arithmetic — the
    * Spark twin of DuckDB's HUGEINT accumulator, exact to 38 digits ≈
    * 2¹²⁶), and the closed form is one fixed dag of double ops on
    * them — engine-identical bits, unlike the built-in's streaming
    * co-moment updates, whose result depends on accumulation order.
    * Emitted rounded as the stable float contract.
    *
    * Magnitude contract: every moment AND the closed form's cross
    * products (n·Σxy, Σx·Σy, …) stay exact while < 10³⁸ — a bound the
    * per-group row count times max|x·y| has to clear twice over, vs
    * the old Long form's 2⁶³ which silently WRAPPED (sqrt of a
    * wrapped-negative variance → NaN). Past 38 digits Spark's
    * non-ANSI decimal yields NULL (a visible failure, matching
    * DuckDB's overflow error in loudness, not a wrong number).
    */
  def pearsonExact(df: DataFrame, groupCol: String,
      xCol: String, yCol: String): DataFrame = {
    import df.sparkSession.implicits._
    val x = col(xCol).cast("decimal(38,0)")
    val y = col(yCol).cast("decimal(38,0)")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .withColumn("corr_xy", round(
        ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          (sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double")) *
           sqrt(($"n" * $"syy" - $"sy" * $"sy").cast("double"))), 6))
      .select(col(groupCol), $"n", $"corr_xy")
  }

  /** Q97 — per-source correlation between document length and
    * stopword count (the length/quality confound diagnostic).
    */
  def q97LengthStopCorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stops = Seq("the", "a", "an", "and", "of", "to", "in", "is",
      "on", "for")
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("n_stop", size(filter(split($"text", " ", -1),
        t => t.isInCollection(stops))))
    pearsonExact(docs, "source", "n_chars", "n_stop")
      .orderBy($"source")
  }

  /** Key-skew diagnostics — the report that decides the
    * [[Layout]] salting knob before a big join/agg: per-key counts
    * for the hottest keys plus their share of the table. One
    * partial+final agg then a global top-k (`TakeOrderedAndProject` —
    * k rows to the driver, never a sort); share is one division of
    * exact integers.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    import df.sparkSession.implicits._
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum($"cnt").as("total"))
    counts.crossJoin(broadcast(total))
      .select($"key", $"cnt",
        round($"cnt".cast("double") / $"total", 6).as("share"))
      .orderBy($"cnt".desc, $"key")
      .limit(topK)
  }

  /** Q62 — hottest event types with their table share. */
  def q62SkewHotkeys(spark: SparkSession, dir: String): DataFrame =
    skewReport(Tables.load(spark, dir, "events"), "event_type")

  /** Token-count histogram — the length-distribution profile that
    * sets truncation budgets and packing bin sizes. Fixed-width
    * buckets via integer division: one partial+final agg, share is a
    * division of exact integers against a broadcast 1-row total.
    */
  def tokenHistogram(docs: DataFrame, width: Int = 16): DataFrame = {
    import docs.sparkSession.implicits._
    val binned = docs
      .select(((size(TextStats.tokens($"text")) / width).cast("long")
        * width).as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("n"))
    val total = binned.agg(sum($"n").as("total"))
    binned.crossJoin(broadcast(total))
      .select($"bucket", $"n",
        round($"n".cast("double") / $"total", 6).as("share"))
  }

  /** Q64 — document token-count histogram, 16-token buckets. */
  def q64TokenHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tokenHistogram(Tables.load(spark, dir, "documents"))
      .orderBy($"bucket")
  }

  /** Exact decile binning by a score WITHOUT a global `ntile` — an
    * ntile window over the whole corpus funnels every row through one
    * reducer (the q16-r1 shape, but global). Instead: one agg pass
    * computes the 9 exact interpolated cut points (same (n−1)·q
    * definition in Spark `percentile` and DuckDB `quantile_cont`,
    * proven by q53); binning is then a per-row comparison against the
    * broadcast 1-row cuts — two scans, zero shuffles of the corpus,
    * and the same two-pass shape works at 100 TB (where the exact
    * percentile swaps for the mergeable `approx_percentile` sketch).
    * Bin k = 1 + #cuts strictly below the score; ties sit in the
    * lower bin in both engines because both compare the identical
    * rounded doubles.
    */
  def decileBins(scored: DataFrame, scoreCol: String): DataFrame = {
    import scored.sparkSession.implicits._
    val cutCols = (1 to 9).map(d =>
      round(percentile(col(scoreCol), lit(d / 10.0)), 6).as(s"c$d"))
    val cuts = scored.agg(cutCols.head, cutCols.tail: _*)
    val decile = (1 to 9).foldLeft(lit(1)) { (e, d) =>
      e + when(col(scoreCol) > col(s"c$d"), 1).otherwise(0)
    }
    scored.crossJoin(broadcast(cuts))
      .withColumn("decile", decile)
      .drop((1 to 9).map(d => s"c$d"): _*)
  }

  /** Q65 — quality-decile assignment over `documents` (the curriculum
    * / quality-binning step: train on top deciles first, or weight
    * bins differently). The score is quantized to 1e-6 BIGINT ticks
    * BEFORE the cuts: a rounded-double score can tie at the 7th digit
    * where Spark's decimal-string HALF_UP and DuckDB's binary
    * half-away disagree; integer ticks never tie against the
    * interpolated cut doubles ambiguously (the q53/q45 contract).
    */
  def q65QualityDeciles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        round(TextAnalysis.qualityScore($"text") * 1e6).cast("long")
          .as("quality_ticks"))
    decileBins(scored, "quality_ticks").orderBy($"doc_id")
  }

  /** Robust per-group outlier report via median absolute deviation —
    * the gate that survives the heavy-tailed value distributions a
    * mean/stddev z-score drowns in. Two agg passes (median, then MAD
    * of deviations) with the tiny per-group medians broadcast back;
    * a row is an outlier when |v − med| > k·MAD. Exact `percentile`
    * by default (`accuracy = 0`); `accuracy > 0` is the IMPLEMENTED
    * 100 TB switch — both medians come from the mergeable
    * `approx_percentile` sketch, so per-group agg state is
    * O(accuracy) instead of the whole group sorted. Sketch medians
    * are data points with rank within n/accuracy of n/2 (spec'd);
    * the outlier threshold shifts by at most that rank error.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0, accuracy: Int = 0): DataFrame = {
    import df.sparkSession.implicits._
    val g = col(groupCol)
    val v = col(valueCol)
    def med50(c: org.apache.spark.sql.Column) =
      if (accuracy > 0) percentile_approx(c, lit(0.5), lit(accuracy))
      else percentile(c, lit(0.5))
    val med = df.groupBy(g.as("g"))
      .agg(med50(v).cast("double").as("med"))
    val dev = df.join(broadcast(med), g === $"g").drop("g")
      .withColumn("adev", abs(v - $"med"))
    val mad = dev.groupBy(g.as("g"))
      .agg(med50($"adev").cast("double").as("mad"))
    dev.join(broadcast(mad), g === $"g").drop("g")
      .groupBy(g)
      .agg(count(lit(1)).as("n"),
        sum(when($"adev" > lit(k) * $"mad", 1L).otherwise(0L))
          .as("n_outliers"),
        round(max($"med") * 1e6).cast("long").as("med_ticks"),
        round(max($"mad") * 1e6).cast("long").as("mad_ticks"))
  }

  /** Q70 — MAD outlier audit of `events.value` per event type. */
  def q70OutlierMad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    madOutliers(Tables.load(spark, dir, "events"), "event_type", "value")
      .orderBy($"event_type")
  }

  /** Deterministic stratified sample: per-stratum fractions with a
    * fixed seed (`sampleBy` = per-row Bernoulli keyed on the stratum —
    * no shuffle, exact-fraction in expectation). Training pipelines
    * use this for class-balanced subsets; determinism makes reruns
    * reproducible.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Winsorize + robust min-max scale per group — the standard
    * outlier-safe feature normalization: clamp to the [lo, hi]
    * per-group percentiles, then scale the clamped value to [0, 1]
    * over that band. Group percentile cuts are one exact-percentile
    * agg broadcast back (the q65 decile shape — no global sort, no
    * per-group reducer over raw rows); everything after is per-row.
    *
    * Portability contract: the cuts are rounded to 6 dp BEFORE use,
    * so both clamp comparisons and the scale division see identical
    * operands in any engine; outputs are rounded to 6 dp. `accuracy
    * > 0` is the IMPLEMENTED 100 TB switch: the cuts come from the
    * mergeable `approx_percentile` sketch (per-group state
    * O(accuracy), not the group sorted) — cut values are data points
    * with rank within n/accuracy of the target (spec'd), and
    * everything downstream of the cuts is unchanged per-row math.
    */
  def winsorScale(df: DataFrame, groupCol: String, valCol: String,
      lo: Double = 0.05, hi: Double = 0.95, accuracy: Int = 0): DataFrame = {
    import df.sparkSession.implicits._
    val g = col(groupCol)
    val v = col(valCol)
    def pct(c: org.apache.spark.sql.Column, q: Double) =
      if (accuracy > 0) percentile_approx(c, lit(q), lit(accuracy))
      else percentile(c, lit(q))
    val cuts = df.groupBy(g.as("g"))
      .agg(round(pct(v, lo).cast("double"), 6).as("plo"),
        round(pct(v, hi).cast("double"), 6).as("phi"))
    df.join(broadcast(cuts), g === $"g").drop("g")
      .withColumn("w", least(greatest(v, $"plo"), $"phi"))
      .withColumn("winsorized", round($"w", 6))
      .withColumn("scaled",
        when($"phi" > $"plo",
          round(($"w" - $"plo") / ($"phi" - $"plo"), 6))
          .otherwise(lit(0.0)))
      .drop("w", "plo", "phi")
  }

  /** Q77 — winsorized + robust-scaled `events.value` per event type. */
  def q77WinsorScale(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    winsorScale(Tables.load(spark, dir, "events"), "event_type", "value")
      .select($"event_id", $"event_type", $"value", $"winsorized", $"scaled")
      .orderBy($"event_id")
  }

  /** GROUPED DISTINCT-COUNT SKETCH (KMV) — the cardinality sibling of
    * the `approx_percentile` switch above: exact `countDistinct`
    * shuffles one row per distinct value per group (unbounded at
    * 100 TB URL/user/token cardinality), while the
    * [[graft.functions.KmvDistinctAgg]] sketch's partial state is the
    * k smallest distinct values of the engine-portable
    * [[TextAnalysis.fingerprint]] hash — k longs per partition per
    * group on the exchange, whatever the true cardinality, and the
    * estimate is (k−1)·M div h₍ₖ₎ in exact integer arithmetic.
    *
    * Because the sketch state is a SET (order-independent), the
    * estimate is bit-identical under any partitioning or merge tree —
    * so unlike a float sketch it is DIRECTLY oracle-checkable, and
    * [[q136KmvDistinct]] also carries the exact count so every row
    * exhibits the real estimation error (spec'd ≤ ~3/√k relative).
    * Returns (group, n_exact, n_kept, kth_min, est_distinct).
    */
  /** KMV hash space: [1, 2³¹−1]. The polynomial fold alone clusters
    * on templated URL families (shared prefixes/suffixes shift the
    * fold structurally), so two Lehmer-LCG scramble steps mod the
    * Mersenne prime decorrelate it — every product stays < 2⁶³, so
    * the arithmetic is exact BIGINT on both engines.
    */
  private val KmvM = 2147483647L

  /** The sketch-only core: (grp, n_kept, kth_min, est_distinct). No
    * exact column — which is what lets the SAME call run as a
    * Structured Streaming complete-mode aggregation (`countDistinct`
    * is unsupported on streams for exactly the reason the sketch
    * exists: unbounded state); the set-typed buffer makes the
    * streamed estimate bit-identical to the batch one under any
    * micro-batch split (IngestOpsStreamingSpec).
    */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    import df.sparkSession.implicits._
    val sketch = udaf(new graft.functions.KmvDistinctAgg(k))
    val fp = TextAnalysis.fingerprint(col(valueCol))
    val h = lit(1L) +
      ((((fp * lit(48271L)) % KmvM) * lit(48271L)) % KmvM)
    df.select(col(groupCol).as("grp"), h.as("_h"))
      .groupBy($"grp")
      .agg(sketch($"_h").as("_kept"))
      .select($"grp",
        size($"_kept").cast("long").as("n_kept"),
        element_at($"_kept", -1).as("kth_min"))
      .withColumn("est_distinct",
        when($"n_kept" < k, $"n_kept")
          // (k−1)·M precomputed as a Long literal: the Int product
          // overflows under ANSI arithmetic
          .otherwise(expr(s"${(k - 1).toLong * KmvM}L div kth_min")))
  }

  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    import df.sparkSession.implicits._
    // exact count and sketch in ONE aggregation (r16 optimization):
    // the old two-agg + join shape scanned (and codegen'd) the value
    // expression chain twice — on q136 that chain is the full URL
    // canonicalization. The streaming path keeps [[kmvSketch]]
    // (countDistinct is unsupported on streams — the sketch's reason
    // to exist).
    val sketch = udaf(new graft.functions.KmvDistinctAgg(k))
    val fp = TextAnalysis.fingerprint(col(valueCol))
    val h = lit(1L) +
      ((((fp * lit(48271L)) % KmvM) * lit(48271L)) % KmvM)
    df.select(col(groupCol).as("grp"), col(valueCol).as("_v"),
        h.as("_h"))
      .groupBy($"grp")
      .agg(countDistinct($"_v").as("n_exact"),
        sketch($"_h").as("_kept"))
      .select($"grp", $"n_exact",
        size($"_kept").cast("long").as("n_kept"),
        element_at($"_kept", -1).as("kth_min"))
      .withColumn("est_distinct",
        when($"n_kept" < k, $"n_kept")
          .otherwise(expr(s"${(k - 1).toLong * KmvM}L div kth_min")))
  }

  /** Q136 — distinct canonical URLs per PUBLIC-SUFFIX class (the
    * domain tail after the registered domain's own label: `co.uk`,
    * `com.au`, `k12.ca.us`, `com`) estimated by a k=16 KMV sketch
    * next to the exact count — 4 groups of ~125 distinct URLs at
    * sf0.01, so the estimation path (not the exact-small-set path)
    * is what the oracle locks.
    */
  def q136KmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urls = UrlNorm.canonicalize(
        Tables.load(spark, dir, "documents")
          .select($"doc_id", UrlNorm.syntheticUrl($"doc_id").as("url")))
      .select(regexp_extract($"domain", "^[^.]+[.](.*)$", 1).as("suffix"),
        $"canonical_url")
    kmvDistinct(urls, "suffix", "canonical_url", k = 16)
      .select($"grp".as("suffix"), $"n_exact", $"n_kept", $"kth_min",
        $"est_distinct")
      .orderBy($"suffix")
  }

  /** DuckDB oracle for [[q136KmvDistinct]] — the canonicalization
    * chain, the shared fingerprint fold, then the k smallest distinct
    * hashes per group via one window (the oracle pays the full
    * shuffle the sketch exists to avoid); same estimate arithmetic.
    */
  def kmvOracleSql(k: Int = 16): String =
    s"""WITH u AS (SELECT doc_id, ${UrlNorm.syntheticUrlSql("doc_id")} AS url
       |   FROM documents),
       |${UrlNorm.canonCtesSql},
       | su AS (SELECT DISTINCT
       |     regexp_extract(domain, '^[^.]+\\.(.*)$$', 1) AS suffix,
       |     canonical_url
       |   FROM fin),
       | hs AS (SELECT DISTINCT suffix,
       |     1 + ((((${TextAnalysis.fingerprintSql("canonical_url")})
       |       * 48271) % $KmvM) * 48271) % $KmvM AS h
       |   FROM su),
       | rk AS (SELECT suffix, h,
       |     row_number() OVER (PARTITION BY suffix ORDER BY h) AS r
       |   FROM hs),
       | kp AS (SELECT suffix, count(*)::BIGINT AS n_kept,
       |     max(h)::BIGINT AS kth_min
       |   FROM rk WHERE r <= $k GROUP BY suffix),
       | ex AS (SELECT suffix, count(DISTINCT canonical_url)::BIGINT
       |     AS n_exact FROM su GROUP BY suffix)
       |SELECT ex.suffix, ex.n_exact, kp.n_kept, kp.kth_min,
       |  (CASE WHEN kp.n_kept < $k THEN kp.n_kept
       |   ELSE ${(k - 1).toLong * KmvM} // kp.kth_min END)::BIGINT
       |    AS est_distinct
       |FROM ex JOIN kp ON kp.suffix = ex.suffix
       |ORDER BY ex.suffix""".stripMargin

  // ---------------------------------------------------------------
  // COUNT-MIN frequency sketch (q140) — the point-frequency sibling
  // of the KMV sketch above: fixed d×w counter matrix, element-wise
  // additive merge, answers an (over)estimate for ANY probed item.
  // ---------------------------------------------------------------

  /** CMS hash space: the same Mersenne prime the KMV scramble uses. */
  private val CmsM = 2147483647L

  /** Cell index of base-hash column `h` in sketch row `i` — the
    * Column twin of `CountMinAgg.cell` (one formula, three texts:
    * Scala reduce, Catalyst Column, oracle SQL via [[cmsCellSql]]).
    * `h + i` < 2³¹ + depth and every product < 2⁶³: exact BIGINT.
    */
  private def cmsCell(h: Column, i: Int, width: Int): Column =
    ((((h + lit(i.toLong)) * lit(48271L)) % CmsM) * lit(48271L)) %
      CmsM % lit(width.toLong)

  /** The same cell formula as DuckDB SQL text (`i` is a SQL
    * expression so oracles can range-join over rows).
    */
  def cmsCellSql(h: String, i: String, width: Int): String =
    s"(((($h + $i) * 48271) % $CmsM) * 48271) % $CmsM % $width"

  /** One-pass CMS over `df(valueCol)` (string items): returns a
    * single-row DataFrame `(_cms: array<long>)` of the flattened
    * depth×width matrix. The exchange carries depth·width longs per
    * partition — at 100 TB token cardinality this replaces the
    * unbounded `groupBy(token).count()` shuffle for frequency
    * PROBES the way the KMV sketch replaces `countDistinct` for
    * cardinality. Additive merge ⇒ bit-identical under any
    * partitioning or merge tree (spec'd), and the SAME call runs as
    * a streaming complete-mode aggregation.
    */
  def cmsSketch(df: DataFrame, valueCol: String,
      depth: Int, width: Int): DataFrame = {
    val agg = udaf(new graft.functions.CountMinAgg(depth, width))
    df.select(TextAnalysis.fingerprint(col(valueCol)).as("_h"))
      .agg(agg(col("_h")).as("_cms"))
  }

  /** Probe the sketch for each row of `items(itemCol)`: adds
    * `cms_est = min over rows i of matrix[i·width + cellᵢ(h)]`. The
    * 1-row sketch rides a broadcast cross join; the probe is a pure
    * projection (depth `element_at`s + `least`) — zero shuffles.
    */
  def cmsProbe(items: DataFrame, itemCol: String, cms: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val h = TextAnalysis.fingerprint(col(itemCol))
    val est = least((0 until depth).map(i =>
      element_at(col("_cms"),
        (lit(i * width) + cmsCell(h, i, width) + lit(1L)).cast("int"))): _*)
    items.crossJoin(broadcast(cms))
      .withColumn("cms_est", est)
      .drop("_cms")
  }

  /** Q140 — CMS frontier-pressure probe: frequency estimates for the
    * exact top-`topN` link targets of the q113 link extraction, next
    * to their exact in-link counts so every row exhibits the real
    * (over)estimation error. This is the crawl-scheduler's "how hot
    * is this URL?" probe answered from a depth×width matrix instead
    * of the per-URL `groupBy(href).count()` shuffle (unbounded at
    * 100 TB frontier cardinality). depth×width is SMALL on purpose
    * (4×64 against 500 distinct targets, ~8 targets per cell per
    * row) so hash collisions are REAL and the overcount path — not a
    * trivially-exact sketch — is what the oracle locks.
    */
  def q140CmsHeavy(spark: SparkSession, dir: String,
      depth: Int = 4, width: Int = 64, topN: Int = 20): DataFrame = {
    import spark.implicits._
    val pages = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        HtmlExtract.syntheticLinkedHtml($"doc_id", $"text").as("html"))
    val hrefs = HtmlExtract.extractLinks(pages)
      .select($"href").filter($"href" =!= "")
    val top = hrefs.groupBy($"href").agg(count(lit(1)).as("n_exact"))
      .orderBy($"n_exact".desc, $"href".asc).limit(topN)
    cmsProbe(top, "href", cmsSketch(hrefs, "href", depth, width),
        depth, width)
      .select($"href", $"n_exact", $"cms_est")
      .orderBy($"n_exact".desc, $"href".asc)
  }

  /** DuckDB oracle for [[q140CmsHeavy]] — the oracle pays the full
    * per-target shuffle the sketch exists to avoid, computes every
    * cell of the matrix as a (row, cell)-grouped sum, then probes it
    * with the same shared cell formula and `min` over rows.
    */
  def cmsOracleSql(depth: Int = 4, width: Int = 64,
      topN: Int = 20): String =
    s"""WITH ${HtmlExtract.linkedCtesSql},
       | hr AS (SELECT unnest(list_transform(l,
       |       a -> regexp_extract(a, '${HtmlExtract.AnchorRe}', 1)))
       |     AS href FROM lk),
       | hf AS (SELECT href FROM hr WHERE href <> ''),
       | tc AS (SELECT href, count(*)::BIGINT AS n_exact
       |   FROM hf GROUP BY href),
       | hs AS (SELECT href, ${TextAnalysis.fingerprintSql("href")} AS h
       |   FROM (SELECT DISTINCT href FROM tc)),
       | cells AS (SELECT r.i,
       |     ${cmsCellSql("hs.h", "r.i", width)} AS cell,
       |     sum(tc.n_exact)::BIGINT AS cnt
       |   FROM tc JOIN hs USING (href) CROSS JOIN range($depth) AS r(i)
       |   GROUP BY 1, 2),
       | top AS (SELECT href, n_exact FROM tc
       |   ORDER BY n_exact DESC, href LIMIT $topN),
       | probe AS (SELECT top.href, top.n_exact, r.i,
       |     ${cmsCellSql("hs.h", "r.i", width)} AS cell
       |   FROM top JOIN hs USING (href) CROSS JOIN range($depth) AS r(i))
       |SELECT p.href, any_value(p.n_exact) AS n_exact,
       |  min(c.cnt) AS cms_est
       |FROM probe p JOIN cells c ON c.i = p.i AND c.cell = p.cell
       |GROUP BY p.href
       |ORDER BY n_exact DESC, href""".stripMargin
}
