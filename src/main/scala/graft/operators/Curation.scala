package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** End-to-end corpus curation — the composed filter a training-data
  * pipeline actually ships: language allowlist ∧ heuristic quality
  * threshold ∧ near-duplicate keeper. Each leg is an already-proven
  * operator (q22 quality, q18 pairs → q41 clusters); this query is
  * the composition contract, oracle-checked end-to-end (q44).
  *
  * Scale shape: the language/quality legs are per-row expressions on
  * the scan (no shuffle); the dedup leg anti-joins against the
  * non-keeper set — |dup-involved docs| rows, usually ≪ corpus but
  * corpus-PROPORTIONAL in the worst case, so the join is left
  * unhinted: AQE broadcasts it when it measures small and falls back
  * to a shuffle join when it doesn't (a forced broadcast here would
  * be the q24-r1 mistake at a heavily-duplicated 100 TB corpus).
  */
object Curation {

  val defaultLangs: Seq[String] = Seq("en", "de")
  val defaultMinQuality: Double = 0.5

  /** Docs surviving (lang ∈ allowlist) ∧ (quality ≥ τ) ∧ (not a
    * non-keeper of a near-dup cluster). Quality is rounded to 6
    * decimals BEFORE thresholding so the gate compares the same
    * number in any engine.
    *
    * `precomputedPairs`: the (doc_a, doc_b) near-dup pair set, when
    * the pipeline already built it (e.g. a session that also runs the
    * degree profile or cluster report) — `jaccardPairs` is the
    * expensive leg of the composition, so pay for it once. Defaults
    * to computing pairs from `docs` at `dupTau`; spec-checked that
    * curate(precomputed) ≡ curate() (CurationSpec).
    */
  def curate(docs: DataFrame, langs: Seq[String] = defaultLangs,
      minQuality: Double = defaultMinQuality,
      dupTau: Double = 0.5,
      precomputedPairs: Option[DataFrame] = None): DataFrame = {
    import docs.sparkSession.implicits._
    val pairs = precomputedPairs
      .map(_.select(col("doc_a"), col("doc_b")))
      .getOrElse(NearDup.jaccardPairs(docs, dupTau).select($"doc_a", $"doc_b"))
    val nonKeepers = DupClusters
      .connectedComponents(pairs)
      .filter($"id" =!= $"cluster_id")
      .select($"id".as("doc_id"))
    docs
      .withColumn("quality", round(TextAnalysis.qualityScore($"text"), 6))
      .filter($"lang".isin(langs: _*) && $"quality" >= minQuality)
      .join(nonKeepers, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"lang", $"quality", $"n_chars")
  }

  /** Q44 — curated corpus at the default policy. */
  def q44Curation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    curate(Tables.load(spark, dir, "documents")).orderBy($"doc_id")
  }

  /** Per-label embedding centroids — the per-class mean vector used
    * for cluster seeding, probe selection, and drift monitoring.
    * Element sums are quantized to 1e-6 BIGINT ticks so the
    * accumulation is exact integer arithmetic: float→double products
    * with 1e6 are exact (24+20 mantissa bits < 53), both engines
    * round ties away from zero, and integer addition is associative —
    * so the result is bit-identical under ANY aggregation order,
    * unlike a double `avg` whose last-ulp depends on shuffle order
    * (the q10 lesson). One shuffle of |labels|·dims partial rows.
    */
  def labelCentroids(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    emb.select($"label", posexplode($"embedding".cast("array<double>")))
      .select($"label", $"pos".cast("long").as("dim"),
        round($"col" * 1e6).cast("long").as("q"))
      .groupBy($"label", $"dim")
      .agg(sum($"q").as("s"), count(lit(1)).as("n"))
      .select($"label", $"dim",
        ($"s".cast("double") / ($"n".cast("double") * 1e6)).as("centroid"))
  }

  /** Q45 — 64-dim centroid per label over `embeddings`. */
  def q45LabelCentroids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    labelCentroids(Tables.load(spark, dir, "embeddings"))
      .orderBy($"label", $"dim")
  }

  /** Deterministic train/valid/test assignment by key hash — the
    * reproducible split every training pipeline needs: no sampling
    * state, no shuffle, re-runnable on any engine (masked-Knuth hash
    * in plain BIGINT arithmetic), stable under corpus growth (a doc's
    * split never changes as others arrive). `cuts` are cumulative
    * percentages, e.g. (80, 90) → 80/10/10.
    */
  def assignSplits(df: DataFrame, keyCol: String,
      cuts: (Int, Int) = (80, 90)): DataFrame = {
    val h = (((col(keyCol) % lit(2147483648L)) * lit(2654435761L))
      % lit(2147483648L)) % lit(100L)
    df.withColumn("split",
      when(h < cuts._1, "train")
        .when(h < cuts._2, "valid")
        .otherwise("test"))
  }

  /** Q48 — split assignment over `documents`. */
  def q48SplitAssign(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    assignSplits(Tables.load(spark, dir, "documents"), "doc_id")
      .select($"doc_id", $"split")
      .orderBy($"doc_id")
  }

  /** LEAKAGE-SAFE split assignment — near-dup clusters are ATOMIC:
    * every member of a near-dup cluster keys its split by the cluster
    * representative (min member id), so paraphrase/boilerplate twins
    * can never straddle train and test — the dup-leakage hole a
    * per-doc hash split ([[assignSplits]]) leaves open, and a known
    * eval-inflation source in LLM training corpora. Docs outside any
    * cluster keep their own id as key (identical to q48 for them —
    * growth-stable, engine-independent frontier).
    *
    * Shape: the q18 pair graph → min-label components (both
    * corpus-bucketed, never all-pairs), one left join to annotate
    * members (cluster tables are dup-sized ≪ corpus), then the
    * stateless hash projection.
    */
  def leakageSafeSplits(docs: DataFrame, minJaccard: Double = 0.5,
      cuts: (Int, Int) = (80, 90),
      precomputedPairs: Option[DataFrame] = None): DataFrame = {
    import docs.sparkSession.implicits._
    // same reuse contract as [[curate]]: a pipeline that already
    // built the near-dup pair graph passes it in and pays for
    // jaccardPairs once across curation, clustering, and splitting
    val pairs = precomputedPairs
      .map(_.select(col("doc_a"), col("doc_b")))
      .getOrElse(NearDup.jaccardPairs(docs, minJaccard)
        .select($"doc_a", $"doc_b"))
    val comps = DupClusters.connectedComponents(pairs)
      .select($"id".as("doc_id"), $"cluster_id")
    val keyed = docs.select($"doc_id")
      .join(comps, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce($"cluster_id", $"doc_id"))
    assignSplits(keyed, "split_key")
      .select($"doc_id", $"split_key", $"split")
  }

  /** Q98 — leakage-safe splits over `documents` at τ = 0.5. */
  def q98LeakageSafeSplits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    leakageSafeSplits(Tables.load(spark, dir, "documents"))
      .orderBy($"doc_id")
  }

  /** Deterministic per-group cap sampling — the "at most K docs per
    * domain/language" budget every data-mixture recipe applies.
    * Selection ranks by the same portable masked-Knuth hash as
    * [[assignSplits]] (uniform-ish, engine-independent, and stable
    * under corpus growth for the docs that stay under the cap's
    * hash frontier), so reruns and engines agree exactly. The
    * per-group top-k is the bounded-heap aggregate
    * ([[Similarity.topKPerProbe]]): ≤ k rows per (partition, group)
    * reach the shuffle — group sizes are corpus-proportional, so a
    * `row_number` window here would be the q16-r1 single-reducer
    * shape.
    */
  def perGroupCap(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    import df.sparkSession.implicits._
    val h = (((col(keyCol) % lit(2147483648L)) * lit(2654435761L))
      % lit(2147483648L))
    val scored = df.select(col(groupCol).as("probe_id"),
      col(keyCol).as("vec_id"), h.cast("double").as("sim"))
    Similarity.topKPerProbe(scored, k)
      .select($"probe_id".as(groupCol), $"vec_id".as(keyCol),
        $"sim".cast("long").as("h"))
  }

  /** TEMPERATURE-scaled mixture sampling (the mT5/XLM-R multilingual
    * balancing move): per-group quotas ∝ n_g^α for α < 1, so small
    * groups are upweighted relative to their raw share and no group
    * is starved — then each group fills its quota from the portable
    * hash frontier (the [[perGroupCap]] selection, so the draw is
    * reproducible and growth-stable).
    *
    * Determinism at α = 0.5 (the oracle-checked configuration):
    * sqrt is a correctly-rounded IEEE op, per-group counts are exact
    * integers, and the normalizer folds the per-group terms in
    * groupCol order — a defined summation order both engines
    * reproduce (`list_sum(list(... ORDER BY grp))` in SQL). Other α
    * use `math.pow` (not correctly rounded — spec-checked, not
    * oracle-checked). Group catalog is collected driver-side:
    * catalog-sized (sources/languages), the same contract as the IVF
    * codebooks.
    *
    * Shape: one count agg; ranking is the bounded-heap top-maxQuota
    * per group (partial before the exchange); quotas broadcast.
    */
  def temperatureSample(df: DataFrame, groupCol: String, keyCol: String,
      total: Int, alpha: Double = 0.5): DataFrame = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.Encoders
    def w(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val norm = counts.foldLeft(0.0) { case (acc, (_, n)) => acc + w(n) }
    val quotas = counts.map { case (g, n) =>
      (g, math.floor(total * w(n) / norm + 0.5).toLong)
    }
    // floor 1: an empty corpus has no quotas, and TopKAgg needs k ≥ 1
    val maxQ = quotas.foldLeft(1L)((a, q) => math.max(a, q._2)).toInt
    val tk = udaf(new graft.functions.TopKAgg(maxQ),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    val ranked = df
      .select(col(groupCol).as("grp"), col(keyCol).as("id"),
        knuthHash(col(keyCol)).cast("double").as("s"))
      .groupBy($"grp").agg(tk($"id", $"s").as("t"))
      .select($"grp", posexplode($"t").as(Seq("pos", "p")))
      .select($"grp", ($"pos" + 1).cast("long").as("rk"), $"p.vec_id".as("id"))
    ranked.join(broadcast(quotas.toSeq.toDF("grp", "quota")), "grp")
      .filter($"rk" <= $"quota")
      .select($"grp".as(groupCol), $"quota", col("id").as(keyCol))
  }

  /** Q100 — temperature-balanced 100-doc mixture over sources. */
  def q100TemperatureSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    temperatureSample(Tables.load(spark, dir, "documents"),
      "source", "doc_id", total = 100)
      .orderBy($"source", $"doc_id")
  }

  /** Q57 — at most 40 docs per language, hash-frontier selection. */
  def q57PerLangCap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    perGroupCap(Tables.load(spark, dir, "documents"), "lang", "doc_id", 40)
      .orderBy($"lang", $"doc_id")
  }

  /** The portable masked-Knuth hash both engines compute in plain
    * BIGINT arithmetic (31-bit mask before the multiply keeps the
    * product < 2^63 at any key).
    */
  private[operators] def knuthHash(keyCol: org.apache.spark.sql.Column) =
    ((keyCol % lit(2147483648L)) * lit(2654435761L)) % lit(2147483648L)

  /** Deterministic data-mixture sampling — downsample each source to
    * its target rate (the domain-reweighting step of every pretraining
    * recipe: keep 80% of wiki, 15% of crawl, …). A doc is kept iff
    * its key hash lands under the source's rate frontier, so the
    * sample is reproducible, engine-independent, shuffle-free (one
    * per-row predicate on the scan), and stable under corpus growth —
    * a doc's fate never changes as other docs arrive, unlike
    * `sample()` whose outcome depends on partition layout.
    *
    * `ratePct` maps each source to its keep-rate in percent; unlisted
    * sources keep everything.
    */
  def mixtureSample(docs: DataFrame, sourceCol: String, keyCol: String,
      ratePct: Map[String, Int]): DataFrame = {
    val rate = ratePct.foldLeft(lit(100)) { case (e, (s, r)) =>
      when(col(sourceCol) === s, lit(r)).otherwise(e)
    }
    docs.filter(knuthHash(col(keyCol)) % 100L < rate)
  }

  /** Q63 — per-source mixture summary at a rate schedule derived from
    * the source id (`srcN` keeps 10 + 7·N mod 80 percent): total vs
    * kept counts per source. The kept-side agg is partial+final over
    * the filtered scan; the totals agg likewise; one broadcast join
    * of two 20-row summaries.
    */
  def q63MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val srcNum = regexp_extract($"source", "src(\\d+)", 1).cast("long")
    val stamped = docs.withColumn("rate_pct",
      (lit(10L) + (srcNum * 7L) % 80L))
    val kept = stamped
      .filter(knuthHash($"doc_id") % 100L < $"rate_pct")
      .groupBy($"source").agg(count(lit(1)).as("n_kept"))
    stamped.groupBy($"source", $"rate_pct")
      .agg(count(lit(1)).as("n_total"))
      .join(broadcast(kept), Seq("source"), "left")
      .select($"source", $"rate_pct", $"n_total",
        coalesce($"n_kept", lit(0L)).as("n_kept"))
      .orderBy($"source")
  }

  /** Deterministic training-order shuffle — assign every doc a shard
    * and a position inside it, so the training loader streams shards
    * in order and gets a reproducible global permutation without a
    * global sort. Shard = key hash mod nShards; in-shard order = a
    * SECOND independent hash (different odd multiplier), so shard
    * membership and in-shard order are uncorrelated.
    *
    * Scale contract: production picks `nShards ∝ corpus / target
    * shard size` (thousands of shards at 100 TB), so rows-per-shard
    * is BOUNDED by construction and the per-shard ranking window is
    * safe — unlike a window over a data-proportional group (the
    * q16-r1 single-reducer shape). The physical write is
    * `repartition(shard).sortWithinPartitions(ord)` — one shuffle,
    * no global ordering step.
    */
  def shuffleShards(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    import df.sparkSession.implicits._
    val ord = ((col(keyCol) % lit(2147483648L)) * lit(2246822519L)) %
      lit(2147483648L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"shard").orderBy($"_ord", col(keyCol))
    df.withColumn("shard", (knuthHash(col(keyCol)) % nShards).cast("int"))
      .withColumn("_ord", ord)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_ord")
  }

  /** Q66 — 16-shard deterministic shuffle order over `documents`. */
  def q66ShuffleShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    shuffleShards(Tables.load(spark, dir, "documents"), "doc_id", 16)
      .select($"doc_id", $"shard", $"pos")
      .orderBy($"shard", $"pos")
  }

  /** Q49 — top-3 quality docs per language via the bounded-heap
    * grouped top-k ([[Similarity.topKPerProbe]] — partial agg before
    * the shuffle). Docs-per-language is corpus-proportional, so a
    * per-lang `row_number` window would be the q16-r1 single-reducer
    * shape; the aggregate form ships ≤ k rows per (partition, lang).
    * Quality is rounded before ranking so both engines order the
    * same numbers.
    */
  def q49TopQualityPerLang(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = Tables.load(spark, dir, "documents")
      .select($"lang".as("probe_id"), $"doc_id".as("vec_id"),
        round(TextAnalysis.qualityScore($"text"), 6).as("sim"))
    Similarity.topKPerProbe(scored, k = 3)
      .select($"probe_id".as("lang"), $"vec_id".as("doc_id"),
        $"sim".as("quality"))
      .orderBy($"lang", $"quality".desc, $"doc_id")
  }

  /** Deterministic WEIGHTED sampling without replacement per group —
    * Efraimidis–Spirakis (2006): rank by u^(1/w), equivalently by
    * ln(u)/w, where u ∈ (0,1] is the item's portable key hash mapped
    * to the unit interval. Heavier items win proportionally more
    * often; the hash makes every engine and rerun draw the SAME
    * sample (the weighted counterpart of [[perGroupCap]]).
    *
    * Portability: u = (knuthHash+1) / 2³¹ is exact in both engines
    * (the divisor is a power of two); the E-S key is rounded to 9 dp
    * before ranking and ties break on the key column, so a final-ulp
    * `ln` difference cannot reorder the sample. Per-group top-k is
    * the bounded-heap aggregate — group sizes are corpus-
    * proportional, so no per-group window reducer.
    */
  def weightedSample(df: DataFrame, groupCol: String, keyCol: String,
      weightCol: String, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    val u = (knuthHash(col(keyCol)) + 1L).cast("double") / 2147483648.0
    val esKey = round(log(u) / col(weightCol), 9)
    val scored = df.select(col(groupCol).as("probe_id"),
      col(keyCol).as("vec_id"), esKey.as("sim"))
    Similarity.topKPerProbe(scored, k)
      .select($"probe_id".as(groupCol), $"vec_id".as(keyCol),
        $"sim".as("es_key"))
  }

  /** Q85 — 10 docs per language, weighted by document length. */
  def q85WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    weightedSample(Tables.load(spark, dir, "documents"),
        "lang", "doc_id", "n_chars", 10)
      .orderBy($"lang", $"doc_id")
  }

  // ---------------------------------------------------------------
  // Mixture-budget realization (q144) — the data-recipe math that
  // turns target mixture weights into per-source repetition factors.
  // ---------------------------------------------------------------

  /** MIXTURE-BUDGET REALIZATION — the planning step between "we want
    * this source mix" and an actual training run: given per-source
    * available token counts and target mixture weights, compute each
    * source's token TARGET inside a total budget, the repetition
    * factor (epochs) needed to hit it, the cap-clamped factor (the
    * published recipes cap repetition — quality degrades past a few
    * epochs), the realized token count under the cap, and the
    * deficit the recipe must reassign. All exact integer arithmetic
    * in 1e-6 ticks — a recipe whose per-source numbers drift with
    * partitioning is not reproducible.
    *
    * `perSource` = (source, avail_tokens, weight). The budget is
    * `budgetPctOfCorpus`% of the total available tokens (computed
    * distributively — no driver round-trip); targets are exact
    * floor shares `budget·wᵢ div Σw` (the q137 largest-remainder
    * step applies when Σtargets must equal the budget to the token —
    * for epoch planning the floor is the published convention).
    *
    * Scale shape: one partial+final agg to the per-source frame, one
    * 1-row totals cross join — the frame is #sources-sized, so every
    * step after the first agg is effectively free. Overflow budget:
    * products stay < 2⁶³ up to ~10¹² available tokens at the default
    * cap; at the 10¹³⁺ frontier-corpus scale, normalize token counts
    * to kilotokens first (same formulas, 10³ coarser grain).
    */
  def mixtureBudget(perSource: DataFrame, budgetPctOfCorpus: Int = 200,
      maxEpochsTicks: Long = 4000000L): DataFrame = {
    import perSource.sparkSession.implicits._
    val totals = perSource.agg(sum($"avail_tokens").as("_tot"),
      sum($"weight").as("_wtot"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("target_tokens",
        expr(s"(_tot * ${budgetPctOfCorpus}L div 100L) * weight div _wtot"))
      .withColumn("epochs_ticks",
        expr("CASE WHEN avail_tokens = 0 THEN 0L " +
          "ELSE target_tokens * 1000000L div avail_tokens END"))
      .withColumn("capped_epochs_ticks",
        least($"epochs_ticks", lit(maxEpochsTicks)))
      .withColumn("realized_tokens",
        expr("avail_tokens * capped_epochs_ticks div 1000000L"))
      .withColumn("deficit_tokens", $"target_tokens" - $"realized_tokens")
      .select($"source", $"avail_tokens", $"weight", $"target_tokens",
        $"epochs_ticks", $"capped_epochs_ticks", $"realized_tokens",
        $"deficit_tokens")
  }

  /** Q144 — realize a 3×-corpus token budget over the `documents`
    * sources with deterministic fixture weights (5 + 3·srcN mod 17 —
    * spread so some sources land near one epoch and the heavy-weight
    * ones hit the 4-epoch cap with a real deficit).
    */
  def q144MixtureBudget(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val srcNum = regexp_extract($"source", "src(\\d+)", 1).cast("long")
    val perSource = docs
      .select($"source",
        size(TextStats.tokens($"text")).cast("long").as("_ntok"),
        (lit(5L) + (srcNum * 3L) % 17L).as("weight"))
      .groupBy($"source", $"weight")
      .agg(sum($"_ntok").as("avail_tokens"))
      .select($"source", $"avail_tokens", $"weight")
    mixtureBudget(perSource, budgetPctOfCorpus = 300).orderBy($"source")
  }

  /** DuckDB oracle for [[q144MixtureBudget]] — same tokenization,
    * weight formula, floor-share targets and tick arithmetic.
    */
  def mixtureBudgetOracleSql(budgetPctOfCorpus: Int = 200,
      maxEpochsTicks: Long = 4000000L): String =
    s"""WITH d AS (SELECT source,
       |    len(string_split(text, ' '))::BIGINT AS ntok,
       |    (5 + (TRY_CAST(regexp_extract(source, 'src(\\d+)', 1)
       |      AS BIGINT) * 3) % 17) AS weight
       |  FROM documents),
       | s AS (SELECT source, any_value(weight) AS weight,
       |    sum(ntok)::BIGINT AS avail_tokens FROM d GROUP BY source),
       | t AS (SELECT sum(avail_tokens)::BIGINT AS tot,
       |    sum(weight)::BIGINT AS wtot FROM s),
       | x AS (SELECT s.source, s.avail_tokens, s.weight,
       |    ((t.tot * $budgetPctOfCorpus // 100) * s.weight // t.wtot)
       |      AS target_tokens
       |  FROM s CROSS JOIN t),
       | e AS (SELECT *, (CASE WHEN avail_tokens = 0 THEN 0
       |    ELSE target_tokens * 1000000 // avail_tokens END)
       |      AS epochs_ticks FROM x),
       | c AS (SELECT *, least(epochs_ticks, $maxEpochsTicks)
       |      AS capped_epochs_ticks FROM e),
       | r AS (SELECT *, (avail_tokens * capped_epochs_ticks // 1000000)
       |      AS realized_tokens FROM c)
       |SELECT source, avail_tokens, weight, target_tokens, epochs_ticks,
       |  capped_epochs_ticks, realized_tokens,
       |  (target_tokens - realized_tokens) AS deficit_tokens
       |FROM r ORDER BY source""".stripMargin
}
