package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** LOCAL differential privacy — k-ary RANDOMIZED RESPONSE frequency
  * estimation (Warner JASA'65 generalized; the RAPPOR family,
  * Erlingsson et al. CCS'14): the trust model the central mechanisms
  * ([[Privacy.dpCounts]]' Laplace, [[DpPrefix]]'s binary tree) cannot
  * express — NO trusted curator ever sees a true value. Each row
  * reports its category truthfully with probability
  * p = e^ε / (e^ε + k − 1) and each specific OTHER category with
  * probability q = (1 − p)/(k − 1); the ratio p/q = e^ε makes every
  * report ε-LDP by construction. The aggregator sees only the
  * perturbed counts c_v and inverts the channel with the unbiased
  * estimator t_v = (c_v − n·q)/(p − q).
  *
  * The per-row coins ride the engine's deterministic noise seam —
  * with a measured twist: TWO SALTED KEYS ARE NOT TWO INDEPENDENT
  * DRAWS. The polynomial fingerprint is affine in key differences,
  * so keys differing in one salt character give m2 = m1 + const
  * (mod 2^31) — on the q194 fixture the flip coin and the
  * other-category coin were perfectly rank-correlated (the
  * conditional other-pick histogram was [67, 0, 36, 73] per 4-way
  * uniform slot) and the estimator missed truth by 7σ. The
  * decorrelated form mixes ONE fingerprint with TWO different odd
  * multipliers (Knuth's 2654435761 and xxHash's 2246822519):
  * multiplicative, not additive, in the shared value — measured
  * conditional-uniform on the same fixture. Same
  * NOT-LDP-until-production-swaps-the-CSPRNG caveat as the central
  * family; here the production swap happens CLIENT-side, which is
  * the whole point of the model. p, q and (p − q) are calibrated
  * ONCE driver-side and the exact doubles shared with the oracle
  * (the q192 σ pattern).
  *
  * The category dictionary is the sorted distinct domain — a bounded
  * driver read guarded loudly (≤ 4096; a local-DP release over an
  * unbounded domain needs a sketch, not a dictionary), broadcast
  * back as literals. NULL categories are excluded by contract (no
  * report — the t-closeness NULL convention).
  *
  * Scale shape: one bounded distinct, per-row projections against
  * broadcast literals (the perturbation), ONE category-keyed
  * partial-agg count (k groups), and a k-row estimator projection.
  * Nothing is data-sized past the map side.
  */
object LocalDp {

  /** (category, reported_n, est_n): perturbed counts and the
    * channel-inverted unbiased frequency estimates over the non-NULL
    * rows. `rowKey` must be unique per row (the coin key);
    * `epsilonTicks` is ε in millionths.
    */
  def rrFrequency(df: DataFrame, category: Column, rowKey: Column,
      epsilonTicks: Long = 1000000L, seed: Long = 0L): DataFrame = {
    require(epsilonTicks > 0, "epsilon must be positive")
    val rows = df.select(category.cast("string").as("_cat"),
        rowKey.cast("string").as("_rk"))
      .filter(col("_cat").isNotNull)
    val cats = rows.select(col("_cat")).distinct()
      .orderBy(col("_cat")).limit(4097)
      .collect().map(_.getString(0)).toIndexedSeq
    // empty-in, empty-out (the house contract EmptyInputSpec pins):
    // no observations means no channel and nothing to release
    if (cats.isEmpty) {
      import df.sparkSession.implicits._
      return Seq.empty[(String, Long, Long)]
        .toDF("category", "reported_n", "est_n")
    }
    require(cats.length >= 2,
      "randomized response needs at least 2 categories")
    require(cats.length <= 4096,
      s"category domain exceeds 4096 — a local-DP release over an" +
        " unbounded domain needs a sketch, not a dictionary")
    val counts = rrReport(rows, col("_cat"), col("_rk"), cats,
        epsilonTicks, seed)
      .groupBy(col("category")).agg(count(lit(1)).as("reported_n"))
    estimates(counts, rows.count(), cats, epsilonTicks)
  }

  /** The CLIENT side of the channel, per row against a FIXED
    * dictionary — streaming-safe (pure projections, no aggregation),
    * so `readStream → rrReport → groupBy(category).count` maintains
    * the reported counts incrementally (Update mode, state
    * k-sized) and [[estimates]] over the maintained table is the
    * batch release: the [[DpPrefix]] split, spec'd batch ≡ stream.
    * Rows whose category is outside the dictionary (impossible in
    * batch, possible on an open stream) are dropped — an LDP channel
    * only transports enumerated categories.
    */
  def rrReport(df: DataFrame, category: Column, rowKey: Column,
      cats: Seq[String], epsilonTicks: Long, seed: Long): DataFrame = {
    val k = cats.length
    val eps = epsilonTicks / 1e6
    val p = math.exp(eps) / (math.exp(eps) + k - 1)
    val dict = array(cats.map(lit): _*)
    val rows = df.select(category.cast("string").as("_cat"),
        rowKey.cast("string").as("_rk"))
      .filter(col("_cat").isNotNull)
      .filter(array_contains(dict, col("_cat")))
    // true index from the broadcast dictionary (1-based array_position)
    val idx = (array_position(dict, col("_cat")) - 1L).cast("int")
    val f = TextAnalysis.fingerprint(
      concat_ws("\u0001", col("_rk"), lit(s"$seed:rr")))
    val keep = rrUniform(f, 2654435761L) < lit(p)
    val other = floor(rrUniform(f, 2246822519L) *
      lit(k - 1)).cast("int")
    val reported = when(keep, idx)
      .otherwise(when(other >= idx, other + 1).otherwise(other))
    rows.select(element_at(dict, reported + 1).as("category"))
  }

  /** Channel inversion over a (category, reported_n) table: every
    * dictionary category ships a row (total release), reported or
    * not, with the unbiased estimate.
    */
  def estimates(counts: DataFrame, n: Long, cats: Seq[String],
      epsilonTicks: Long): DataFrame = {
    val k = cats.length
    val eps = epsilonTicks / 1e6
    val p = math.exp(eps) / (math.exp(eps) + k - 1)
    val q = (1.0 - p) / (k - 1)
    import counts.sparkSession.implicits._
    cats.toIndexedSeq.toDF("category")
      .join(counts, Seq("category"), "left")
      .withColumn("reported_n", coalesce(col("reported_n"), lit(0L)))
      .withColumn("est_n",
        round((col("reported_n") - lit(n.toDouble * q)) / lit(p - q), 0)
          .cast("long"))
  }

  /** One uniform in [0, 1) from a shared fingerprint and a draw-
    * specific odd multiplier (see the correlation note above).
    */
  private def rrUniform(f: Column, mult: Long): Column = {
    val m = pmod(f * lit(mult), lit(2147483648L))
    (m + lit(0.5)) / lit(2.147483648e9)
  }

  /** Q194 — ε = 1 randomized-response release of the `customer`
    * market-segment distribution (k = 5), coin keyed by c_custkey.
    */
  def q194RrFrequency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    rrFrequency(Tables.load(spark, dir, "customer"),
        $"c_mktsegment", $"c_custkey",
        epsilonTicks = 1000000L, seed = 194L)
      .orderBy($"category")
  }

  /** DuckDB oracle for [[q194RrFrequency]] — same dictionary rule
    * (sorted distinct), same two fingerprint coins, same inlined
    * channel constants.
    */
  def rrFrequencyOracleSql(epsilonTicks: Long = 1000000L,
      seed: Long = 194L, k: Int = 5): String = {
    val eps = epsilonTicks / 1e6
    val p = math.exp(eps) / (math.exp(eps) + k - 1)
    val q = (1.0 - p) / (k - 1)
    s"""WITH rows_ AS (
       |  SELECT c_mktsegment::VARCHAR AS _cat,
       |    c_custkey::VARCHAR AS _rk
       |  FROM customer WHERE c_mktsegment IS NOT NULL),
       | dict AS (
       |  SELECT _cat, (row_number() OVER (ORDER BY _cat) - 1)::INT
       |    AS _i
       |  FROM (SELECT DISTINCT _cat FROM rows_)),
       | keyed AS (
       |  SELECT r._rk, d._i AS idx,
       |    concat_ws(chr(1), r._rk, '$seed:rr') AS gk
       |  FROM rows_ r JOIN dict d ON d._cat = r._cat),
       | fpd AS (
       |  SELECT idx, (${TextAnalysis.fingerprintSql("gk")}) AS f
       |  FROM keyed),
       | coins AS (
       |  SELECT idx,
       |    ((f * 2654435761) % 2147483648 + 0.5) / 2147483648.0 AS u1,
       |    ((f * 2246822519) % 2147483648 + 0.5) / 2147483648.0 AS u2
       |  FROM fpd),
       | rep AS (
       |  SELECT CASE WHEN u1 < $p THEN idx
       |    ELSE CASE WHEN floor(u2 * ${k - 1})::INT >= idx
       |      THEN floor(u2 * ${k - 1})::INT + 1
       |      ELSE floor(u2 * ${k - 1})::INT END END AS ridx
       |  FROM coins),
       | cnt AS (
       |  SELECT ridx, count(*)::BIGINT AS reported_n
       |  FROM rep GROUP BY ridx),
       | n AS (SELECT count(*)::BIGINT AS n FROM rows_)
       |SELECT d._cat AS category,
       |  coalesce(c.reported_n, 0)::BIGINT AS reported_n,
       |  round((coalesce(c.reported_n, 0) - n.n * $q) / ${p - q},
       |    0)::BIGINT AS est_n
       |FROM dict d LEFT JOIN cnt c ON c.ridx = d._i, n
       |ORDER BY category""".stripMargin
  }
}
