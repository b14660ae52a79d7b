package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** PRIVACY-RISK AUDITING for data releases — the census a customer
  * dataset must pass BEFORE it ships as training data or a shared
  * extract. Re-identification risk comes from QUASI-IDENTIFIER
  * combinations (Sweeney's k-anonymity): a row whose (nation,
  * segment, spend band) combination is shared by fewer than k rows
  * is linkable, even with every direct identifier removed; and a
  * k-large group whose SENSITIVE attribute barely varies leaks that
  * attribute to anyone who can place a person in the group
  * (Machanavajjhala's l-diversity).
  *
  * Reference scope: absent from the reference (no privacy auditing);
  * extends the r13/r14 compliance family (takedown, retention,
  * right-to-be-forgotten, blocklists, deletion audit) with the
  * pre-RELEASE leg: forget/expire remove what must go, this measures
  * whether what REMAINS is safe to hand out.
  *
  * Scale shape: the census is one quasi-identifier groupBy with
  * algebraic aggregates (count + distinct-sensitive via a two-level
  * agg) — partial aggregation before the exchange, group-count-sized
  * output. Suppression is a windowed group count over the same key —
  * one shuffle, no join. Both run unchanged at any corpus size.
  */
object Privacy {

  /** K-ANONYMITY / L-DIVERSITY census: one row per quasi-identifier
    * group — (quasi cols…, group_n, l_div, k_risk, l_risk). `k_risk`:
    * fewer than `k` rows share the combination (re-identifiable).
    * `l_risk`: fewer than `l` distinct sensitive values in the group
    * (attribute disclosure). NULL quasi values group as their own
    * combination (NULL is itself linkable); NULL sensitive values
    * count as one value.
    */
  def kAnonymityCensus(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: Column, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "k-anonymity needs quasi-identifiers")
    require(k >= 1 && l >= 1, "k and l must be >= 1")
    val qs = quasiCols.map(col)
    df.select(qs :+ sensitiveCol.as("_sens"): _*)
      // two-level agg: distinct sensitive per group without
      // count_distinct's per-group state explosion on wide groups
      .groupBy(qs :+ col("_sens"): _*)
      .agg(count(lit(1)).as("_n"))
      .groupBy(qs: _*)
      .agg(sum(col("_n")).as("group_n"), count(lit(1)).as("l_div"))
      .withColumn("k_risk", col("group_n") < k)
      .withColumn("l_risk", col("l_div") < l)
  }

  /** SUPPRESSION release — the minimal k-anonymization: drop every
    * row whose quasi-identifier group is smaller than `k`; the
    * released rows all sit in groups of ≥ k by construction. One
    * window count over the quasi key, no join, row set deterministic.
    */
  def kSuppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "k-suppression needs quasi-identifiers")
    val w = Window.partitionBy(quasiCols.map(col): _*)
    df.withColumn("_gn", count(lit(1)).over(w))
      .filter(col("_gn") >= k)
      .drop("_gn")
  }

  /** DIFFERENTIALLY-PRIVATE COUNT RELEASE mechanics — the third
    * privacy leg: where [[kSuppress]] protects by dropping rows,
    * the Laplace mechanism releases EVERY group with calibrated
    * noise: released = max(0, n + round(Laplace(1/ε))) — a count
    * query has sensitivity 1 (one person changes any group count by
    * at most 1), so Laplace noise of scale b = 1/ε gives ε-DP
    * (Dwork et al. 2006). Clamping at 0 and rounding to integers are
    * standard post-processing (DP survives post-processing).
    *
    * NOISE SOURCE SEAM: the engine draws the Laplace sample by
    * inverse CDF from a uniform DERIVED DETERMINISTICALLY from the
    * group key and a caller seed (the shared
    * [[TextAnalysis.fingerprint]] polynomial hash — a native codegen
    * expression with an exact DuckDB mirror). That makes the release
    * testable and oracle-checkable end-to-end — and, deliberately
    * documented: a PREDICTABLE noise source is NOT differential
    * privacy. The mechanism (sensitivity analysis, scale
    * calibration, clamp/round post-processing, the one-shuffle
    * group-count plan) is the engine deliverable; production swaps
    * the uniform for a CSPRNG draw by replacing one column
    * expression. Noise magnitude is bounded by b·ln(2^31) ≈ 21.5·b
    * (the inverse CDF of the coarsest representable uniform).
    *
    * `epsilonTicks` is ε in the repo's 1e6-tick convention
    * (1_000_000 = ε 1.0). Scale shape: one quasi-key groupBy with a
    * partial-agg count; the noise is a per-group projection.
    */
  def dpCounts(df: DataFrame, quasiCols: Seq[String],
      epsilonTicks: Long = 1000000L, seed: Long = 0L): DataFrame = {
    require(quasiCols.nonEmpty, "dpCounts needs group columns")
    require(epsilonTicks > 0, "epsilon must be positive")
    val qs = quasiCols.map(col)
    val b = 1e6 / epsilonTicks
    // group key || seed, NULLs as a sentinel (concat_ws would skip
    // them and collide NULL with empty)
    val keyStr = concat_ws("\u0001",
      quasiCols.map(c =>
        coalesce(col(c).cast("string"), lit("\u0002"))) :+
        lit(seed.toString): _*)
    df.groupBy(qs: _*).agg(count(lit(1)).as("_n"))
      // fingerprint then the Knuth multiplicative mix (the q165
      // grouping device): the polynomial fingerprint of SHORT
      // structured keys is not uniform (adjacent keys give adjacent
      // values), the multiplication spreads any change across the
      // 31-bit range
      .withColumn("_m",
        pmod(TextAnalysis.fingerprint(keyStr) * lit(2654435761L),
          lit(2147483648L)))
      .withColumn("_u", (col("_m") + lit(0.5)) / lit(2.147483648e9))
      .withColumn("_c", col("_u") - lit(0.5))
      .withColumn("_lap", -lit(b) * signum(col("_c")) *
        log(lit(1.0) - lit(2.0) * abs(col("_c"))))
      .select(qs :+
        greatest(lit(0L),
          col("_n") + round(col("_lap"), 0).cast("long"))
          .as("released_n"): _*)
  }

  /** GENERALIZATION release — the anonymization trio's third
    * strategy (suppress drops rows, [[dpCounts]] adds noise,
    * generalization COARSENS): widen a numeric quasi-identifier's
    * band until every (static quasi cols, band) group reaches k,
    * then release at that width. The width ladder is deterministic —
    * baseWidth · 2^j for j = 0..maxDoublings, smallest passing j
    * wins (the classic single-attribute full-domain generalization);
    * if even the coarsest width leaves small groups, the residual
    * suppresses ([[kSuppress]] at the chosen width — a no-op
    * whenever the width passes outright, so the release ALWAYS
    * satisfies k-anonymity by construction). The raw numeric value
    * never ships — only the band and the width that was needed.
    *
    * Scale shape: ONE pass computes every candidate width's weakest
    * group simultaneously (explode the ladder — rows × (j+1), one
    * groupBy), a (j+1)-row driver read picks the width, then the
    * suppression window. No iteration over the corpus.
    */
  def generalize(df: DataFrame, staticQuasi: Seq[String],
      numCol: String, k: Long, baseWidth: Double,
      maxDoublings: Int): DataFrame = {
    require(baseWidth > 0 && maxDoublings >= 0 && k >= 1,
      "generalize needs baseWidth > 0, maxDoublings >= 0, k >= 1")
    val widths = (0 to maxDoublings).map(j => baseWidth * (1L << j))
    val statics = staticQuasi.map(col)
    val mins = df
      .select(statics :+ col(numCol).as("_v"): _*)
      .withColumn("_j", explode(lit((0 to maxDoublings).toArray)))
      .withColumn("_band",
        floor(col("_v") / (lit(baseWidth) * pow(lit(2.0), col("_j"))))
          .cast("long"))
      .groupBy((col("_j") +: statics) :+ col("_band"): _*)
      .agg(count(lit(1)).as("_n"))
      .groupBy(col("_j")).agg(min(col("_n")).as("_mn"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val j = (0 to maxDoublings).find(j => mins.get(j).exists(_ >= k))
      .getOrElse(maxDoublings)
    val w = widths(j)
    val banded = df
      .withColumn("band", floor(col(numCol) / w).cast("long"))
      .withColumn("width", lit(w))
      .drop(numCol)
    kSuppress(banded, staticQuasi :+ "band", k)
  }

  /** Q175 — privacy census over `customer`: quasi-identifiers
    * (nation, market segment, spend band = floor(acctbal / 2000)),
    * sensitive attribute = the spend band's FINER sibling
    * (floor(acctbal / 500)): per group, size, sensitive diversity,
    * and the k=8 / l=3 risk flags.
    */
  def q175KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
      .withColumn("spend_band",
        floor($"c_acctbal" / 2000.0).cast("long"))
    kAnonymityCensus(cust,
        Seq("c_nationkey", "c_mktsegment", "spend_band"),
        floor($"c_acctbal" / 500.0).cast("long"), k = 8L, l = 3L)
      .orderBy($"c_nationkey", $"c_mktsegment", $"spend_band")
  }

  /** DuckDB oracle for [[q175KAnonymity]]. */
  def kAnonymityOracleSql(k: Long = 8L, l: Long = 3L): String =
    s"""SELECT c_nationkey, c_mktsegment,
       |  floor(c_acctbal / 2000.0)::BIGINT AS spend_band,
       |  count(*)::BIGINT AS group_n,
       |  count(DISTINCT floor(c_acctbal / 500.0)::BIGINT) AS l_div,
       |  count(*) < $k AS k_risk,
       |  count(DISTINCT floor(c_acctbal / 500.0)::BIGINT) < $l AS l_risk
       |FROM customer
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin

  /** Q176 — the suppression release at the q175 quasi-identifiers and
    * k=8: the customers that survive, with their group size (proof
    * every released row sits in a group of ≥ k).
    */
  def q176KSuppress(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
      .withColumn("spend_band",
        floor($"c_acctbal" / 2000.0).cast("long"))
    kSuppress(cust, Seq("c_nationkey", "c_mktsegment", "spend_band"),
        k = 8L)
      .select($"c_custkey", $"c_nationkey", $"c_mktsegment", $"spend_band")
      .orderBy($"c_custkey")
  }

  /** Q177 — DP count release over `customer` by (nation, segment) at
    * ε = 0.5 (scale b = 2), seed 177: every group released with
    * calibrated integer Laplace noise, clamped at 0.
    */
  def q177DpCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dpCounts(Tables.load(spark, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"),
        epsilonTicks = 500000L, seed = 177L)
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  /** DuckDB oracle for [[q177DpCounts]] — the same inverse-CDF
    * Laplace draw from the same fingerprint-derived uniform.
    */
  def dpCountsOracleSql(epsilonTicks: Long = 500000L,
      seed: Long = 177L): String = {
    val b = 1e6 / epsilonTicks
    val key = "concat_ws(chr(1), coalesce(c_nationkey::VARCHAR, chr(2)), " +
      s"coalesce(c_mktsegment::VARCHAR, chr(2)), '$seed')"
    s"""WITH g AS (
       |  SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n,
       |    $key AS gk
       |  FROM customer GROUP BY 1, 2),
       | u AS (SELECT c_nationkey, c_mktsegment, n,
       |    ((((${TextAnalysis.fingerprintSql("gk")}) * 2654435761)
       |        % 2147483648 + 0.5)
       |      / 2147483648.0) - 0.5 AS c
       |  FROM g)
       |SELECT c_nationkey, c_mktsegment,
       |  greatest(0, n + round(-$b * sign(c) * ln(1.0 - 2.0 * abs(c)),
       |    0)::BIGINT) AS released_n
       |FROM u
       |ORDER BY c_nationkey, c_mktsegment""".stripMargin
  }

  /** Q178 — the generalization release over `customer`: static quasi
    * column `c_mktsegment`, the account balance generalized on the
    * 500 · 2^j ladder (j ≤ 5) to the smallest width where every
    * (segment, band) group reaches k = 25; residual suppression
    * guarantees the release.
    */
  def q178Generalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    generalize(Tables.load(spark, dir, "customer"),
        Seq("c_mktsegment"), "c_acctbal",
        k = 25L, baseWidth = 500.0, maxDoublings = 5)
      .select($"c_custkey", $"c_mktsegment", $"band", $"width")
      .orderBy($"c_custkey")
  }

  /** DuckDB oracle for [[q178Generalize]] — the same ladder, pick,
    * and residual suppression.
    */
  def generalizeOracleSql(k: Long = 25L, baseWidth: Double = 500.0,
      maxDoublings: Int = 5): String = {
    val widths = (0 to maxDoublings)
      .map(j => s"($j, ${baseWidth * (1L << j)})").mkString(", ")
    s"""WITH W(j, w) AS (VALUES $widths),
       | g AS (SELECT j, w, c_mktsegment,
       |     floor(c_acctbal / w)::BIGINT AS band, count(*) AS n
       |   FROM customer CROSS JOIN W GROUP BY 1, 2, 3, 4),
       | m AS (SELECT j, min(n) AS mn FROM g GROUP BY 1),
       | pick AS (SELECT coalesce(
       |     (SELECT min(j) FROM m WHERE mn >= $k), $maxDoublings) AS j),
       | pw AS (SELECT w FROM W JOIN pick USING (j)),
       | rel AS (SELECT c_custkey, c_mktsegment,
       |     floor(c_acctbal / pw.w)::BIGINT AS band, pw.w AS width,
       |     count(*) OVER (PARTITION BY c_mktsegment,
       |       floor(c_acctbal / pw.w)::BIGINT) AS gn
       |   FROM customer, pw)
       |SELECT c_custkey, c_mktsegment, band, width
       |FROM rel WHERE gn >= $k
       |ORDER BY c_custkey""".stripMargin
  }

  /** DuckDB oracle for [[q176KSuppress]]. */
  def kSuppressOracleSql(k: Long = 8L): String =
    s"""SELECT c_custkey, c_nationkey, c_mktsegment, spend_band
       |FROM (
       |  SELECT c_custkey, c_nationkey, c_mktsegment,
       |    floor(c_acctbal / 2000.0)::BIGINT AS spend_band,
       |    count(*) OVER (PARTITION BY c_nationkey, c_mktsegment,
       |      floor(c_acctbal / 2000.0)::BIGINT) AS gn
       |  FROM customer)
       |WHERE gn >= $k
       |ORDER BY c_custkey""".stripMargin
}
