package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** OPEN-DOMAIN local-DP frequency estimation — the one-bit
  * count-mean sketch (the HCMS of Apple's "Learning with Privacy at
  * Scale", 2017): the sketch [[LocalDp.rrFrequency]]'s dictionary
  * guard points to. Randomized response needs the category domain
  * enumerated BEFORE collection; the sketch needs candidates only at
  * DECODE time — each client transmits ONE perturbed bit about one
  * uniformly-sampled cell of an (h × m) hash sketch, and any value
  * can be probed against the aggregate later:
  *
  *   - client i: hash row j_i ~ U[h], sampled column l_i ~ U[m],
  *     true bit x = [hash_{j_i}(v_i) = l_i], report y = x XOR flip
  *     with P(flip) = 1/(1 + e^ε) — one-bit randomized response at
  *     odds e^ε, so every report is ε-LDP outright, whatever the
  *     value domain.
  *   - aggregator: per candidate v, T_v = Σ_j #{i : j_i = j,
  *     l_i = hash_j(v), y_i = 1}. Per hash row,
  *     E[T_j(v)] = (1/m)(c_jv·p + (N_j − c_jv)·q) with
  *     p = e^ε/(1+e^ε), q = 1 − p, c_jv the users colliding with v
  *     under hash_j. A user reports under their OWN assigned row
  *     only, so Σ_j c_jv estimates f(v) plus ~(n − f(v))/m hash
  *     collisions (NOT h·f(v) — the mistake a per-row-mean decode
  *     bakes in); summing first keeps the total T_v INTEGER (no
  *     float-summation order to disagree on across engines):
  *       Ĉ_v = (m·T_v − n·q) / (p − q),
  *       f̂(v) = (Ĉ_v − n/m) · m/(m − 1).
  *
  * NOISE SEAM — this operator needs FINE-GRAINED (h·m-cell)
  * uniformity from deterministic draws, and both affine devices
  * failed it, measured: salting j into the hashed string gives hash
  * rows whose pairwise differences are constant across j (two of
  * the five q196 candidates shared ALL 4 buckets — a collision
  * never averages out), and multiplier remixes/Lehmer steps are
  * LINEAR in the salt, so consecutive salts give arithmetic bucket
  * progressions and the (j, l) cell occupancy clumped at 2.6-12×
  * the Poisson std. The seam here is therefore the engine's
  * NONLINEAR scramble (the q154/Redact device): two Lehmer steps
  * with a SQUARING in between, s = ((f·1000003 + i·8191 + k)² mod
  * P)·48271 mod P over the Mersenne prime — measured cell std 8.1
  * vs Poisson 7.7. Coins use draw ids k = 1..3; hash_j(v) squares
  * the VALUE's fingerprint with i = j, k = 7. Same
  * NOT-LDP-until-the-client-swaps-the-CSPRNG caveat as [[LocalDp]];
  * p, q, (p−q) inline driver-side so both engines share exact
  * doubles.
  * Scale shape: ONE report row per client — a (h·m·2)-cell
  * partial-agg count builds the sketch whatever the client count;
  * decode is candidate-list-sized arithmetic over the bounded cell
  * table. Nothing data-sized past the map side, and the value
  * domain is never enumerated at collection time.
  */
object CmsLdp {

  /** Per-client one-bit reports (j, l, y). `rowKey` must be unique
    * per row; NULL values drop (no report).
    */
  def reports(df: DataFrame, value: Column, rowKey: Column,
      h: Int, m: Int, epsilonTicks: Long = 1000000L,
      seed: Long = 0L): DataFrame = {
    require(h >= 1 && m >= 2, "need h >= 1 hash rows, m >= 2 columns")
    require(epsilonTicks > 0, "epsilon must be positive")
    val eps = epsilonTicks / 1e6
    val pFlip = 1.0 / (1.0 + math.exp(eps))
    val rows = df.select(value.cast("string").as("_v"),
        rowKey.cast("string").as("_rk"))
      .filter(col("_v").isNotNull)
    val f = TextAnalysis.fingerprint(
      concat_ws("\u0001", col("_rk"), lit(s"$seed:cms")))
    val j = floor(unif(f, lit(0), 1) * lit(h)).cast("int")
    val l = floor(unif(f, lit(0), 2) * lit(m)).cast("int")
    val flip = unif(f, lit(0), 3) < lit(pFlip)
    val x = bucket(col("_v"), j, m) === l
    rows.select(j.as("j"), l.as("l"), (x =!= flip).as("y"))
  }

  /** The (h × m × {0,1}) sketch: report counts per cell and bit —
    * bounded by the SKETCH dimensions at any client count.
    */
  def sketch(reports: DataFrame): DataFrame =
    reports.groupBy(col("j"), col("l"), col("y"))
      .agg(count(lit(1)).as("c"))

  /** Decode: estimated frequency of every candidate value from the
    * sketch cells (a bounded driver read by construction).
    */
  def estimates(sk: DataFrame, candidates: Seq[String], h: Int,
      m: Int, epsilonTicks: Long): DataFrame = {
    require(candidates.nonEmpty, "decode needs candidate values")
    require(candidates.size <= 65536,
      "candidate list exceeds 65536 — decode is candidate-sized" +
        " driver arithmetic; probe in batches")
    val eps = epsilonTicks / 1e6
    val p = math.exp(eps) / (1.0 + math.exp(eps))
    val q = 1.0 - p
    val d = p - q
    val spark = sk.sparkSession
    val cells = sk.collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getBoolean(2)),
        r.getLong(3))).toMap
    val n = cells.values.sum
    val est = candidates.map { v =>
      val t = (0 until h).map(j =>
        cells.getOrElse((j, bucketScala(v, j, m), true), 0L)).sum
      val fHat = ((m * t - n * q) / d - n.toDouble / m) * m / (m - 1)
      (v, BigDecimal(fHat)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    import spark.implicits._
    est.toDF("value", "est_n")
  }

  /** Frequency release end-to-end (batch): reports → sketch →
    * candidate decode.
    */
  def frequency(df: DataFrame, value: Column, rowKey: Column,
      candidates: Seq[String], h: Int = 4, m: Int = 64,
      epsilonTicks: Long = 1000000L, seed: Long = 0L): DataFrame =
    estimates(sketch(reports(df, value, rowKey, h, m, epsilonTicks,
      seed)), candidates, h, m, epsilonTicks)

  private val P = 2147483647L

  /** The nonlinear scramble (two Lehmer steps with a squaring in
    * between — see the seam note above), as a uniform in [0, 1).
    */
  private def unif(f: Column, i: Column, k: Int): Column = {
    val s1 = (f * lit(1000003L) + i.cast("long") * lit(8191L) +
      lit(k.toLong)) % lit(P)
    ((s1 * s1 % lit(P)) * lit(48271L) % lit(P) + lit(0.5)) / lit(P.toDouble)
  }

  /** hash_j(v): the value fingerprint through the scramble at
    * (i = j, k = 7), scaled to m.
    */
  private def bucket(v: Column, j: Column, m: Int): Column =
    floor(unif(TextAnalysis.fingerprint(v), j, 7) * lit(m)).cast("int")

  private[operators] def bucketScala(v: String, j: Int, m: Int): Int = {
    val f = v.foldLeft(0L)((acc, ch) =>
      (acc * 31 + ch.toLong) % 1000000007L)
    val s1 = (f * 1000003L + j * 8191L + 7L) % P
    val u = ((s1 * s1 % P) * 48271L % P + 0.5) / P.toDouble
    (u * m).toInt
  }

  /** Q196 — open-domain sketch release of the customer segment
    * distribution: h = 4, m = 64, ε = 2, decoded for the five known
    * segments (which the mechanism never enumerated at collection).
    */
  def q196CmsFrequency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    frequency(Tables.load(spark, dir, "customer"),
        $"c_mktsegment", $"c_custkey",
        candidates = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
          "HOUSEHOLD", "MACHINERY"),
        h = 4, m = 64, epsilonTicks = 2000000L, seed = 196L)
      .orderBy($"value")
  }

  /** DuckDB oracle for [[q196CmsFrequency]] — the same one-bit
    * channel, sketch cells and single-closed-form decode.
    */
  def cmsOracleSql(h: Int = 4, m: Int = 64,
      epsilonTicks: Long = 2000000L, seed: Long = 196L): String = {
    val eps = epsilonTicks / 1e6
    val pFlip = 1.0 / (1.0 + math.exp(eps))
    val p = math.exp(eps) / (1.0 + math.exp(eps))
    val q = 1.0 - p
    val d = p - q
    val P = 2147483647L
    val cand = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY")
    val candSql = cand.map(c => s"('$c')").mkString(", ")
    // the nonlinear scramble as SQL: s1 aliased so the squaring
    // doesn't inline the fingerprint twice
    def s1(fCol: String, iExpr: String, k: Int): String =
      s"(($fCol * 1000003 + ($iExpr) * 8191 + $k) % $P)"
    def unifOf(s1Col: String): String =
      s"((($s1Col * $s1Col % $P) * 48271 % $P + 0.5) / $P.0)"
    s"""WITH rows_ AS (
       |  SELECT c_mktsegment::VARCHAR AS _v, c_custkey::VARCHAR AS _rk
       |  FROM customer WHERE c_mktsegment IS NOT NULL),
       | fpd AS (
       |  SELECT _v,
       |    (${TextAnalysis.fingerprintSql(
            "concat_ws(chr(1), _rk, '" + seed + ":cms')")}) AS f
       |  FROM rows_),
       | sd AS (
       |  SELECT _v, ${s1("f", "0", 1)} AS a1, ${s1("f", "0", 2)} AS a2,
       |    ${s1("f", "0", 3)} AS a3
       |  FROM fpd),
       | rep AS (
       |  SELECT _v,
       |    floor(${unifOf("a1")} * $h)::INT AS j,
       |    floor(${unifOf("a2")} * $m)::INT AS l,
       |    (${unifOf("a3")} < $pFlip) AS flip
       |  FROM sd),
       | rep2 AS (
       |  SELECT j, l, flip,
       |    ${s1(s"(${TextAnalysis.fingerprintSql("_v")})", "j", 7)} AS b1
       |  FROM rep),
       | bits AS (
       |  SELECT j, l,
       |    ((floor(${unifOf("b1")} * $m)::INT = l) != flip) AS y
       |  FROM rep2),
       | n AS (SELECT count(*)::BIGINT AS n FROM bits),
       | cd AS (SELECT v FROM (VALUES $candSql) t(v)),
       | cj0 AS (
       |  SELECT cd.v, lv.j,
       |    ${s1(s"(${TextAnalysis.fingerprintSql("cd.v")})", "lv.j", 7)}
       |      AS c1
       |  FROM cd, (SELECT unnest(range(0, $h))::INT AS j) lv),
       | cjl AS (
       |  SELECT v, j, floor(${unifOf("c1")} * $m)::INT AS l FROM cj0),
       | tv AS (
       |  SELECT c.v, sum(CASE WHEN b.y THEN 1 ELSE 0 END)::BIGINT AS t
       |  FROM cjl c LEFT JOIN bits b ON b.j = c.j AND b.l = c.l
       |  GROUP BY c.v)
       |SELECT tv.v AS value,
       |  round((($m * tv.t - n.n * $q) / $d - n.n / $m.0)
       |    * $m / ${m - 1}.0, 0)::BIGINT AS est_n
       |FROM tv, n
       |ORDER BY value""".stripMargin
  }
}
