package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** SPARSE VECTOR TECHNIQUE — Dwork & Roth's `Sparse` (Algorithms 1-2,
  * "The Algorithmic Foundations of Differential Privacy" §3.6): given
  * an ORDERED list of sensitivity-1 counting queries, release WHICH
  * of them exceed a noisy threshold — identities and pass order only,
  * never the counts — halting after `c` positives. The privacy magic
  * is that NEGATIVE answers are free: the budget pays only for the
  * ≤ c queries that pass, so a release can probe an arbitrarily long
  * query list at fixed ε. `Sparse` = AboveThreshold restarted after
  * each positive with a FRESH threshold draw, each restart at ε/c:
  * threshold noise ρ_r ~ Lap(2c/ε), per-query noise ν_{r,i} ~
  * Lap(4c/ε), pass iff count_i + ν_{r,i} ≥ T + ρ_r.
  *
  * SEQUENTIAL semantics, driver-paced: the restart index of query i
  * is the number of positives before i — inherently a scan. The scan
  * runs on the DRIVER over the collected query list, which is
  * CATEGORY-DOMAIN-sized (≤ 4096, guarded loudly — the Mondrian
  * cut-table / generalize ladder-pick discipline: bounded driver
  * reads are fine, data-sized ones are not). The only data-sized
  * work is the one partial-agg groupBy that builds the counts.
  *
  * The draws ride the deterministic noise seam (fingerprint + Knuth
  * mix — driver-side Scala here, but `java.lang.Math.log` is exactly
  * the function Spark's `log` codegen calls, and DuckDB's `ln`
  * matches both on every prior oracle), keyed by (restart, category)
  * for ν and (restart) for ρ — distinct keys, one draw each, so the
  * r16 two-draws-one-key correlation hazard does not arise. Same
  * NOT-DP-until-production-swaps-the-CSPRNG caveat as the rest of
  * the family.
  */
object Svt {

  /** (rank, category) for the ≤ `c` queries that pass, in pass
    * order; queries are the non-NULL categories in ascending order,
    * their counts over `df`. `thresholdTicks` is T in plain counts
    * (not millionths); `epsilonTicks` is ε in millionths.
    */
  def aboveThreshold(df: DataFrame, category: Column, threshold: Long,
      c: Int, epsilonTicks: Long = 1000000L,
      seed: Long = 0L): DataFrame = {
    require(c >= 1, "need a positive answer budget c")
    require(epsilonTicks > 0, "epsilon must be positive")
    val spark = df.sparkSession
    val counts = df.select(category.cast("string").as("_cat"))
      .filter(col("_cat").isNotNull)
      .groupBy(col("_cat")).agg(count(lit(1)).as("_n"))
      .orderBy(col("_cat")).limit(4097)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(counts.length <= 4096,
      "category domain exceeds 4096 — SVT's query list is a bounded" +
        " driver read; band or bucket the category first")
    val eps = epsilonTicks / 1e6
    val bRho = 2.0 * c / eps
    val bNu = 4.0 * c / eps
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var restart = 1
    var i = 0
    while (restart <= c && i < counts.length) {
      val rho = lap(s"$restart\u0001$seed:svtT", bRho)
      var found = false
      while (!found && i < counts.length) {
        val (cat, n) = counts(i)
        val nu = lap(s"$restart\u0001$cat\u0001$seed:svt", bNu)
        if (n + nu >= threshold + rho) {
          out += ((restart, cat))
          found = true
        }
        i += 1
      }
      if (found) restart += 1
    }
    import spark.implicits._
    out.toSeq.toDF("rank", "category")
  }

  /** The seam's Laplace(b), driver-side — bit-identical to
    * [[Privacy.laplaceDraw]]'s column form (same fingerprint
    * polynomial, Knuth mix, inverse CDF; `Math.log` is the exact
    * function Spark's codegen calls).
    */
  private def lap(key: String, b: Double): Double = {
    val f = key.foldLeft(0L)((acc, ch) =>
      (acc * 31 + ch.toLong) % 1000000007L)
    val m = (f * 2654435761L) % 2147483648L
    val u = (m + 0.5) / 2147483648.0
    val cc = u - 0.5
    -b * math.signum(cc) * math.log(1.0 - 2.0 * math.abs(cc))
  }

  /** Q195 — which nations hold at least 68 customers, asked in name
    * order under SVT at ε = 1, at most c = 3 positives released.
    */
  def q195SvtNations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val joined = Tables.load(spark, dir, "customer")
      .join(broadcast(Tables.load(spark, dir, "nation")),
        $"c_nationkey" === $"n_nationkey")
    aboveThreshold(joined, $"n_name", threshold = 68L, c = 3,
        epsilonTicks = 1000000L, seed = 195L)
      .orderBy($"rank")
  }

  /** DuckDB oracle for [[q195SvtNations]] — the c = 3 restarts
    * unrolled as CTEs (the Mondrian unrolled-round pattern): p1 =
    * first passing index under ρ_1, p2 = first after p1 under ρ_2,
    * p3 = first after p2 under ρ_3.
    */
  def svtOracleSql(threshold: Long = 68L, epsilonTicks: Long = 1000000L,
      seed: Long = 195L): String = {
    val c = 3
    val eps = epsilonTicks / 1e6
    val bRho = 2.0 * c / eps
    val bNu = 4.0 * c / eps
    def fpSql(expr: String) = TextAnalysis.fingerprintSql(expr)
    def lapSql(keyExpr: String, b: Double) =
      s"""(-$b * sign((((((${fpSql(keyExpr)}) * 2654435761)
         |      % 2147483648 + 0.5) / 2147483648.0) - 0.5))
         |    * ln(1.0 - 2.0 * abs((((((${fpSql(keyExpr)}) * 2654435761)
         |      % 2147483648 + 0.5) / 2147483648.0) - 0.5))))""".stripMargin
    def rhoKey(r: Int) = s"concat_ws(chr(1), '$r', '$seed:svtT')"
    def nuKey(r: Int) =
      s"concat_ws(chr(1), '$r', _cat, '$seed:svt')"
    def passCte(r: Int) =
      s"""SELECT _i, _cat FROM q
         | WHERE _n + ${lapSql(nuKey(r), bNu)}
         |   >= $threshold + ${lapSql(rhoKey(r), bRho)}""".stripMargin
    s"""WITH q AS (
       |  SELECT n_name AS _cat, count(*)::BIGINT AS _n,
       |    row_number() OVER (ORDER BY n_name) AS _i
       |  FROM customer JOIN nation ON c_nationkey = n_nationkey
       |  WHERE n_name IS NOT NULL
       |  GROUP BY n_name),
       | p1 AS (SELECT min(_i) AS i FROM (${passCte(1)})),
       | p2 AS (SELECT min(_i) AS i FROM (${passCte(2)}) x, p1
       |   WHERE x._i > p1.i),
       | p3 AS (SELECT min(_i) AS i FROM (${passCte(3)}) x, p2
       |   WHERE x._i > p2.i)
       |SELECT r.rank, q._cat AS category
       |FROM (SELECT 1 AS rank, i FROM p1 UNION ALL
       |      SELECT 2, i FROM p2 UNION ALL
       |      SELECT 3, i FROM p3) r
       |JOIN q ON q._i = r.i
       |ORDER BY r.rank""".stripMargin
  }
}
