package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deterministic integer-tick Lloyd's k-means over the `embeddings`
  * table — corpus clustering for mixture balancing, SemDeDup-style
  * cell construction, and per-cluster curation quotas, as an
  * ORACLE-CHECKED operator (the MLlib quantizer in
  * [[graft.operators.IvfIndex.build]] trades reproducibility for
  * learned cells and is spec-checked only; this one is equality-
  * reproducible in any engine).
  *
  * Determinism contract (the whole point of the design):
  *  - vectors are quantized to integer ticks `floor(x · tick)` —
  *    float→double cast and the multiply are IEEE-exact in any
  *    engine, floor is unambiguous (no round-half mode dependence);
  *  - every corpus-level reduction is a sum of integer-valued terms
  *    with magnitudes far below 2^53, so each partial sum is exact
  *    and the total is ORDER-INDEPENDENT — the float-sum
  *    nondeterminism that makes textbook k-means irreproducible
  *    never appears;
  *  - init is the q30 Knuth-hash pivot rule (`((id mod 2^31) ·
  *    2654435761) mod 2^31`, k smallest (h, id) — products stay
  *    < 2^63): no RNG, recomputable in SQL;
  *  - assignment is integer argmin of ‖q − c‖² with ties to the
  *    lower cluster id; updated centroids are re-quantized to ticks
  *    via `floor(S/n + 0.5)` (one exact-integer-derived double
  *    division — identical bits in any IEEE engine); an emptied
  *    cluster keeps its previous centroid.
  *
  * Scale shape: assignment is a shuffle-free projection — an
  * `array_min` over k (dist, id) structs against centroid LITERALS
  * (broadcast by the plan itself, k·d longs); the update is one
  * partial-agg'd shuffle on (cluster, dim) whose result is k·d rows —
  * codebook-sized, the same driver-side contract as the IVF
  * centroids. T iterations = T corpus scans, nothing grows with the
  * corpus except the scans. At 100 TB: fit on a hash-sampled slice
  * (the assignment projection then labels the full corpus in one
  * pass), or lower T — the operator is already minibatch-shaped.
  */
object KMeansTick {

  /** Squared L2 distance between an integer-tick vector column and a
    * centroid literal, as exact Long arithmetic.
    */
  private def sqDist(qv: Column, c: Array[Long]): Column =
    aggregate(
      zip_with(qv, lit(c), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, z) => acc + z)

  /** Argmin cluster id over centroid literals, ties to lower id.
    * No centroids (empty corpus) → null cluster: `array(…)` with zero
    * elements types as VOID and fails analysis, and the empty case
    * must stay runnable.
    */
  private def assignCol(qv: Column, cents: Seq[(Int, Array[Long])]): Column =
    if (cents.isEmpty) lit(null).cast("int")
    else array_min(array(cents.map { case (j, c) =>
      struct(sqDist(qv, c).as("d"), lit(j).as("cl"))
    }: _*)).getField("cl")

  /** Quantize `embedding: array<float>` to integer ticks. */
  def quantize(emb: DataFrame, tick: Int = 1000): DataFrame = {
    import emb.sparkSession.implicits._
    emb.select($"vec_id",
      transform($"embedding".cast("array<double>"),
        x => floor(x * tick).cast("long")).as("qv"))
  }

  /** Fit T Lloyd iterations; returns (assignments `(vec_id, cluster)`
    * ordered by nothing in particular, final centroid tick vectors).
    */
  def fit(emb: DataFrame, k: Int = 8, iters: Int = 2, tick: Int = 1000)
      : (DataFrame, Seq[(Int, Array[Long])]) = {
    import emb.sparkSession.implicits._
    val q = quantize(emb, tick)
    // Knuth-hash pivot init: k smallest (h, vec_id) in hash order.
    var cents: Seq[(Int, Array[Long])] = q
      .withColumn("h",
        (($"vec_id" % lit(2147483648L)) * lit(2654435761L)) % lit(2147483648L))
      .orderBy($"h", $"vec_id").limit(k)
      .select($"qv").collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](0).toArray) }.toSeq
    for (_ <- 1 to iters) {
      val assigned = q.withColumn("cl", assignCol($"qv", cents))
      // per-(cluster, dim) integer sums — k·d result rows (codebook-
      // sized), partial-agg'd map-side before the one shuffle
      val upd = assigned
        .select($"cl", posexplode($"qv").as(Seq("i", "v")))
        .groupBy($"cl", $"i")
        .agg(sum($"v").as("s"), count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cl, rows) =>
          val d = rows.sortBy(_.getInt(1))
          cl -> (d.map(_.getLong(2)), d.head.getLong(3))
        }
      cents = cents.map { case (j, old) =>
        upd.get(j) match {
          case Some((s, n)) =>
            (j, s.map(si => math.floor(si.toDouble / n + 0.5).toLong).toArray)
          case None => (j, old) // emptied cluster keeps its centroid
        }
      }
    }
    (q.select($"vec_id", assignCol($"qv", cents).as("cluster")), cents)
  }

  /** Q90 — 8-cluster, 2-iteration tick k-means assignment. */
  def q90Clusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (assigned, _) = fit(Tables.load(spark, dir, "embeddings"))
    assigned.orderBy($"vec_id")
  }

  /** Per-cluster PROTOTYPES — the m most-central members of each
    * cluster by tick distance: cluster-balanced data selection
    * (keep representative cores, drop redundant tails — the
    * prototype-selection half of SemDeDup-style pruning, and the
    * per-topic quota a balanced training mixture draws from).
    * Deterministic end to end: distances are exact integers and ties
    * break by vec_id, so the oracle recomputes it all in SQL.
    *
    * Shape: one more corpus projection (the same argmin struct, kept
    * once via a bound column) feeding a bounded-heap per-cluster
    * top-m — partial heaps before the exchange, k·m rows out.
    */
  def prototypes(emb: DataFrame, k: Int = 8, iters: Int = 2,
      m: Int = 10, tick: Int = 1000): DataFrame = {
    import emb.sparkSession.implicits._
    import org.apache.spark.sql.Encoders
    val (_, cents) = fit(emb, k, iters, tick)
    val q = quantize(emb, tick)
    val best = // empty corpus → no centroids → typed-null struct
      if (cents.isEmpty)
        struct(lit(null).cast("bigint").as("d"), lit(null).cast("int").as("cl"))
      else array_min(array(cents.map { case (j, c) =>
        struct(sqDist($"qv", c).as("d"), lit(j).as("cl"))
      }: _*))
    val scored = q.withColumn("s", best)
      .select($"vec_id", $"s.cl".as("cluster"), $"s.d".as("d"))
    val tk = udaf(new graft.functions.TopKAgg(m),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    // TopKAgg keeps (sim DESC, id ASC); feeding sim = −d gives
    // (d ASC, vec_id ASC) — closest members, deterministic ties
    scored.groupBy($"cluster")
      .agg(tk($"vec_id", -$"d".cast("double")).as("t"))
      .select($"cluster", explode($"t").as("p"))
      .select($"cluster", $"p.vec_id".as("vec_id"),
        (-$"p.sim").cast("long").as("dist"))
  }

  /** Q93 — 10 prototypes per cluster of the q90 clustering. */
  def q93Prototypes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    prototypes(Tables.load(spark, dir, "embeddings"))
      .orderBy($"cluster", $"dist", $"vec_id")
  }
}
