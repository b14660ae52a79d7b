package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Pin, Tables}

/** Embedding compression for vector-store layouts — per-vector
  * symmetric int8 quantization (the standard 4× shrink before ANN
  * serving: q_i = round(x_i · 127 / max|x|), dequantize by
  * q_i · scale). Pure per-row higher-order expressions: no shuffle,
  * no UDF, embarrassingly parallel, so quantizing 100 TB of vectors
  * costs exactly one read-transform-write pass.
  *
  * Determinism contract: every element op (float→double widening,
  * one multiply, one divide, round-half-away) is an IEEE
  * correctly-rounded operation both engines evaluate identically in
  * the same order; the only emitted float (`scale`) is rounded to 6
  * as the stable contract.
  */
object Quantize {

  private def maxAbs(e: Column): Column =
    array_max(transform(e, x => abs(x)))

  /** (vec_id, scale, q) with q the int8 code array. Zero vectors
    * quantize to all-zero codes with scale 0.
    */
  def int8(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    emb
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .withColumn("maxabs", maxAbs($"e"))
      .select($"vec_id",
        when($"maxabs" === 0.0, lit(0.0))
          .otherwise(round($"maxabs" / 127.0, 6)).as("scale"),
        when($"maxabs" === 0.0,
          transform($"e", _ => lit(0L)))
          .otherwise(transform($"e",
            x => round(x * 127.0 / $"maxabs").cast("long"))).as("q"))
  }

  /** Q56 — int8 codes over `embeddings`, emitted in oracle-hashable
    * form (codes as a CSV string, plus their exact integer sum).
    */
  def q56Int8Quantize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    int8(Tables.load(spark, dir, "embeddings"))
      .select($"vec_id", $"scale",
        array_join(transform($"q", _.cast("string")), ",").as("q_csv"),
        aggregate($"q", lit(0L), (acc, x) => acc + x).as("qsum"))
      .orderBy($"vec_id")
  }

  /** Product quantization — the IVF-PQ compression stage of a 100 TB
    * vector store: the dim-d space splits into `m` subspaces; each
    * subvector is replaced by the id of its nearest codebook entry
    * (min L2, smaller id on ties), shrinking d·4 bytes to m codes.
    *
    * Codebooks here are the pivot construction of
    * [[IvfIndex.buildPivots]] — the first `ksub` vectors in portable-
    * hash order donate their subvectors — rather than per-subspace
    * k-means, making the whole encoding deterministic and therefore
    * DuckDB-reproducible (q60's equality contract; a learned-codebook
    * variant would be spec-checked instead, the q30 trade). Encoding
    * is a typed per-partition loop over a broadcast codebook: one
    * corpus scan, no shuffle, no driver collect beyond the ksub
    * codebook rows.
    *
    * Every float op (cast, subtract, multiply, ordered sum, strict
    * compare) runs in the same order in both engines, so codes AND
    * distances are bit-identical; d2 is rounded to 6 as the stable
    * float contract.
    */
  def pqCodes(emb: DataFrame, m: Int = 8, ksub: Int = 16): DataFrame =
    pqCodesWith(emb, hashPivotCodebooks(emb, m, ksub), m)

  /** Codebooks from the deterministic hash-pivot construction:
    * cb(s)(p) = subvector s of the p-th hash-ordered vector.
    */
  def hashPivotCodebooks(emb: DataFrame, m: Int,
      ksub: Int): Array[Array[Array[Double]]] = {
    import emb.sparkSession.implicits._
    val h = (($"vec_id" % lit(2147483648L)) * lit(2654435761L)) %
      lit(2147483648L)
    val pivots: Array[Array[Double]] = emb
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .withColumn("h", h)
      .orderBy($"h", $"vec_id").limit(ksub)
      .select($"e").as[Array[Double]].collect()
    val dim = if (pivots.isEmpty) 0 else pivots.head.length // empty corpus
    val sub = dim / m
    Array.tabulate(m, pivots.length, sub)((s, p, d) =>
      pivots(p)(s * sub + d))
  }

  /** Learned codebooks: one Spark ML k-means per subspace over the
    * projected subvectors — the quality path [[pqCodes]]'s Scaladoc
    * documents (k-means minimizes exactly the quantization MSE the
    * encoder pays). Deterministic for a fixed seed but not
    * engine-reproducible, so learned-codebook encodings are
    * spec-checked, not oracle-checked (the q30 trade).
    */
  def learnedCodebooks(emb: DataFrame, m: Int = 8, ksub: Int = 16,
      seed: Long = 42L): Array[Array[Array[Double]]] = {
    import emb.sparkSession.implicits._
    import org.apache.spark.ml.functions.array_to_vector
    val e = emb.select($"embedding".cast("array<double>").as("e"))
      .transform(Pin.reuse)
    val first = e.head(1)
    // nothing to learn from an empty corpus — and returning empty
    // codebooks would make every later encode silently emit code -1;
    // fail here, with the actual reason instead of head()'s bare
    // NoSuchElementException
    require(first.nonEmpty,
      "learnedCodebooks: cannot learn PQ codebooks from an empty corpus")
    val dim = first.head.getSeq[Double](0).length
    val sub = dim / m
    (0 until m).map { s =>
      val slice = e.select(array_to_vector(
        org.apache.spark.sql.functions.slice($"e", s * sub + 1, sub))
        .as("features"))
      val km = new org.apache.spark.ml.clustering.KMeans()
        .setK(ksub).setSeed(seed + s).setMaxIter(10)
      km.fit(slice).clusterCenters.map(_.toArray)
    }.toArray
  }

  /** Per-probe ADC lookup table rows (probe_id, s, code, L2 part) —
    * m·ksub doubles per probe, built driver-side.
    */
  private[operators] def adcLut(probes: Array[(Long, Array[Double])],
      codebooks: Array[Array[Array[Double]]],
      m: Int): Seq[(Long, Long, Long, Double)] =
    probes.toSeq.flatMap { case (pid, q) =>
      val sub = q.length / m
      for (s <- 0 until m; p <- codebooks(s).indices) yield {
        var d2 = 0.0
        var d = 0
        while (d < sub) {
          val diff = q(s * sub + d) - codebooks(s)(p)(d)
          d2 += diff * diff
          d += 1
        }
        (pid, s.toLong, p.toLong, d2)
      }
    }

  /** Packed encode: ONE row per vector, codes as an m-length array —
    * the layout ADC actually wants (q60 keeps the per-(vec, s) rows
    * because the oracle contract hashes them; both come from the
    * same loop).
    */
  def pqCodesPacked(emb: DataFrame,
      codebooks: Array[Array[Array[Double]]], m: Int): DataFrame = {
    import emb.sparkSession.implicits._
    emb.select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, e) =>
        require(e.length % m == 0, s"dim ${e.length} not divisible by $m")
        val sub = e.length / m
        val codes = new Array[Long](m)
        var s = 0
        while (s < m) {
          val cb = codebooks(s)
          var best = -1
          var bestD = Double.MaxValue
          var p = 0
          while (p < cb.length) {
            var d2 = 0.0
            var d = 0
            while (d < sub) {
              val diff = e(s * sub + d) - cb(p)(d)
              d2 += diff * diff
              d += 1
            }
            if (d2 < bestD) { bestD = d2; best = p }
            p += 1
          }
          codes(s) = best.toLong
          s += 1
        }
        (id, codes)
      })
      .toDF("vec_id", "codes")
  }

  /** Encode against explicit per-subspace codebooks. */
  def pqCodesWith(emb: DataFrame,
      codebooks: Array[Array[Array[Double]]], m: Int): DataFrame = {
    import emb.sparkSession.implicits._
    emb.select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .as[(Long, Array[Double])]
      .mapPartitions(_.flatMap { case (id, e) =>
        require(e.length % m == 0, s"dim ${e.length} not divisible by $m")
        val sub = e.length / m
        (0 until m).iterator.map { s =>
          val cb = codebooks(s)
          var best = -1
          var bestD = Double.MaxValue
          var p = 0
          while (p < cb.length) {
            var d2 = 0.0
            var d = 0
            while (d < sub) {
              val diff = e(s * sub + d) - cb(p)(d)
              d2 += diff * diff
              d += 1
            }
            if (d2 < bestD) { bestD = d2; best = p } // ties keep min id
            p += 1
          }
          (id, s.toLong, best.toLong, bestD)
        }
      })
      .toDF("vec_id", "s", "code", "d2")
      .select($"vec_id", $"s", $"code", round($"d2", 6).as("d2"))
  }

  /** Q60 — PQ codes (8 subspaces × 16 hash-pivot centroids) over
    * `embeddings`, one row per (vector, subspace).
    */
  def q60PqCodes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pqCodes(Tables.load(spark, dir, "embeddings"))
      .orderBy($"vec_id", $"s")
  }

  /** ADC (asymmetric distance) search over PQ codes — how a vector
    * store actually queries compressed vectors: per probe, a tiny
    * m×ksub lookup table of exact probe-subvector↔centroid L2 parts
    * is built once (driver-side, m·ksub doubles) and broadcast; each
    * corpus vector's approximate distance is then m table lookups
    * summed — no float math against the corpus at all, which is the
    * whole point at 100 TB (codes are m bytes; raw floats never
    * leave disk). Returns the k nearest (smallest approximate L2)
    * per probe through the bounded-heap grouped top-k; approximate
    * by construction, so spec-checked for recall against the exact
    * scan rather than oracle-checked.
    *
    * Recall honesty: hash-pivot codebooks on the driver's
    * UNSTRUCTURED random embeddings measure ~0.33–0.47 recall@10
    * (16–23× better than random) — the floor case for PQ, which
    * thrives on clustered real embeddings. The quality path is
    * per-subspace k-means codebooks (the learned-vs-reproducible
    * trade [[IvfIndex.build]] documents); ADC and the code layout
    * are identical either way.
    */
  def pqAdcTopK(emb: DataFrame, probeIds: Seq[Long], k: Int,
      m: Int = 8, ksub: Int = 16,
      codebooksOpt: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
    import emb.sparkSession.implicits._
    val codebooks = codebooksOpt.getOrElse(hashPivotCodebooks(emb, m, ksub))
    val probes = emb.filter($"vec_id".isin(probeIds: _*))
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .as[(Long, Array[Double])].collect()
    Similarity.topKPerProbe(
      adcScores(pqCodesPacked(emb, codebooks, m), probes, codebooks,
        m, ksub), k)
      .select($"probe_id", $"vec_id", (-$"sim").as("adc"))
  }

  /** ADC scoring over PACKED codes: each probe's LUT ships as a
    * flattened broadcast literal and the approximate distance is m
    * `element_at` lookups folded per ROW — no per-(vec, subspace)
    * join, no aggregation shuffle; the only exchange left in an ADC
    * query is the bounded-heap top-k merge. (The first formulation
    * shuffled m rows per corpus vector through a join + groupBy —
    * m× corpus rows of needless exchange at 100 TB.)
    * Returns (probe_id, vec_id, sim = −distance).
    */
  private[operators] def adcScores(packed: DataFrame,
      probes: Array[(Long, Array[Double])],
      codebooks: Array[Array[Array[Double]]], m: Int,
      ksub: Int): DataFrame = {
    import packed.sparkSession.implicits._
    packed.crossJoin(broadcast(adcLutRows(packed, probes, codebooks, m, ksub)))
      .select($"probe_id", $"vec_id", adcFold(m, ksub).as("sim"))
  }

  /** One row per probe: (probe_id, lut) with the flattened m·ksub
    * lookup table.
    */
  private[operators] def adcLutRows(session: DataFrame,
      probes: Array[(Long, Array[Double])],
      codebooks: Array[Array[Array[Double]]], m: Int,
      ksub: Int): DataFrame = {
    import session.sparkSession.implicits._
    probes.toSeq.map { case (pid, q) =>
      val flat = new Array[Double](m * ksub)
      adcLut(Array((pid, q)), codebooks, m).foreach {
        case (_, s, code, part) => flat(s.toInt * ksub + code.toInt) = part
      }
      (pid, flat.toSeq)
    }.toDF("probe_id", "lut")
  }

  /** The per-row ADC fold: m `element_at` lookups over `lut` indexed
    * by `codes`, negated so bigger = closer (top-k heap order).
    */
  private[operators] def adcFold(m: Int, ksub: Int): Column =
    -aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
        (c, s) => element_at(col("lut"), (s * ksub + c + 1).cast("int"))),
      lit(0.0), (acc, x) => acc + x)
}
