package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Approximate nearest-neighbor search over embeddings via random-
  * hyperplane LSH — the scale path next to the exact brute-force scan
  * in [[Similarity]]. Brute force reads the whole corpus per probe;
  * at 100 TB the corpus must be bucketed so a probe touches only its
  * own (plus neighboring) buckets.
  *
  * Index = `nBits` seeded random hyperplanes; a vector's bucket is the
  * sign-bit string of its projections (cosine-LSH: collision
  * probability 1 − θ/π per bit). Query = same bucketing on probes,
  * multiprobe to all buckets within Hamming distance 1 (recall
  * insurance), equi-join on bucket, exact-cosine rerank, window top-k.
  * Everything is `functions._` expressions — the projections are
  * codegen'd zip_with/aggregate over array literals, no UDF.
  */
object AnnIndex {

  /** Deterministic unit-less hyperplanes (seeded Gaussian). */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  private def bucketOf(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val dot = aggregate(
        zip_with(emb.cast("array<double>"), typedLit(p.toSeq), (x, y) => x * y),
        lit(0.0), (a, x) => a + x)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucket every corpus vector: adds a `bucket` column. Persisted
    * once, reused across queries (partition/bucket the storage by
    * `bucket` at scale).
    */
  def index(embeddings: DataFrame, nBits: Int = 8, dim: Int = 64,
      seed: Long = 42L): DataFrame =
    embeddings.withColumn("bucket",
      bucketOf(col("embedding"), hyperplanes(nBits, dim, seed)))

  /** Top-k per probe, searching only buckets within Hamming ≤
    * `hammingRadius` of the probe's bucket. Probes are tiny → the
    * (probe × #probed-buckets) multiprobe expansion broadcasts; the
    * corpus is only ever equi-joined on `bucket`, never cross-joined.
    *
    * Radius trades recall for scan fraction: per-bit collision prob
    * is 1 − θ/π, so genuine near-dups (θ→0) land in the same bucket
    * with prob ≈ 1, while mid-range neighbors (θ ≈ 60°) need radius 2
    * on 8 bits (37/256 of the bucket space) for ~0.5 recall. Tune
    * radius per workload; dedup wants radius 1, retrieval 2+.
    */
  def topK(indexed: DataFrame, probes: DataFrame, k: Int = 10,
      nBits: Int = 8, dim: Int = 64, seed: Long = 42L,
      hammingRadius: Int = 2): DataFrame = {
    import indexed.sparkSession.implicits._
    val planes = hyperplanes(nBits, dim, seed)
    val probeB = probes
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_emb"))
      .withColumn("b0", bucketOf($"probe_emb", planes))
    // multiprobe: all bit-flip masks with popcount ≤ hammingRadius
    val flips = typedLit((0L until (1L << nBits))
      .filter(m => java.lang.Long.bitCount(m) <= hammingRadius))
    val expanded = probeB
      .withColumn("bucket", explode(transform(flips, f => $"b0".bitwiseXOR(f))))
      .drop("b0")
    // bounded-heap grouped top-k (partial agg before the shuffle) —
    // not a per-probe window, which would single-reducer each probe's
    // full candidate set
    val scored = indexed.join(broadcast(expanded), "bucket")
      .select($"probe_id", $"vec_id",
        Similarity.cosineSim($"embedding", $"probe_emb").as("sim"))
    Similarity.topKPerProbe(scored, k)
      .orderBy($"probe_id", $"sim".desc, $"vec_id")
  }

  /** DuckDB SQL that reproduces `topK(index(embeddings), probes, k)`
    * EXACTLY: the LSH is deterministic given the seed, so the seeded
    * hyperplanes and the multiprobe flip masks are inlined as literals
    * and the oracle recomputes bucketing, multiprobe expansion, and
    * the exact-cosine rerank itself. This is what moves q27 from
    * `no_oracle` to a full equality check — the approximation is part
    * of the contract, not an excuse to skip verification.
    *
    * (Double literals use Java's shortest round-trip repr; strtod
    * parsing recovers the identical bits. A sign flip on a projection
    * would need |dot| within 1 ulp of 0 — probability ~1e-11 across
    * the corpus.)
    */
  def oracleSql(probeIds: Seq[Long] = Seq(0L, 1L, 2L), k: Int = 10,
      nBits: Int = 8, dim: Int = 64, seed: Long = 42L,
      hammingRadius: Int = 2): String = {
    val planesLit = hyperplanes(nBits, dim, seed)
      .map(_.mkString("[", ", ", "]")).mkString("[\n  ", ",\n  ", "]")
    val masksLit = (0L until (1L << nBits))
      .filter(m => java.lang.Long.bitCount(m) <= hammingRadius)
      .mkString("[", ", ", "]")
    s"""WITH pl AS (SELECT $planesLit::DOUBLE[][] AS ps),
       | bkt AS (
       |  SELECT vec_id, e, list_sum(list_transform(range(1, ${nBits + 1}),
       |      j -> CASE WHEN list_dot_product(e, ps[j]) > 0
       |           THEN (1::BIGINT << (j - 1)) ELSE 0 END))::BIGINT AS bucket
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings), pl),
       | pr AS (SELECT vec_id AS probe_id, e AS pe, bucket AS b0
       |        FROM bkt WHERE vec_id IN (${probeIds.mkString(", ")})),
       | ex AS (SELECT probe_id, pe, xor(b0, m)::BIGINT AS bucket
       |        FROM pr CROSS JOIN (SELECT unnest($masksLit) AS m)),
       | sc AS (SELECT probe_id, c.vec_id,
       |          list_cosine_similarity(c.e, ex.pe) AS sim
       |        FROM bkt c JOIN ex USING (bucket))
       |SELECT probe_id, vec_id, sim FROM sc
       |QUALIFY row_number() OVER (PARTITION BY probe_id
       |  ORDER BY sim DESC, vec_id) <= $k
       |ORDER BY probe_id, sim DESC, vec_id""".stripMargin
  }
}
