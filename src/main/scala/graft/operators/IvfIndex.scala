package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor index — the
  * clustering-based alternative to the hyperplane-LSH [[AnnIndex]].
  * A seeded k-means coarse quantizer partitions the corpus into
  * `nLists` cells; a probe searches only its `nProbe` nearest cells
  * with the exact fused-cosine rerank.
  *
  * Scale shape: the corpus is stored partitioned by `cell` (partition
  * pruning serves each query from nProbe/nLists of the data); the
  * centroid table is tiny and lives on the driver/broadcast. Recall
  * is tunable via nProbe with no index rebuild — unlike LSH radius,
  * which trades bucket fan-out. Built on public Spark ML KMeans.
  */
object IvfIndex {

  final case class Model(centroids: Array[(Int, Array[Double])]) {
    def nearestCells(v: Array[Double], nProbe: Int): Seq[Int] =
      centroids.map { case (id, c) =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < v.length) {
          dot += v(i) * c(i); na += v(i) * v(i); nb += c(i) * c(i); i += 1
        }
        (id, dot / (math.sqrt(na) * math.sqrt(nb)))
      }.sortBy(-_._2).take(nProbe).map(_._1).toSeq
  }

  /** Fit the coarse quantizer and assign every vector to a cell.
    * Returns (indexed corpus with `cell` column, model).
    */
  def build(emb: DataFrame, nLists: Int = 16, seed: Long = 42L):
      (DataFrame, Model) = {
    import emb.sparkSession.implicits._
    val vecs = emb.withColumn("fv",
      array_to_vector($"embedding".cast("array<double>")))
    val km = new KMeans().setK(nLists).setSeed(seed)
      .setMaxIter(8) // a coarse quantizer needs rough cells, not convergence
      .setFeaturesCol("fv").setPredictionCol("cell")
    val model = km.fit(vecs)
    val indexed = model.transform(vecs).drop("fv")
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
    (indexed, Model(centroids))
  }

  /** Top-k per probe over the nProbe nearest cells only. Probe cell
    * assignment happens driver-side against the tiny centroid table;
    * the corpus is filtered by cell (partition pruning at scale) and
    * reranked with the exact fused cosine.
    */
  def topK(indexed: DataFrame, model: Model, probes: DataFrame,
      k: Int = 10, nProbe: Int = 4): DataFrame = {
    import indexed.sparkSession.implicits._
    val probeRows = probes.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect()
    val probeCells = probeRows.flatMap { case (id, v) =>
      model.nearestCells(v.map(_.toDouble), nProbe).map(c => (id, c))
    }.toSeq.toDF("probe_id", "cell")
    val probeEmb = probeRows.toSeq.toDF("probe_id", "probe_emb")
    // bounded-heap grouped top-k (partial agg before the shuffle) —
    // not a per-probe window over the reranked candidate set
    val scored = indexed.join(broadcast(probeCells), "cell")
      .join(broadcast(probeEmb), "probe_id")
      .select($"probe_id", $"vec_id",
        Similarity.cosineSim($"embedding", $"probe_emb").as("sim"))
    Similarity.topKPerProbe(scored, k)
      .orderBy($"probe_id", $"sim".desc, $"vec_id")
  }
}
