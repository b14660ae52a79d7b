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

  /** Deterministic pivot-based coarse quantizer — IVF with a random
    * (hash-sampled) coarse quantizer instead of a learned k-means one.
    * Pivots are the `nLists` corpus vectors minimizing the portable
    * hash `((vec_id mod 2^31) · 2654435761) mod 2^31` (Knuth
    * multiplicative; the id is masked to 31 bits BEFORE the multiply
    * so the product stays < 2^63 — plain BIGINT arithmetic that never
    * overflows, in Spark or an oracle engine that raises on BIGINT
    * overflow, at any corpus size); a vector's cell is its
    * highest-cosine pivot, smaller pivot index on ties.
    *
    * Fully deterministic end-to-end ⇒ a DuckDB oracle can recompute
    * pivot selection, cell assignment, probe-cell choice, and the
    * rerank exactly (q30's equality contract — see [[oracleSql]]).
    * The learned k-means quantizer ([[build]]) stays as the
    * quality-cells API; it trades oracle-reproducibility for tighter
    * cells, and is spec-checked instead.
    *
    * Cell assignment is one shuffle-free projection: an
    * `array_max` over nLists (sim, -pivotIdx) structs, each sim a
    * fused codegen'd cosine against a pivot literal.
    */
  def buildPivots(emb: DataFrame, nLists: Int = 16): (DataFrame, Model) = {
    import emb.sparkSession.implicits._
    val pivots = emb
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .withColumn("h",
        (($"vec_id" % lit(2147483648L)) * lit(2654435761L)) % lit(2147483648L))
      .orderBy($"h", $"vec_id").limit(nLists)
      .select($"vec_id", $"e").as[(Long, Array[Double])].collect()
    val model = Model(pivots.zipWithIndex.map { case ((_, c), i) => (i, c) })
    (assign(emb, model), model)
  }

  /** Assign vectors to cells under a FROZEN coarse quantizer — the
    * incremental-maintenance primitive. At 100 TB the index cannot be
    * rebuilt per ingest batch: the quantizer (pivots or trained
    * centroids) is fit once on a base corpus, and every subsequent
    * batch is assigned under it and APPENDED to the cell-partitioned
    * store — per-batch cost O(batch · nLists · d), shuffle-free, no
    * touch of existing index rows. Because assignment is per-row
    * against model literals, growing the index incrementally yields
    * bit-identical cells to re-assigning the whole corpus under the
    * same model (spec-checked; q101's DuckDB oracle recomputes the
    * grown index exactly, pivots restricted to the base corpus).
    * Centroid drift under a growing corpus is the usual IVF trade:
    * recall for new-distribution rows degrades gradually; re-fit the
    * quantizer and re-assign on a schedule, not per batch.
    */
  def assign(emb: DataFrame, model: Model): DataFrame = {
    import emb.sparkSession.implicits._
    // an empty quantizer (fit on an empty base corpus): an empty
    // batch must still analyze and execute (the zero-row-day
    // contract — `array_max(array())` would fail analysis with a
    // VOID element type), but any actual ROW reaching this plan is a
    // misconfiguration that must stay LOUD — silently assigning null
    // cells would make every such row invisible to topK forever
    if (model.centroids.isEmpty)
      return emb.withColumn("cell", raise_error(lit(
        "IvfIndex.assign: the quantizer has no centroids (fit on an " +
          "empty base corpus) — re-fit before assigning rows")).cast("int"))
    val entries = model.centroids.map { case (cid, c) =>
      struct(
        Similarity.cosineSim($"embedding", typedLit(c.toSeq)).as("sim"),
        lit(-cid).as("negid"))
    }
    emb.withColumn("cell",
      (-array_max(array(entries.toIndexedSeq: _*)).getField("negid")).cast("int"))
  }

  /** DuckDB SQL reproducing `topK(buildPivots(embeddings), probes, k)`
    * exactly — the q30 oracle. Mirrors [[buildPivots]]: same pivot
    * hash order, same cosine argmax tie-breaks, same nProbe cells.
    */
  def oracleSql(probeIds: Seq[Long] = Seq(0L, 1L, 2L), k: Int = 10,
      nLists: Int = 16, nProbe: Int = 4, pivotWhere: String = ""): String =
    s"""WITH pv AS (SELECT * FROM (
       |    SELECT row_number() OVER (
       |        ORDER BY ((vec_id % 2147483648) * 2654435761) % 2147483648,
       |          vec_id) - 1 AS pid,
       |      embedding::DOUBLE[] AS pe
       |    FROM embeddings $pivotWhere) WHERE pid < $nLists),
       | corpus AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       | asg AS (SELECT vec_id, e, pid AS cell FROM (
       |    SELECT c.vec_id, c.e, pv.pid, row_number() OVER (
       |        PARTITION BY c.vec_id
       |        ORDER BY list_cosine_similarity(c.e, pv.pe) DESC, pv.pid) AS rn
       |    FROM corpus c CROSS JOIN pv) WHERE rn = 1),
       | pc AS (SELECT probe_id, pid AS cell, pemb FROM (
       |    SELECT c.vec_id AS probe_id, c.e AS pemb, pv.pid, row_number() OVER (
       |        PARTITION BY c.vec_id
       |        ORDER BY list_cosine_similarity(c.e, pv.pe) DESC, pv.pid) AS rn
       |    FROM (SELECT * FROM corpus
       |          WHERE vec_id IN (${probeIds.mkString(", ")})) c
       |    CROSS JOIN pv) WHERE rn <= $nProbe),
       | sc AS (SELECT probe_id, a.vec_id,
       |          list_cosine_similarity(a.e, pc.pemb) AS sim
       |        FROM asg a JOIN pc USING (cell))
       |SELECT probe_id, vec_id, sim FROM sc
       |QUALIFY row_number() OVER (PARTITION BY probe_id
       |  ORDER BY sim DESC, vec_id) <= $k
       |ORDER BY probe_id, sim DESC, vec_id""".stripMargin

  /** Cell-restricted ALL-ROWS k-NN graph — the 100 TB path the exact
    * [[Similarity.knnGraph]] docstring promises: instead of the
    * triangle tile self-join's full N²·d pair work, every row probes
    * only its `nProbe` nearest coarse cells and is compared against
    * those cells' residents. Work drops to ≈ N²·d·(nProbe/nLists);
    * recall follows IVF's usual trade (rows near a cell boundary may
    * miss neighbors assigned elsewhere — raise nProbe to buy it
    * back) and is spec-checked against the exact graph.
    *
    * Shapes: probe-cell choice is a shuffle-free expression (sorted
    * struct-array over the nLists centroid literals — no driver
    * lookup per row); both join inputs repartition on `cell`
    * explicitly (multiplicative join, the AQE-coalescing trap); the
    * per-source top-k is the bounded-heap aggregate, partial BEFORE
    * the exchange. At warehouse scale the corpus side is persisted
    * partitioned-by-cell, so each row's probe touches nProbe
    * partitions — the same pruning contract as [[topK]].
    */
  def knnGraphInCells(emb: DataFrame, k: Int = 5, nLists: Int = 16,
      nProbe: Int = 2): DataFrame = {
    import emb.sparkSession.implicits._
    import org.apache.spark.sql.Encoders
    val (indexed, model) = buildPivots(emb, nLists)
    if (model.centroids.isEmpty) // empty corpus: graph of nothing
      return indexed.select($"vec_id", $"vec_id".as("nbr_id"),
        lit(0.0).as("sim")).filter(lit(false))
    val nParts = emb.sparkSession.sessionState.conf.numShufflePartitions
    // (−sim, pid) structs sort ascending = similarity descending with
    // pid tie-break — identical ordering to Model.nearestCells
    val cellStructs = model.centroids.map { case (cid, c) =>
      struct((-Similarity.cosineSim($"embedding", typedLit(c.toSeq)))
        .as("negsim"), lit(cid).as("pid"))
    }
    val probeSide = emb
      .withColumn("cells",
        slice(array_sort(array(cellStructs.toIndexedSeq: _*)), 1, nProbe))
      .select($"vec_id".as("src"), $"embedding".as("pe"),
        explode($"cells.pid").as("cell"))
      .repartition(nParts, $"cell")
    val corpusSide = indexed
      .select($"cell", $"vec_id".as("dst"), $"embedding".as("ce"))
      .repartition(nParts, $"cell")
    val scored = probeSide.join(corpusSide, "cell")
      .filter($"src" =!= $"dst")
      .select($"src", $"dst", Similarity.cosineSim($"pe", $"ce").as("sim"))
    val tk = udaf(new graft.functions.TopKAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    scored.groupBy($"src").agg(tk($"dst", $"sim").as("topk"))
      .select($"src".as("vec_id"), explode($"topk").as("t"))
      .select($"vec_id", $"t.vec_id".as("nbr_id"), $"t.sim".as("sim"))
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
