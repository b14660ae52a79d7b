package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-PQ — the composed production ANN stack at 100 TB: coarse cell
  * pruning (IVF) cuts the scan to nProbe/nLists of the corpus;
  * within surviving cells, ADC over PQ codes ranks candidates with
  * m byte-lookups per vector (no float math against the corpus); the
  * top `rerank` shortlist alone is re-scored exactly against the raw
  * embeddings. Each stage is an already-proven operator
  * ([[IvfIndex.buildPivots]], [[Quantize.pqCodesWith]]/ADC,
  * [[Similarity.topKPerProbe]]); this object is the composition
  * contract.
  *
  * Cost at scale: raw floats are touched for |probes|·rerank rows
  * only; everything between the scan and the rerank moves cell ids
  * and m-byte codes. Approximate end-to-end (cell pruning AND the
  * ADC shortlist both lose recall), so spec-checked for recall and
  * scan fraction, not oracle-checked.
  */
object IvfPq {

  def topK(emb: DataFrame, probeIds: Seq[Long], k: Int,
      nLists: Int = 16, nProbe: Int = 4, m: Int = 8, ksub: Int = 16,
      rerank: Int = 50): DataFrame = {
    import emb.sparkSession.implicits._
    val (indexed, model) = IvfIndex.buildPivots(emb, nLists)
    val codebooks = Quantize.hashPivotCodebooks(emb, m, ksub)

    val probeRows = emb.filter($"vec_id".isin(probeIds: _*))
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .as[(Long, Array[Double])].collect()
    val probeCells = probeRows.flatMap { case (id, v) =>
      model.nearestCells(v, nProbe).map(c => (id, c))
    }.toSeq.toDF("probe_id", "cell")
    val lutRows = Quantize.adcLutRows(emb, probeRows, codebooks, m, ksub)

    // candidates = corpus ∩ probe cells; ADC-rank them with the
    // per-row packed-code fold (no per-subspace shuffle)
    val candidates = indexed.select($"vec_id", $"cell")
      .join(broadcast(probeCells), "cell")
    val packed = Quantize.pqCodesPacked(emb, codebooks, m)
    val shortlist = Similarity.topKPerProbe(
      candidates.join(packed, "vec_id")
        .join(broadcast(lutRows), "probe_id")
        .select($"probe_id", $"vec_id",
          Quantize.adcFold(m, ksub).as("sim")),
      rerank)

    // exact rerank of the shortlist only
    val probeEmb = probeRows.toSeq.toDF("probe_id", "probe_emb")
    val exact = shortlist.select($"probe_id", $"vec_id")
      .join(emb.select($"vec_id", $"embedding"), "vec_id")
      .join(broadcast(probeEmb), "probe_id")
      .select($"probe_id", $"vec_id",
        Similarity.cosineSim($"embedding", $"probe_emb").as("sim"))
    Similarity.topKPerProbe(exact, k)
      .orderBy($"probe_id", $"sim".desc, $"vec_id")
  }
}
