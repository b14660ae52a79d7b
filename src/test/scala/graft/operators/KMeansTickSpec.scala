package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMeansTickSpec extends SparkSpec {
  import spark.implicits._

  test("fit: two well-separated blobs recover the planted split") {
    // blob A around (1, 0, ...), blob B around (-1, 0, ...) — any
    // k-means with k=2 must split them regardless of init
    val emb = (0L until 20L).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      val jitter = (i % 5).toFloat * 0.01f
      (i, Array(base + jitter, 0.1f * (i % 3), 0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val (assigned, cents) = KMeansTick.fit(emb, k = 2, iters = 3)
    val byCl = assigned.collect().map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._1 % 2).map { case (p, rs) => p -> rs.map(_._2).toSet }
    assert(byCl(0L).size == 1 && byCl(1L).size == 1 && byCl(0L) != byCl(1L))
    assert(cents.size == 2)
  }

  test("fit: deterministic across runs and partitioning") {
    val emb = graft.core.Tables.load(spark, sf, "embeddings")
    val a = KMeansTick.fit(emb, k = 8, iters = 2)._1.collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val b = KMeansTick.fit(emb.repartition(7), k = 8, iters = 2)._1.collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(a.sameElements(b))
    assert(a.forall { case (_, cl) => cl >= 0 && cl < 8 })
    // every cluster id that survives the fit is actually used or was
    // carried by the empty-cluster rule — at minimum ≥ 2 clusters on
    // real data
    assert(a.map(_._2).distinct.length >= 2)
  }

  test("prototypes: most-central members, consistent with the fit assignment") {
    val emb = graft.core.Tables.load(spark, sf, "embeddings")
    val protos = KMeansTick.prototypes(emb, k = 8, iters = 2, m = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(protos.groupBy(_._1).values.forall(_.length <= 10))
    // prototypes carry the SAME cluster the fit assigns them
    val assign = KMeansTick.fit(emb, k = 8, iters = 2)._1.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    protos.foreach { case (cl, id, _) => assert(assign(id) == cl) }
    // each cluster's prototypes are its m smallest distances: no
    // non-prototype member of the cluster may beat a prototype
    val q = KMeansTick.quantize(emb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val cents = KMeansTick.fit(emb, k = 8, iters = 2)._2.toMap
    def d(id: Long, cl: Int): Long =
      q(id).zip(cents(cl)).map { case (x, y) => (x - y) * (x - y) }.sum
    protos.foreach { case (cl, id, dist) => assert(d(id, cl) == dist) }
    val byCl = protos.groupBy(_._1)
    byCl.foreach { case (cl, ps) =>
      val worst = ps.map(p => (p._3, p._2)).max
      assign.filter(_._2 == cl).keys
        .filterNot(id => ps.exists(_._2 == id))
        .foreach { id =>
          assert(Ordering[(Long, Long)].gt((d(id, cl), id), worst),
            s"member $id beats a prototype")
        }
    }
  }

  test("fit: iterations do not increase within-cluster tick cost") {
    // Lloyd's monotonicity, evaluated on the quantized corpus: the
    // assignment cost under (assignments_t, centroids_t) is
    // non-increasing in t. Re-tick rounding can nudge a centroid off
    // the exact mean, so allow the documented one-tick slack per dim.
    val emb = graft.core.Tables.load(spark, sf, "embeddings").limit(200).cache()
    def cost(iters: Int): Double = {
      val (assigned, cents) = KMeansTick.fit(emb, k = 4, iters = iters)
      val cmap = cents.toMap
      val q = KMeansTick.quantize(emb).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      assigned.collect().map { r =>
        val v = q(r.getLong(0)); val c = cmap(r.getInt(1))
        v.zip(c).map { case (x, y) => val d = (x - y).toDouble; d * d }.sum
      }.sum
    }
    val c1 = cost(1); val c3 = cost(3)
    // slack: 200 rows · 64 dims · (1 tick)^2
    assert(c3 <= c1 + 200.0 * 64.0)
  }
}
