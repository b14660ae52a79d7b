package graft.functions

import graft.SparkSpec
import graft.operators.Profiling

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference CMS — same hash formula, single-threaded
    * single-pass; the distributed sketch must reproduce it exactly.
    */
  private def refCms(hs: Seq[Long], depth: Int, width: Int): Array[Long] = {
    val M = 2147483647L
    val m = new Array[Long](depth * width)
    for (h <- hs; i <- 0 until depth) {
      val g = (((h + i) * 48271L) % M) * 48271L % M
      m(i * width + (g % width).toInt) += 1L
    }
    m
  }

  private def refEst(h: Long, m: Array[Long], depth: Int, width: Int): Long = {
    val M = 2147483647L
    (0 until depth).map { i =>
      val g = (((h + i) * 48271L) % M) * 48271L % M
      m(i * width + (g % width).toInt)
    }.min
  }

  /** Plain-Scala twin of the engine-portable fingerprint fold
    * (code-point polynomial ×31 mod 1e9+7 — FingerprintExprSpec pins
    * the Spark side against the HOF formulation of the same fold).
    */
  private def fp(s: String): Long = {
    var acc = 0L
    s.codePoints().forEach(cp => acc = (acc * 31L + cp) % 1000000007L)
    acc
  }

  test("agg fold/merge reproduce the reference matrix under any split " +
      "and merge order") {
    val (depth, width) = (4, 16)
    val agg = new CountMinAgg(depth, width)
    val rnd = new scala.util.Random(4040)
    for (trial <- 1 to 20) {
      val hs = Seq.fill(150)(rnd.nextInt(1000000007).toLong)
      val want = refCms(hs, depth, width)
      // one-shot fold (reduce mutates its buffer — fresh zero each run)
      assert(hs.foldLeft(agg.zero)(agg.reduce).toSeq === want.toSeq,
        s"fold, trial=$trial")
      // random split, merged in both orders (buffers rebuilt per
      // merge: the additive merge mutates its left argument)
      val cut = 1 + rnd.nextInt(hs.length - 1)
      val (l, r) = hs.splitAt(cut)
      def bl = l.foldLeft(agg.zero)(agg.reduce)
      def br = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(bl, br).toSeq === want.toSeq, s"merge, trial=$trial")
      assert(agg.merge(br, bl).toSeq === want.toSeq,
        s"merge order, trial=$trial")
    }
    // empty input: finish yields the all-zero matrix, not the sentinel
    assert(agg.finish(agg.zero).toSeq === Seq.fill(depth * width)(0L))
  }

  test("sketch estimates: overcount-only, exact on a collision-free " +
      "width, and equal to the reference CMS") {
    val (depth, width) = (4, 32)
    // skewed corpus: item-0 hot, long tail
    val items = Seq.tabulate(600)(i => s"item-${i % 40}") ++
      Seq.fill(200)("item-0")
    val df = items.toDF("v")
    val cms = Profiling.cmsSketch(df, "v", depth, width)
      .as[Array[Long]].head()
    // distributed matrix ≡ single-threaded reference on the same hashes
    val hs = items.map(s => fp(s))
    assert(cms.toSeq === refCms(hs, depth, width).toSeq)
    // probe every distinct item: estimate ≥ exact always (CMS cells
    // only ever add), and ≡ the reference estimate
    val exact = items.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val probed = Profiling.cmsProbe(
        exact.keys.toSeq.toDF("v"), "v",
        Profiling.cmsSketch(df, "v", depth, width), depth, width)
      .as[(String, Long)].collect().toMap
    for ((item, n) <- exact) {
      assert(probed(item) >= n, s"$item undercounted: ${probed(item)} < $n")
      assert(probed(item) ===
        refEst(fp(item), cms, depth, width))
    }
    // generous wide sketch: no collisions among 40 items in 4×4096
    // rows is overwhelmingly likely under the scramble — exact probes
    val wide = Profiling.cmsProbe(
        exact.keys.toSeq.toDF("v"), "v",
        Profiling.cmsSketch(df, "v", depth, 4096), depth, 4096)
      .as[(String, Long)].collect().toMap
    for ((item, n) <- exact)
      assert(wide(item) === n, s"$item wide-sketch estimate off")
  }

  test("matrix is bit-identical under any repartitioning (additive merge)") {
    val items = Seq.tabulate(800)(i => s"u-${i % 97}")
    def m(parts: Int) = Profiling.cmsSketch(
      items.toDF("v").repartition(parts), "v", 4, 64)
      .as[Array[Long]].head().toSeq
    assert(m(1) === m(7))
    assert(m(7) === m(32))
  }
}
