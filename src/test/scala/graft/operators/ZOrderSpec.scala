package graft.operators

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala Morton reference: bit i of a → 2i, bit i of b → 2i+1. */
  private def morton(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 21) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("z-buckets on a 64×64 identity grid are exact 16×16 tiles — " +
      "BOTH dimensions narrow at once, where a single-key sort is " +
      "full-width in the other dimension") {
    // qbits=6 makes quantization the identity on 0..63, so the
    // geometry is exact: 4096 z-codes into 16 buckets = 256-code
    // tiles = 16×16 squares
    val grid = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val prof = Layout.zorderProfile(grid.toDF("a", "b"), "a", "b",
        qbits = 6, nBuckets = 16)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(prof.length === 16)
    for ((_, n, mina, maxa, minb, maxb) <- prof) {
      assert(n === 256L)
      assert(maxa - mina === 15L, s"a-span ${maxa - mina}")
      assert(maxb - minb === 15L, s"b-span ${maxb - minb}")
      assert(mina % 16 === 0 && minb % 16 === 0) // tile-aligned
    }
    // contrast: dealing the same grid into 16 buckets by a SINGLE
    // key leaves the other dimension full-width in every bucket
    val single = grid.toDF("a", "b")
      .selectExpr("a * 16 div 64 as bucket", "b")
      .groupBy($"bucket")
      .agg(org.apache.spark.sql.functions.expr("max(b) - min(b)").as("span"))
      .as[(Long, Long)].collect()
    assert(single.forall(_._2 === 63L))
  }

  test("the layered spread computes the reference Morton key on " +
      "randomized 21-bit inputs") {
    val rnd = new scala.util.Random(6363)
    val rows = Seq.fill(300)(
      (rnd.nextLong(1L << 21), rnd.nextLong(1L << 21)))
    // qbits=21 over inputs already spanning [0, 2^21): feed the raw
    // values through and read the zkey back via a 1-bucket profile…
    // instead probe directly: one bucket per distinct zkey is
    // impractical, so check bucket assignment against the reference
    // key for a coarse bucket count (buckets partition z-space, so
    // agreement on every row's bucket across 300 random draws pins
    // the interleave to the reference up to the bucket grain — and
    // the grid test above pins the fine structure exactly)
    val mn = rows.map(_._1).min min rows.map(_._2).min
    // force identity quantization: include the exact corners so
    // min = 0 and max = 2^21 − 1 on both dims
    val all = rows ++ Seq((0L, 0L), ((1L << 21) - 1L, (1L << 21) - 1L))
    assert(mn >= 0L)
    val prof = Layout.zorderProfile(all.toDF("a", "b"), "a", "b",
        qbits = 21, nBuckets = 1024)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // rebuild the expected bucket histogram from the reference morton
    val expBuckets = all.groupBy { case (a, b) =>
      morton(a, b) * 1024L / (1L << 42)
    }.view.mapValues(_.size.toLong).toMap
    val gotBuckets = prof.map(p => p._1 -> p._2).toMap
    assert(gotBuckets === expBuckets)
  }

  test("degenerate dimension: a constant dim quantizes to 0, occupied " +
      "z-codes compress into the low buckets, and the occupied " +
      "buckets still partition the live dim into disjoint ordered " +
      "ranges (z-order never interleaves a dead dimension's range)") {
    val rows = Seq.tabulate(256)(i => (i.toLong, 7L))
    val prof = Layout.zorderProfile(rows.toDF("a", "b"), "a", "b",
        qbits = 4, nBuckets = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    // spread(0..15) tops out at 85 of the 256 z-codes → only the low
    // buckets are occupied; every row is accounted for
    assert(prof.map(_._2).sum === 256L)
    for ((_, _, _, _, minb, maxb) <- prof)
      assert(minb === 7L && maxb === 7L)
    // the live dimension's per-bucket ranges are disjoint and ordered
    val ranges = prof.map(p => (p._3, p._4))
    for (Seq((_, hi), (lo2, _)) <- ranges.toSeq.sliding(2))
      assert(hi < lo2, s"overlapping ranges $ranges")
  }
}
