package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  test("lossless round-trip: the decoded luma grid of a rendered PNG " +
      "and BMP equals the formula's 2x2 box means exactly") {
    for (fmt <- Seq("png", "bmp"); id <- Seq(0L, 7L, 101L, 4099L)) {
      val got = ImageHash.lumaGrid(ImageHash.render(id, 1, fmt))
      val want = Array.tabulate(64) { i =>
        val r = i / 8; val c = i % 8
        (ImageHash.lumaAt(id, 2 * c, 2 * r) +
          ImageHash.lumaAt(id, 2 * c, 2 * r + 1) +
          ImageHash.lumaAt(id, 2 * c + 1, 2 * r) +
          ImageHash.lumaAt(id, 2 * c + 1, 2 * r + 1)) / 4
      }
      assert(got.toSeq === want.toSeq, s"$fmt id=$id")
    }
  }

  test("planted variants hash identically to their base: a 2x " +
      "nearest-neighbor resize and a BMP re-encode are Hamming-0 " +
      "dups under BOTH hashes") {
    for (id <- Seq(0L, 17L, 29L, 493L)) {
      val base = ImageHash.lumaGrid(ImageHash.render(id, 1, "png"))
      val resized = ImageHash.lumaGrid(ImageHash.render(id, 2, "png"))
      val reenc = ImageHash.lumaGrid(ImageHash.render(id, 1, "bmp"))
      assert(ImageHash.dHash(base) === ImageHash.dHash(resized))
      assert(ImageHash.aHash(base) === ImageHash.aHash(resized))
      assert(ImageHash.dHash(base) === ImageHash.dHash(reenc))
      assert(ImageHash.aHash(base) === ImageHash.aHash(reenc))
      // and the variants are NOT byte-identical — exact dedup misses
      // them; that's the gap this operator closes
      assert(!java.util.Arrays.equals(
        ImageHash.render(id, 1, "png"), ImageHash.render(id, 2, "png")))
      assert(!java.util.Arrays.equals(
        ImageHash.render(id, 1, "png"), ImageHash.render(id, 1, "bmp")))
    }
  }

  test("brightness-shift invariance of dHash; undecodable and " +
      "non-grid payloads drop") {
    // +9 on every pixel leaves all differences (and hence dHash)
    // intact as long as no pixel wraps
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val img2 = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val l = (x * 5 + y * 3) % 200 // headroom: never wraps at +9
      img.setRGB(x, y, (l << 16) | (l << 8) | l)
      val l2 = l + 9
      img2.setRGB(x, y, (l2 << 16) | (l2 << 8) | l2)
    }
    def png(b: java.awt.image.BufferedImage) = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", out)
      out.toByteArray
    }
    assert(ImageHash.dHash(ImageHash.lumaGrid(png(img))) ===
      ImageHash.dHash(ImageHash.lumaGrid(png(img2))))
    assert(ImageHash.lumaGrid("not an image".getBytes) === null)
    // 10×10: not divisible by the 8-grid — rejected, not interpolated
    val odd = new java.awt.image.BufferedImage(10, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    assert(ImageHash.lumaGrid(png(odd)) === null)
  }

  test("banded recall is exact for Hamming <= 3: planted signatures " +
      "at every distance 0..3 pair, distance 4+ never slips through, " +
      "and the set equals brute force") {
    val rnd = new scala.util.Random(154L)
    val bases = Seq.fill(30)(rnd.nextLong() & ((1L << 56) - 1))
    def flip(h: Long, bits: Seq[Int]) = bits.foldLeft(h)((a, b) => a ^ (1L << b))
    // for base i: a copy at Hamming i % 5 (0..4); bit positions spread
    // across DIFFERENT 14-bit chunks to stress the pigeonhole worst case
    val rows = bases.zipWithIndex.flatMap { case (h, i) =>
      val d = i % 5
      Seq((i.toLong * 2, h, 0L),
        (i.toLong * 2 + 1, flip(h, Seq(1, 15, 29, 43).take(d)), 0L))
    }
    val sig = rows.toDF("media_id", "dhash", "ahash")
    val banded = ImageHash.pairsFromSignatures(sig, maxHamming = 3)
      .select($"media_a", $"media_b")
      .as[(Long, Long)].collect().toSet
    val byId = rows.map(r => r._1 -> r._2).toMap
    val brute = (for {
      a <- byId.keys; b <- byId.keys if a < b
      if java.lang.Long.bitCount(byId(a) ^ byId(b)) <= 3
    } yield (a, b)).toSet
    assert(banded === brute)
    // explicitly: 0..3 found, 4 rejected
    for (i <- bases.indices) {
      val want = i % 5 <= 3
      assert(banded.contains((i.toLong * 2, i.toLong * 2 + 1)) === want,
        s"pair $i (hamming ${i % 5})")
    }
  }

  test("hot-band cap bounds the candidate join on degenerate media: " +
      "a planted block of uniform signatures (solid images / black " +
      "frames collapse to one dhash) contributes ZERO candidates, " +
      "real plants still pair, and total join rows stay <= " +
      "chunks * cap * |sig|") {
    val nUniform = 200
    val cap = 50
    // 200 identical signatures (dhash 0 = solid image) — every band is
    // the same (chunk, 0) and holds all 200; uncapped this alone is
    // 4 * C(200,2) = 79,600 join rows
    val uniform = (0 until nUniform).map(i => (1000L + i, 0L, 0L))
    // two contentful plants: a base and its Hamming-1 copy, far from 0
    val base = 0x00a5_5a3c_9e17_42bbL & ((1L << 56) - 1)
    val plants = Seq((1L, base, 7L), (2L, base ^ (1L << 20), 7L),
      (3L, 0x003c_77e1_0b44_91d0L & ((1L << 56) - 1), 9L))
    val sig = (uniform ++ plants).toDF("media_id", "dhash", "ahash")

    val candidates = ImageHash.bandPairCandidates(sig, maxBandPop = cap)
    val nCand = candidates.count()
    // the uniform block's bands (population 200 > 50) are all dropped;
    // only the plants' bands survive: base/copy share 3 of 4 bands
    assert(nCand === 3L,
      s"expected only the 3 shared plant bands, got $nCand")
    assert(nCand <= ImageHash.chunks.toLong * cap * (nUniform + 3))

    // pair semantics under the cap: uniform media emit NO pairs (by
    // design — boilerplate has no near-dup signal), plants still pair
    val got = ImageHash.pairsFromSignatures(sig, maxHamming = 3,
        maxBandPop = cap)
      .select($"media_a", $"media_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))

    // at the DEFAULT cap the uniform block is below threshold and
    // pairs normally — the cap only bites genuinely degenerate bands
    val dflt = ImageHash.pairsFromSignatures(sig).count()
    assert(dflt === (nUniform.toLong * (nUniform - 1) / 2) + 1L)

    // hotBands reports exactly the 4 degenerate bands at cap 50
    assert(ImageHash.hotBands(sig, cap).count() === ImageHash.chunks.toLong)
  }

  private def pairs(df: DataFrame) =
    df.as[(Long, Long, Int, Int)].collect().toSeq

  test("q154 over the fixture corpus: every planted copy pairs with " +
      "its base at Hamming 0 under both hashes") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val got = pairs(ImageHash.q154ImageNearDup(spark, sf))
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val ids = docs.select($"doc_id").as[Long].collect()
    for (id <- ids) {
      if (id % 17 == 0) assert(got((id * 10, id * 10 + 1)) === ((0, 0)))
      if (id % 29 == 0) assert(got((id * 10, id * 10 + 2)) === ((0, 0)))
    }
  }

  test("q156 clusters: doc 0's base+resize+re-encode triple forms one " +
      "cluster with the base as keeper; every cluster elects its " +
      "minimum member exactly once") {
    val got = ImageHash.q156ImageDupClusters(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    // doc 0 is divisible by 17 and 29 → all three renditions exist,
    // pairwise Hamming 0 → one component, canonical = media 0
    for (m <- Seq(0L, 1L, 2L)) {
      assert(byId(m)._2 === 0L)
      assert(byId(m)._3 >= 3L)
      assert(byId(m)._4 === (m == 0L))
    }
    // exactly one keeper per cluster, and it is the minimum member
    got.groupBy(_._2).foreach { case (canon, members) =>
      assert(members.count(_._4) === 1)
      assert(members.map(_._1).min === canon)
    }
  }
}
