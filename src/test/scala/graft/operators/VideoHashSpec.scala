package graft.operators

import graft.SparkSpec

/** Perceptual video near-dup (q158): DIB-AVI round-trip, temporal
  * majority semantics, planted-variant invariances.
  */
class VideoHashSpec extends SparkSpec {
  import spark.implicits._

  test("lossless round-trip: every parsed DIB frame's luma grid " +
      "equals the formula's 2x2 box means exactly, for all variants") {
    for (id <- Seq(0L, 19L, 23L, 437L)) {
      val grids = VideoHash.frameGrids(VideoHash.renderAvi(id, 0))
      assert(grids != null && grids.length === VideoHash.nFrames)
      for (f <- 0 until VideoHash.nFrames) {
        val want = Array.tabulate(64) { i =>
          val r = i / 8; val c = i % 8
          (VideoHash.lumaAt(id, f, 2 * c, 2 * r) +
            VideoHash.lumaAt(id, f, 2 * c, 2 * r + 1) +
            VideoHash.lumaAt(id, f, 2 * c + 1, 2 * r) +
            VideoHash.lumaAt(id, f, 2 * c + 1, 2 * r + 1)) / 4
        }
        assert(grids(f).toSeq === want.toSeq, s"id=$id f=$f")
      }
      // brightness variant: every cell exactly +8
      val bright = VideoHash.frameGrids(VideoHash.renderAvi(id, 2))
      for (f <- 0 until VideoHash.nFrames)
        assert(bright(f).toSeq === grids(f).map(_ + 8).toSeq)
    }
  }

  test("re-containerized variant is byte-different but parse- and " +
      "hash-identical; brightness variant hashes identically") {
    for (id <- Seq(0L, 19L, 23L, 437L)) {
      val base = VideoHash.renderAvi(id, 0)
      val junk = VideoHash.renderAvi(id, 1)
      val bright = VideoHash.renderAvi(id, 2)
      assert(!java.util.Arrays.equals(base, junk))
      assert(VideoHash.frameGrids(junk).map(_.toSeq).toSeq ===
        VideoHash.frameGrids(base).map(_.toSeq).toSeq)
      def sig(p: Array[Byte]) = {
        val gs = VideoHash.frameGrids(p)
        val sampled = gs.indices.by(VideoHash.frameStride).map(gs(_)).toArray
        (VideoHash.majority(sampled.map(ImageHash.dHash), ImageHash.dBits),
          VideoHash.majority(sampled.map(ImageHash.aHash), 64))
      }
      assert(sig(base) === sig(junk))
      assert(sig(base) === sig(bright))
    }
  }

  test("temporal majority: bit set iff strictly more than half the " +
      "frames set it, including the sign bit") {
    assert(VideoHash.majority(Array(1L, 1L, 0L), 1) === 1L)
    assert(VideoHash.majority(Array(1L, 0L, 0L), 1) === 0L)
    assert(VideoHash.majority(Array(3L, 1L, 0L), 2) === 1L)
    // even count: exactly half is NOT a majority
    assert(VideoHash.majority(Array(1L, 0L), 1) === 0L)
    val sign = 1L << 63
    assert(VideoHash.majority(Array(sign, sign, 0L), 64) === sign)
  }

  test("unparseable, non-DIB, and grid-indivisible payloads drop; " +
      "JUNK chunks and wrong-size frame bodies are skipped") {
    assert(VideoHash.frameGrids(null) === null)
    assert(VideoHash.frameGrids(Array[Byte](1, 2, 3)) === null)
    // a real MJPEG-style AVI (JPEG frames, no DIB strf) yields null
    assert(Multimodal.parseAviDib("RIFF0000AVI ".getBytes) === null)
    // truncating the last frame body makes parseAviDib drop it (the
    // stride*h size check), not mis-slice
    val base = VideoHash.renderAvi(5L, 0)
    val truncated = java.util.Arrays.copyOf(base, base.length - 100)
    val v = Multimodal.parseAviDib(truncated)
    assert(v != null && v.frames.length === VideoHash.nFrames - 1)
  }

  test("q158 end-to-end: every planted re-containerized and " +
      "brightness copy pairs with its base at Hamming 0 under both " +
      "hashes through the real byte path") {
    val pairs = VideoHash.q158VideoNearDup(spark, sf)
      .select($"media_a", $"media_b", $"hamming", $"a_hamming")
      .as[(Long, Long, Int, Int)].collect()
    val byPair = pairs.map(p => (p._1, p._2) -> ((p._3, p._4))).toMap
    val ids = graft.core.Tables.load(spark, sf, "documents")
      .select($"doc_id").as[Long].collect()
    val planted = ids.filter(_ % 19 == 0).map(id => (id * 10, id * 10 + 1)) ++
      ids.filter(_ % 23 == 0).map(id => (id * 10, id * 10 + 2))
    assert(planted.nonEmpty)
    for (p <- planted)
      assert(byPair.get(p).contains((0, 0)), s"planted pair $p missing")
  }
}
