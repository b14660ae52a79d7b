package graft.operators

import graft.SparkSpec

class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  test("lossless round-trip: decoded int16 samples of a rendered WAV " +
      "equal the formula, for the base and both variants") {
    for (id <- Seq(0L, 7L, 101L, 4099L)) {
      val base = AudioHash.samples(AudioHash.render(id, 0))
      val reenc = AudioHash.samples(AudioHash.render(id, 1))
      val half = AudioHash.samples(AudioHash.render(id, 2))
      val want = Array.tabulate(AudioHash.nSamples)(AudioHash.sampleAt(id, _))
      assert(base.toSeq === want.toSeq)
      assert(reenc.toSeq === want.toSeq) // extra chunk, same samples
      assert(half.toSeq === want.map(_ / 2).toSeq)
    }
  }

  test("planted variants hash identically to their base: exact gain " +
      "halving preserves every energy comparison (ties included), " +
      "re-containerizing changes bytes but not the parse") {
    for (id <- Seq(0L, 19L, 23L, 437L)) {
      def sig(v: Int) = {
        val e = AudioHash.energies(AudioHash.samples(AudioHash.render(id, v)))
        (AudioHash.dHash(e), AudioHash.aHash(e))
      }
      assert(sig(0)._1 === sig(1)._1)
      assert(sig(0)._2 === sig(1)._2)
      assert(sig(0)._1 === sig(2)._1) // dHash gain-invariant (exact /2)
      assert(!java.util.Arrays.equals(
        AudioHash.render(id, 0), AudioHash.render(id, 1)))
      assert(!java.util.Arrays.equals(
        AudioHash.render(id, 0), AudioHash.render(id, 2)))
    }
  }

  test("undecodable and off-grid payloads drop; stereo rejected") {
    assert(AudioHash.samples("RIFFjunk".getBytes) === null)
    assert(AudioHash.samples(Array.empty[Byte]) === null)
    // a truncated clip (not a whole number of windows) is rejected,
    // not silently hashed on a ragged tail
    val whole = AudioHash.render(5L, 0)
    val truncated = java.util.Arrays.copyOf(whole, whole.length - 2)
    // the parser clamps the data chunk to the available bytes, so the
    // parse "succeeds" with 1823 frames — samples() must still reject
    // the off-grid length rather than hash a ragged tail
    assert(AudioHash.samples(truncated) === null)
  }

  test("over-length clips are rejected: more than nWindows windows " +
      "would push dHash bits past the 56-bit banding design (and wrap " +
      "the shift mod 64 at >=65) — no signature beats a corrupt one") {
    // minimal PCM16 mono RIFF with nWindows+1 whole windows
    def wav(nSamp: Int): Array[Byte] = {
      val data = nSamp * 2
      val out = java.nio.ByteBuffer.allocate(44 + data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + data)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(data)
      (0 until nSamp).foreach(i => out.putShort((i % 100).toShort))
      out.array()
    }
    assert(AudioHash.samples(
      wav((AudioHash.nWindows + 1) * AudioHash.windowSize)) === null)
    // exactly nWindows windows still decodes
    assert(AudioHash.samples(
      wav(AudioHash.nWindows * AudioHash.windowSize)) !== null)
  }

  test("q155 over the fixture corpus: every planted copy pairs with " +
      "its base at dHash Hamming 0 through the real path") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val got = AudioHash.q155AudioNearDup(spark, sf)
      .as[(Long, Long, Int, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val ids = docs.select($"doc_id").as[Long].collect()
    for (id <- ids) {
      if (id % 19 == 0) assert(got((id * 10, id * 10 + 1)) === 0)
      if (id % 23 == 0) assert(got((id * 10, id * 10 + 2)) === 0)
    }
  }
}
