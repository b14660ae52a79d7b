package graft.operators

import graft.SparkSpec

/** REAL audio/video decode paths: WAV (RIFF/PCM parse — a container,
  * not a codec) and MJPEG-in-AVI (RIFF walk + per-frame JPEG decode).
  * Fixtures are hand-assembled byte-exact in the test, so ground
  * truth is independent of any encoder.
  */
class MultimodalAvSpec extends SparkSpec {
  import spark.implicits._

  // ---- fixture builders --------------------------------------------

  private def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }
  private def cc(b: java.io.ByteArrayOutputStream, s: String): Unit =
    b.write(s.getBytes("US-ASCII"))

  /** Hand-written RIFF/WAVE. `interleaved` is frame-major samples in
    * [-1,1]; fmtCode 1 = int PCM (bits 8/16), 3 = float32.
    */
  private def wavBytes(channels: Int, rate: Int, bits: Int,
      interleaved: Seq[Double], fmtCode: Int = 1): Array[Byte] = {
    val data = new java.io.ByteArrayOutputStream()
    interleaved.foreach { x =>
      if (fmtCode == 3) le32(data, java.lang.Float.floatToIntBits(x.toFloat))
      else if (bits == 16) le16(data, math.round(x * 32768.0).toInt.max(-32768).min(32767) & 0xffff)
      else data.write((math.round(x * 128.0).toInt.max(-128).min(127)) + 128)
    }
    val d = data.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    cc(out, "RIFF"); le32(out, 36 + d.length); cc(out, "WAVE")
    cc(out, "fmt "); le32(out, 16)
    le16(out, fmtCode); le16(out, channels); le32(out, rate)
    le32(out, rate * channels * bits / 8) // byte rate
    le16(out, channels * bits / 8)        // block align
    le16(out, bits)
    cc(out, "data"); le32(out, d.length); out.write(d)
    out.toByteArray
  }

  private def jpgBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Minimal MJPEG AVI: RIFF('AVI ') with a movi LIST of 00dc JPEG
    * chunks; `nestSecond` wraps the second frame in a `rec ` LIST
    * (the grouping real muxers emit) to exercise the recursive walk.
    */
  private def aviBytes(frames: Seq[Array[Byte]],
      nestSecond: Boolean = false): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      cc(b, id); le32(b, body.length); b.write(body)
      if (body.length % 2 == 1) b.write(0) // word alignment pad
      b.toByteArray
    }
    def list(subtype: String, body: Array[Byte]): Array[Byte] = {
      val inner = new java.io.ByteArrayOutputStream()
      cc(inner, subtype); inner.write(body)
      chunk("LIST", inner.toByteArray)
    }
    val moviBody = new java.io.ByteArrayOutputStream()
    frames.zipWithIndex.foreach { case (f, i) =>
      val c = chunk("00dc", f)
      if (nestSecond && i == 1) moviBody.write(list("rec ", c))
      else moviBody.write(c)
    }
    val out = new java.io.ByteArrayOutputStream()
    val movi = list("movi", moviBody.toByteArray)
    cc(out, "RIFF"); le32(out, 4 + movi.length); cc(out, "AVI ")
    out.write(movi)
    out.toByteArray
  }

  private def mediaDf(rows: (Long, Array[Byte], String)*) =
    rows.toSeq.map { case (id, b, mt) => (id, b, mt, b.length.toLong, "sha") }
      .toDF("media_id", "payload", "media_type", "n_bytes", "content_sha")

  // ---- WAV ---------------------------------------------------------

  test("WAV 16-bit mono square wave decodes to exact audio stats") {
    val samples = Seq.fill(100)(Seq(0.5, -0.5)).flatten // 200 samples
    val bytes = wavBytes(1, 8000, 16, samples)
    val f = Multimodal.decodeWav(bytes)
    assert(f(0) == 1f && f(1) == 8000f)              // channels, rate
    assert(math.abs(f(2) - 200f / 8000f) < 1e-6)     // duration 25 ms
    assert(math.abs(f(3) - 0.5f) < 1e-3, "rms of ±0.5 square = 0.5")
    assert(f(4) == 1f, "alternating signs cross every step")
    assert(math.abs(f(5) - 0.5f) < 1e-3, "peak")
    assert(math.abs(f(6) - 0.5f) < 1e-3, "meanAbs")
    assert(math.abs(f(7)) < 1e-3, "zero DC offset")
  }

  test("WAV stereo mixes down to the channel mean; DC and ZCR exact") {
    // L = 0.8, R = 0.4 constant → mono 0.6, no crossings
    val interleaved = Seq.fill(50)(Seq(0.8, 0.4)).flatten
    val f = Multimodal.decodeWav(wavBytes(2, 44100, 16, interleaved))
    assert(f(0) == 2f && f(1) == 44100f)
    assert(math.abs(f(2) - 50f / 44100f) < 1e-6)
    assert(math.abs(f(7) - 0.6f) < 1e-3, "DC = mixdown mean")
    assert(f(4) == 0f, "constant signal never crosses zero")
  }

  test("WAV float32 (format 3) decodes bit-exact sample values") {
    val f = Multimodal.decodeWav(
      wavBytes(1, 16000, 32, Seq(0.25, -0.25, 0.25, -0.25), fmtCode = 3))
    assert(f(3) == 0.25f, "float samples carry no quantization")
    assert(f(5) == 0.25f && f(6) == 0.25f)
  }

  test("WAV 8-bit unsigned decodes through the 128-offset") {
    val f = Multimodal.decodeWav(wavBytes(1, 8000, 8, Seq.fill(64)(0.0)))
    assert(f(3) == 0f && f(5) == 0f && f(7) == 0f, "digital silence")
    assert(f(2) == 64f / 8000f)
  }

  test("corrupt or non-WAV payloads decode to null, not a crash") {
    assert(Multimodal.decodeWav("not audio".getBytes) == null)
    assert(Multimodal.decodeWav(Array.empty[Byte]) == null)
    // truncated header
    assert(Multimodal.decodeWav(
      wavBytes(1, 8000, 16, Seq(0.5, -0.5)).take(20)) == null)
    // dispatch: audio/* media_type with junk bytes → null features row
    val rows = Multimodal.extractFeatures(
      mediaDf((1L, "junk".getBytes, "audio/wav"))).collect()
    assert(rows(0).isNullAt(1))
  }

  test("a chunk size near Int.MaxValue must not wrap the RIFF cursor") {
    // crafted WAV: a chunk before `data` declares size 0x7ffffff8 — an
    // Int cursor would wrap negative (8 + size overflows) and the next
    // fourCC read would throw out of bounds; the contract is null
    val b = new java.io.ByteArrayOutputStream()
    cc(b, "RIFF"); le32(b, 100); cc(b, "WAVE")
    cc(b, "JUNK"); le32(b, 0x7ffffff8)
    b.write(new Array[Byte](32)) // a few body bytes, far short of size
    assert(Multimodal.parseWav(b.toByteArray) == null)

    // a VALID wav followed by a trailing huge-size chunk still decodes
    // (the truncated trailer is skipped, not fatal)
    val ok = wavBytes(1, 8000, 16, Seq(0.5, -0.5, 0.5, -0.5))
    val t = new java.io.ByteArrayOutputStream()
    t.write(ok, 0, ok.length)
    cc(t, "JUNK"); le32(t, Int.MaxValue - 3); t.write(7)
    val withTrailer = t.toByteArray
    // patch the RIFF size up (not that the parser trusts it)
    val f = Multimodal.parseWav(withTrailer)
    assert(f != null && f.mono.length == 4)
  }

  test("an AVI frame chunk with a huge declared size must not crash the walk") {
    val jpeg = jpgBytes(4, 4, 0xff0000)
    val b = new java.io.ByteArrayOutputStream()
    val movi = new java.io.ByteArrayOutputStream()
    cc(movi, "movi")
    cc(movi, "00dc"); le32(movi, 0x7ffffff0) // lies: only a JPEG follows
    movi.write(jpeg, 0, jpeg.length)
    val mb = movi.toByteArray
    cc(b, "RIFF"); le32(b, 4 + 8 + mb.length); cc(b, "AVI ")
    cc(b, "LIST"); le32(b, mb.length); b.write(mb, 0, mb.length)
    // old Int arithmetic: body+size wraps, cursor goes negative, fourCC
    // throws; the contract is clamp-and-continue (frame clipped to the
    // available bytes — it still starts with the JPEG magic, so it is
    // surfaced; decode of the truncated JPEG may fail, which is fine)
    val frames = Multimodal.aviJpegFrames(b.toByteArray)
    assert(frames.length == 1 && frames(0).length == jpeg.length)
  }

  test("sampleAudioWindows: hop/window arithmetic and per-window stats") {
    // 10 samples: 4 loud then 6 silent; window 4, hop 4 → offsets 0,4,8
    val bytes = wavBytes(1, 8000, 16,
      Seq(0.5, -0.5, 0.5, -0.5, 0, 0, 0, 0, 0, 0))
    val rows = Multimodal.sampleAudioWindows(
        mediaDf((7L, bytes, "audio/wav")), windowSamples = 4, hopSamples = 4)
      .orderBy($"frame_idx").collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 4L, 8L))
    val w0 = rows(0).getSeq[Float](3)
    assert(math.abs(w0(0) - 0.5f) < 1e-3, "first window is the loud one")
    val w1 = rows(1).getSeq[Float](3)
    assert(w1(0) == 0f, "second window is silence")
    // undecodable payloads contribute zero rows, not poison
    assert(Multimodal.sampleAudioWindows(
      mediaDf((8L, "junk".getBytes, "audio/wav"))).count() == 0)
  }

  // ---- MJPEG AVI ---------------------------------------------------

  test("MJPEG AVI frames decode through the real image kernel") {
    val red = jpgBytes(8, 8, 0xff0000)
    val blue = jpgBytes(8, 8, 0x0000ff)
    val avi = aviBytes(Seq(red, blue, red))
    val rows = Multimodal.sampleVideoFrames(
        mediaDf((1L, avi, "video/x-msvideo")))
      .orderBy($"frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    val f0 = rows(0).getSeq[Float](2)
    val f1 = rows(1).getSeq[Float](2)
    assert(f0(0) == 8f && f0(1) == 8f, "frame dimensions")
    assert(f0(2) > 0.8f && f0(4) < 0.2f, "frame 0 is red (JPEG-lossy)")
    assert(f1(4) > 0.8f && f1(2) < 0.2f, "frame 1 is blue")
  }

  test("AVI walk recurses into rec LISTs and strides with `every`") {
    val frames = Seq(jpgBytes(4, 4, 0xff0000), jpgBytes(4, 4, 0x00ff00),
      jpgBytes(4, 4, 0x0000ff), jpgBytes(4, 4, 0xffffff))
    val avi = aviBytes(frames, nestSecond = true)
    assert(Multimodal.aviJpegFrames(avi).length == 4,
      "nested rec LIST frame must be found")
    val sampled = Multimodal.sampleVideoFrames(
        mediaDf((1L, avi, "video/x-msvideo")), every = 2)
      .orderBy($"frame_idx").collect()
    assert(sampled.map(_.getInt(1)).toSeq == Seq(0, 2))
    // undecodable container → no rows
    assert(Multimodal.aviJpegFrames("not avi".getBytes).isEmpty)
  }

  test("extractFeatures dispatches the right REAL kernel per media_type") {
    val wav = wavBytes(1, 8000, 16, Seq.fill(16)(0.5))
    val avi = aviBytes(Seq(jpgBytes(4, 4, 0xff0000)))
    val png = {
      val img = new java.awt.image.BufferedImage(
        2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Multimodal.extractFeatures(mediaDf(
        (1L, wav, "audio/wav"), (2L, avi, "video/x-msvideo"),
        (3L, png, "image/png"), (4L, wav, "audio/mpeg")))
      .orderBy($"media_id").collect()
    assert(rows(0).getSeq[Float](1)(1) == 8000f, "audio: sample rate slot")
    assert(rows(1).getSeq[Float](1)(0) == 4f, "video: first-frame width")
    assert(rows(2).getSeq[Float](1)(0) == 2f, "image: width")
    // mp3 has no codec here → the stub's L1-normalized histogram
    assert(math.abs(rows(3).getSeq[Float](1).sum - 1f) < 1e-5f, "stub path")
  }

  test("sniffMime: real codec outputs detect as their container; " +
      "garbage, truncated, RIFF-without-tag, and NULL payloads fall " +
      "to octet-stream") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      ("png", ImageHash.render(3L, 1, "png")),
      ("bmp", ImageHash.render(3L, 1, "bmp")),
      ("wav", AudioHash.render(3L, 0)),
      ("avi", VideoHash.renderAvi(3L, 0)),
      ("garbage", "not media at all".getBytes("US-ASCII")),
      ("short", Array[Byte](0x42)),
      // RIFF magic but an unknown form tag: container known, type not
      ("riffodd", "RIFF    JUNK".getBytes("ISO-8859-1")),
      // PNG magic truncated after 4 bytes
      ("pngcut", Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47)),
      ("nul", null))
      .toDF("name", "payload")
      .select(col("name"), Multimodal.sniffMime(col("payload")).as("mime"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("png") === "image/png")
    assert(rows("bmp") === "image/bmp")
    assert(rows("wav") === "audio/wav")
    assert(rows("avi") === "video/avi")
    assert(rows("garbage") === "application/octet-stream")
    assert(rows("short") === "application/octet-stream")
    assert(rows("riffodd") === "application/octet-stream")
    assert(rows("pngcut") === "application/octet-stream")
    assert(rows("nul") === "application/octet-stream")
  }

  test("q167 mislabel audit: every planted mislabel is flagged, " +
      "nothing else is, and detected always matches the renderer's " +
      "container") {
    import spark.implicits._
    val got = Multimodal.q167MimeSniff(spark, sf)
      .as[(Long, String, String, Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (mId, declared, detected, mismatch) =>
      val doc = (mId - mId % 10) / 10
      val wantDetected = (mId % 10) match {
        case 0 | 1 => "image/png"
        case 2 => "image/bmp"
        case 3 | 4 | 5 => "audio/wav"
        case _ => "video/avi"
      }
      assert(detected === wantDetected, s"media $mId")
      val planted = (mId % 10 == 0 && doc % 13 == 0) ||
        (mId % 10 == 3 && doc % 31 == 0)
      assert(mismatch === planted, s"media $mId declared=$declared")
    }
    // both mislabel classes actually occur in the fixture
    assert(got.exists(r => r._1 % 10 == 0 && r._4))
    assert(got.exists(r => r._1 % 10 == 3 && r._4))
  }
}
