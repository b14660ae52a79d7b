package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{Parallel, Tables}

/** PERCEPTUAL audio near-duplication — the audio sibling of
  * [[ImageHash]], closing the same gap for the WAV modality: exact-
  * byte dedup misses a re-containerized or re-gained copy of the
  * same recording. Windowed-energy difference hash over REALLY-
  * decoded samples ([[Multimodal.parseWav]]'s RIFF walk — WAV is a
  * container, not a codec, so the decode is real in this
  * environment):
  *
  *  - 57 windows of 32 samples; window energy e(w) = Σ|s| over the
  *    EXACT int16 samples (recovered losslessly from the parser's
  *    mono floats — a 16-bit sample / 2¹⁵ is exactly representable).
  *  - dHash (56-bit): bit w = e(w) < e(w+1) — invariant under exact
  *    uniform gain (a half-volume copy of even samples halves every
  *    energy exactly, preserving every comparison including ties).
  *  - aHash (57-bit): bit w = e(w) > ⌊Σe/57⌋ — the annotation hash.
  *
  * Integer-exact end to end ⇒ engine-portable ⇒ oracle-checkable:
  * the q155 fixture renders each document's clip from a pure integer
  * sample formula (the q154 LCG-with-squaring scramble — affine
  * scrambles are defeated by the dHash's shift invariance, the
  * lesson q154 learned on pixels), writes REAL RIFF/WAVE bytes,
  * decodes them back through the production parser, and hashes the
  * decoded samples — while DuckDB predicts the same hashes straight
  * from the formula. Candidate pairs ride the [[ImageHash]] 14-bit
  * pigeonhole banding (exact for Hamming ≤ 3); one 16-byte signature
  * row per clip, clips never join.
  */
object AudioHash {

  val nSamples = 1824 // 57 windows × 32 samples
  val windowSize = 32
  val nWindows: Int = nSamples / windowSize // 57

  /** Deterministic int16 sample at position `i` of doc `id`'s clip —
    * the formula BOTH engines evaluate. Always a multiple of 4, so
    * the half-volume variant's `/2` is exact division (no floor-vs-
    * truncate divergence between engines on negatives).
    */
  def sampleAt(id: Long, i: Int): Int = {
    val s1 = (id * 1000003L + i * 8191L + 7L) % 2147483647L
    val s2 = (s1 * s1) % 2147483647L
    val s3 = (s2 * 48271L) % 2147483647L
    (4L * (s3 % 16384L - 8192L)).toInt // −32768 .. 32764
  }

  /** Render doc `id`'s clip as real RIFF/WAVE PCM16 mono bytes.
    * `variant` 0 = base; 1 = RE-CONTAINERIZED (identical samples, an
    * extra `fact` chunk before `data` — byte-different, parse-
    * identical); 2 = HALF-VOLUME (every sample exactly halved).
    */
  def render(id: Long, variant: Int): Array[Byte] = {
    val rate = 8000
    val extra = if (variant == 1) 12 else 0 // "fact" chunk: id+size+4
    val dataBytes = nSamples * 2
    val riffSize = 4 + 24 + extra + 8 + dataBytes
    val out = new Array[Byte](8 + riffSize)
    var p = 0
    def putStr(s: String): Unit = { s.getBytes("US-ASCII").foreach { b => out(p) = b; p += 1 } }
    def putI32(v: Int): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte
      out(p + 2) = ((v >> 16) & 0xff).toByte; out(p + 3) = ((v >> 24) & 0xff).toByte
      p += 4
    }
    def putU16(v: Int): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte; p += 2
    }
    putStr("RIFF"); putI32(riffSize); putStr("WAVE")
    putStr("fmt "); putI32(16)
    putU16(1); putU16(1); putI32(rate) // PCM, mono
    putI32(rate * 2); putU16(2); putU16(16) // byte rate, block align, bits
    if (variant == 1) { putStr("fact"); putI32(4); putI32(nSamples) }
    putStr("data"); putI32(dataBytes)
    var i = 0
    while (i < nSamples) {
      val s = sampleAt(id, i)
      putU16((if (variant == 2) s / 2 else s) & 0xffff)
      i += 1
    }
    out
  }

  /** Exact int16 samples back out of a decoded payload (null when
    * unparseable or not a full clip): the parser's mono floats are
    * s/2¹⁵ exactly for 16-bit mono PCM, so `round(f·2¹⁵)` recovers
    * the integers losslessly. Clips with MORE than [[nWindows]]
    * windows are rejected too (the [[ImageHash]] grid-divisibility
    * guard's audio analogue, r12 advice): dHash sets bit w via
    * `1L << w`, so window 57+ would spill past the 56-bit pigeonhole
    * banding design and at ≥ 65 windows the shift wraps mod 64 and
    * aliases bits — better no signature than a corrupt, non-portable
    * one that the banding still claims exactness for.
    */
  def samples(payload: Array[Byte]): Array[Int] = {
    val w = Multimodal.parseWav(payload)
    if (w == null || w.nChannels != 1 || w.bitsPerSample != 16 ||
      w.mono.length % windowSize != 0 || w.mono.isEmpty ||
      w.mono.length / windowSize > nWindows) return null
    w.mono.map(f => math.round(f * 32768f))
  }

  /** Window energies e(w) = Σ|s| per `windowSize` block. */
  def energies(s: Array[Int]): Array[Long] = {
    val n = s.length / windowSize
    val e = new Array[Long](n)
    var i = 0
    while (i < s.length) { e(i / windowSize) += math.abs(s(i)).toLong; i += 1 }
    e
  }

  /** 56-bit energy difference hash: bit w = e(w) < e(w+1). */
  def dHash(e: Array[Long]): Long = {
    var h = 0L
    var w = 0
    while (w < e.length - 1) {
      if (e(w) < e(w + 1)) h |= 1L << w
      w += 1
    }
    h
  }

  /** Average hash over all windows: bit w = e(w) > ⌊mean⌋ (≤ 57
    * bits — no sign-bit gymnastics needed, unlike the image aHash).
    */
  def aHash(e: Array[Long]): Long = {
    var sum = 0L
    e.foreach(sum += _)
    val mean = sum / e.length
    var h = 0L
    var w = 0
    while (w < e.length) { if (e(w) > mean) h |= 1L << w; w += 1 }
    h
  }

  /** (media_id, dhash, ahash) signatures over `(media_id, payload)`;
    * unparseable / off-grid payloads drop.
    */
  def signatures(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    Parallel.fan(media).select($"media_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val s = samples(bytes)
        if (s == null) Iterator.empty
        else {
          val e = energies(s)
          Iterator.single((id, dHash(e), aHash(e)))
        }
      })
      .toDF("media_id", "dhash", "ahash")
  }

  /** Near-dup clip pairs — the [[ImageHash.pairsFromSignatures]]
    * banding verbatim (same 56-bit dhash geometry).
    */
  def nearDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    ImageHash.pairsFromSignatures(signatures(media), maxHamming)

  /** The q155 media table: one base clip per doc (media_id = 10·doc),
    * a RE-CONTAINERIZED copy for every 19th doc (10·doc+1), and a
    * HALF-VOLUME copy for every 23rd doc (10·doc+2).
    */
  def syntheticMedia(docs: DataFrame, reencodeMod: Long = 19L,
      gainMod: Long = 23L): DataFrame = {
    import docs.sparkSession.implicits._
    Parallel.fan(docs).select($"doc_id").as[Long]
      .mapPartitions(_.flatMap { id =>
        Iterator.single((id * 10L, render(id, 0), "audio/wav")) ++
          (if (id % reencodeMod == 0)
            Iterator.single((id * 10L + 1L, render(id, 1), "audio/wav"))
          else Iterator.empty) ++
          (if (id % gainMod == 0)
            Iterator.single((id * 10L + 2L, render(id, 2), "audio/wav"))
          else Iterator.empty)
      })
      .toDF("media_id", "payload", "media_type")
  }

  /** Q155 — perceptual audio near-dup over the rendered clips: every
    * planted re-containerized and half-volume copy pairs with its
    * base at dHash Hamming 0 THROUGH the real encode → RIFF-parse →
    * hash → banded-join path.
    */
  def q155AudioNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    nearDupPairs(syntheticMedia(docs))
      .orderBy($"media_a", $"media_b")
  }

  /** DuckDB oracle for [[q155AudioNearDup]]: predict each clip's
    * window energies straight from [[sampleAt]] (the half-volume
    * variant halves exactly — samples are multiples of 4, so `//2`
    * has no floor-vs-truncate divergence), hash with the same bit
    * layout, and emit ALL pairs at dHash Hamming ≤ 3.
    */
  def oracleSql(reencodeMod: Long = 19L, gainMod: Long = 23L): String =
    s"""WITH m AS (
       |   SELECT doc_id, doc_id * 10 AS media_id, 0 AS kind FROM documents
       |   UNION ALL SELECT doc_id, doc_id * 10 + 1, 0 FROM documents
       |     WHERE doc_id % $reencodeMod = 0
       |   UNION ALL SELECT doc_id, doc_id * 10 + 2, 2 FROM documents
       |     WHERE doc_id % $gainMod = 0),
       | s1 AS (SELECT m.media_id, m.kind, ii.i // $windowSize AS w,
       |     ((m.doc_id*1000003 + ii.i*8191 + 7) % 2147483647)::BIGINT AS s
       |   FROM m, range($nSamples) ii(i)),
       | sm AS (SELECT media_id, w,
       |     CASE WHEN kind = 2 THEN b // 2 ELSE b END AS v
       |   FROM (SELECT media_id, kind, w,
       |       (4 * ((s * s % 2147483647) * 48271 % 2147483647
       |         % 16384 - 8192))::BIGINT AS b
       |     FROM s1)),
       | e AS (SELECT media_id, w, sum(abs(v))::BIGINT AS e
       |   FROM sm GROUP BY media_id, w),
       | d AS (SELECT a.media_id,
       |     sum(CASE WHEN a.e < b.e
       |       THEN (1::BIGINT << a.w) ELSE 0 END)::BIGINT AS dhash
       |   FROM e a JOIN e b ON b.media_id = a.media_id AND b.w = a.w + 1
       |   WHERE a.w < ${nWindows - 1} GROUP BY a.media_id),
       | mn AS (SELECT media_id, (sum(e) // $nWindows)::BIGINT AS me
       |   FROM e GROUP BY media_id),
       | ah AS (SELECT e.media_id,
       |     sum(CASE WHEN e.e > mn.me
       |       THEN (1::BIGINT << e.w) ELSE 0 END)::BIGINT AS ahash
       |   FROM e JOIN mn USING (media_id) GROUP BY e.media_id),
       | s AS (SELECT d.media_id, d.dhash, ah.ahash
       |   FROM d JOIN ah USING (media_id)),
       |${ImageHash.pairCtesSql()}
       |SELECT media_a, media_b, hamming, a_hamming FROM pr
       |ORDER BY media_a, media_b""".stripMargin
}
