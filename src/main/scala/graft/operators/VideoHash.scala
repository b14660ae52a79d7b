package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Parallel, Tables}

/** PERCEPTUAL video near-duplication — the third modality of the
  * q154/q155 family, closing the dedup gap for video columns: exact-
  * byte dedup misses a re-containerized or brightness-adjusted copy
  * of the same footage. Built on the UNCOMPRESSED-DIB AVI path
  * ([[Multimodal.parseAviDib]]) — the lossless video format this
  * container can decode for real, and the one that keeps the whole
  * pipeline ORACLE-EXACT (MJPEG frames are lossy JPEG, so no SQL
  * engine can predict their pixels; raw BI_RGB rows it can).
  *
  * Signature: sample every `frameStride`-th frame, compute the
  * [[ImageHash]] 8×8 integer luma-grid dHash and aHash per sampled
  * frame, then take the PER-BIT MAJORITY across sampled frames
  * (2·count > n — the SimHash aggregation applied temporally). The
  * majority hash is stable under single-frame corruptions and under
  * any per-frame-invariant transform (brightness shift, lossless
  * re-containerization), while frame ORDER still matters through
  * which frames get sampled. Integer-exact end to end ⇒ engine-
  * portable ⇒ the q158 fixture renders REAL AVI bytes from a pure
  * integer pixel formula, parses them back through the production
  * RIFF walk, and hashes the decoded rows — while DuckDB predicts
  * the same majority hashes straight from the formula.
  *
  * Scale shape: one 16-byte signature row per video — candidate
  * pairs ride the [[ImageHash]] 14-bit pigeonhole banding (exact for
  * Hamming ≤ 3), videos never join; decode runs per-partition.
  */
object VideoHash {

  val nFrames = 6
  val frameStride = 2 // samples frames 0, 2, 4 — odd count, no ties
  val side = 16 // fixture frame edge (8 | side, so grids are exact)

  private val P = 2147483647L

  /** Deterministic pixel luma of frame `f` at (x, y) — the formula
    * BOTH engines evaluate (the q154 LCG-with-squaring scramble,
    * frame index folded into the seed). Range 0..239: headroom so
    * the +8 brightness variant never wraps a pixel.
    */
  def lumaAt(id: Long, f: Int, x: Int, y: Int): Int = {
    val s1 = (id * 1000003L + f * 524287L + x * 8191L + y * 131071L + 3L) % P
    val s2 = (s1 * s1) % P
    val s3 = (s2 * 48271L) % P
    (s3 % 240L).toInt
  }

  /** Render doc `id`'s clip as a REAL uncompressed AVI: RIFF/AVI
    * with an `hdrl` LIST (avih + one `vids`/`DIB ` stream whose
    * `strf` BITMAPINFOHEADER declares BI_RGB 24bpp) and a `movi`
    * LIST of `00db` raw bottom-up BGR frames. `variant` 0 = base;
    * 1 = RE-CONTAINERIZED (identical frames, a JUNK padding chunk
    * inside `movi` — byte-different, parse-identical); 2 =
    * BRIGHTNESS +8 (every pixel shifted — both hashes invariant).
    */
  def renderAvi(id: Long, variant: Int): Array[Byte] = {
    val w = side
    val h = side
    val stride = (w * 3 + 3) & ~3
    val buf = new scala.collection.mutable.ArrayBuffer[Byte](16 * 1024)
    def putStr(s: String): Unit = buf ++= s.getBytes("US-ASCII")
    def putI32(v: Int): Unit = {
      buf += (v & 0xff).toByte; buf += ((v >> 8) & 0xff).toByte
      buf += ((v >> 16) & 0xff).toByte; buf += ((v >> 24) & 0xff).toByte
    }
    def putU16(v: Int): Unit = {
      buf += (v & 0xff).toByte; buf += ((v >> 8) & 0xff).toByte
    }
    def chunk(fcc: String)(body: => Unit): Unit = {
      putStr(fcc)
      val sizeAt = buf.length
      putI32(0)
      body
      val size = buf.length - sizeAt - 4
      buf(sizeAt) = (size & 0xff).toByte
      buf(sizeAt + 1) = ((size >> 8) & 0xff).toByte
      buf(sizeAt + 2) = ((size >> 16) & 0xff).toByte
      buf(sizeAt + 3) = ((size >> 24) & 0xff).toByte
      if (size % 2 == 1) buf += 0 // RIFF word alignment pad
    }
    def list(kind: String)(body: => Unit): Unit =
      chunk("LIST") { putStr(kind); body }
    chunk("RIFF") {
      putStr("AVI ")
      list("hdrl") {
        chunk("avih") {
          putI32(33333); putI32(stride * h * 30); putI32(0); putI32(0)
          putI32(nFrames); putI32(0); putI32(1); putI32(stride * h)
          putI32(w); putI32(h); (0 until 4).foreach(_ => putI32(0))
        }
        list("strl") {
          chunk("strh") {
            putStr("vids"); putStr("DIB "); putI32(0); putU16(0); putU16(0)
            putI32(0); putI32(1); putI32(30); putI32(0); putI32(nFrames)
            putI32(stride * h); putI32(-1); putI32(0)
            putU16(0); putU16(0); putU16(w); putU16(h)
          }
          chunk("strf") {
            putI32(40); putI32(w); putI32(h); putU16(1); putU16(24)
            putI32(0) // BI_RGB
            putI32(stride * h); putI32(0); putI32(0); putI32(0); putI32(0)
          }
        }
      }
      list("movi") {
        var f = 0
        while (f < nFrames) {
          if (variant == 1 && f == nFrames / 2)
            chunk("JUNK") { (0 until 24).foreach(i => buf += i.toByte) }
          chunk("00db") {
            var row = 0
            while (row < h) {
              val y = h - 1 - row // bottom-up
              var x = 0
              while (x < w) {
                val l = lumaAt(id, f, x, y) + (if (variant == 2) 8 else 0)
                buf += l.toByte; buf += l.toByte; buf += l.toByte // B G R
                x += 1
              }
              var pad = w * 3
              while (pad < stride) { buf += 0; pad += 1 }
              row += 1
            }
          }
          f += 1
        }
      }
    }
    buf.toArray
  }

  /** Per-frame 8×8 integer luma grids of an uncompressed AVI — the
    * [[ImageHash.lumaGrid]] contract on DIB rows (millis luma, exact
    * box means; null for unparseable containers or grid-indivisible
    * dimensions).
    */
  def frameGrids(payload: Array[Byte]): Array[Array[Int]] = {
    val v = Multimodal.parseAviDib(payload)
    if (v == null) return null
    val gs = ImageHash.gridSide
    if (v.width % gs != 0 || v.height % gs != 0) return null
    val stride = (v.width * 3 + 3) & ~3
    val bw = v.width / gs
    val bh = v.height / gs
    v.frames.map { fr =>
      val g = new Array[Int](gs * gs)
      var r = 0
      while (r < gs) {
        var c = 0
        while (c < gs) {
          var sum = 0L
          var y = r * bh
          while (y < (r + 1) * bh) {
            val off = (v.height - 1 - y) * stride // bottom-up rows
            var x = c * bw
            while (x < (c + 1) * bw) {
              val b = fr(off + x * 3) & 0xff
              val gg = fr(off + x * 3 + 1) & 0xff
              val rr = fr(off + x * 3 + 2) & 0xff
              sum += (299L * rr + 587L * gg + 114L * b) / 1000L
              x += 1
            }
            y += 1
          }
          g(r * gs + c) = (sum / (bw.toLong * bh)).toInt
          c += 1
        }
        r += 1
      }
      g
    }
  }

  /** Per-bit majority of `hs` over `bits` positions: bit b set iff
    * strictly more than half the inputs set it.
    */
  def majority(hs: Array[Long], bits: Int): Long = {
    var out = 0L
    var b = 0
    while (b < bits) {
      var cnt = 0
      hs.foreach(h => if (((h >>> b) & 1L) == 1L) cnt += 1)
      if (2 * cnt > hs.length) out |= 1L << b
      b += 1
    }
    out
  }

  /** (media_id, dhash, ahash) video signatures: stride-sampled
    * frames through the image hash kernel, then temporal majority.
    * Unparseable or frameless payloads drop.
    */
  def signatures(media: DataFrame, every: Int = frameStride): DataFrame = {
    require(every > 0, "frame stride must be positive")
    import media.sparkSession.implicits._
    Parallel.fan(media).select($"media_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val grids = frameGrids(bytes)
        if (grids == null) Iterator.empty
        else {
          val sampledGrids =
            grids.indices.by(every).map(grids(_)).toArray
          if (sampledGrids.isEmpty) Iterator.empty
          else Iterator.single((id,
            majority(sampledGrids.map(ImageHash.dHash), ImageHash.dBits),
            majority(sampledGrids.map(ImageHash.aHash), 64)))
        }
      })
      .toDF("media_id", "dhash", "ahash")
  }

  /** The q158 media table: one base AVI per doc (media_id = 10·doc),
    * a RE-CONTAINERIZED copy (JUNK chunk mid-`movi`) for every 19th
    * doc, a BRIGHTNESS +8 copy for every 23rd — the perceptual-dup
    * classes exact-byte video dedup misses.
    */
  def syntheticMedia(docs: DataFrame, junkMod: Long = 19L,
      brightMod: Long = 23L): DataFrame = {
    import docs.sparkSession.implicits._
    Parallel.fan(docs).select($"doc_id").as[Long]
      .mapPartitions(_.flatMap { id =>
        Iterator.single((id * 10L, renderAvi(id, 0), "video/avi")) ++
          (if (id % junkMod == 0)
            Iterator.single((id * 10L + 1L, renderAvi(id, 1), "video/avi"))
          else Iterator.empty) ++
          (if (id % brightMod == 0)
            Iterator.single((id * 10L + 2L, renderAvi(id, 2), "video/avi"))
          else Iterator.empty)
      })
      .toDF("media_id", "payload", "media_type")
  }

  /** Q158 — perceptual video near-dup over the rendered corpus:
    * every planted re-containerized and brightness-shifted copy must
    * pair with its base at Hamming 0 THROUGH the real render → RIFF
    * parse → per-frame hash → temporal majority → banded-join path;
    * further pairs are formula near-collisions both engines derive
    * identically. Output shape matches q154 (media_a, media_b,
    * hamming, a_hamming).
    */
  def q158VideoNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    ImageHash.pairsFromSignatures(signatures(syntheticMedia(docs)))
      .orderBy($"media_a", $"media_b")
  }

  /** DuckDB oracle for [[q158VideoNearDup]]: predict each sampled
    * frame's 8×8 grid straight from [[lumaAt]] (2×2 box means; the
    * JUNK variant shares the base's pixels, the bright variant adds
    * the exact +8 every term of the grid/mean arithmetic carries
    * through), hash per frame with the q154 bit layout, majority
    * across the three sampled frames, and emit all pairs at dHash
    * Hamming ≤ 3.
    */
  def oracleSql(junkMod: Long = 19L, brightMod: Long = 23L): String = {
    val n = (0 until nFrames by frameStride).size // sampled frames
    val fvals = (0 until nFrames by frameStride)
      .map(f => s"($f)").mkString(", ")
    s"""WITH m AS (
       |   SELECT doc_id, doc_id * 10 AS media_id, 0 AS shift FROM documents
       |   UNION ALL SELECT doc_id, doc_id * 10 + 1, 0 FROM documents
       |     WHERE doc_id % $junkMod = 0
       |   UNION ALL SELECT doc_id, doc_id * 10 + 2, 8 FROM documents
       |     WHERE doc_id % $brightMod = 0),
       | fr AS (SELECT f FROM (VALUES $fvals) t(f)),
       | s1 AS (SELECT m.media_id, m.shift, fr.f, xx.x, yy.y,
       |     ((m.doc_id*1000003 + fr.f*524287 + xx.x*8191 + yy.y*131071 + 3)
       |       % $P)::BIGINT AS s
       |   FROM m, fr, range($side) xx(x), range($side) yy(y)),
       | px AS (SELECT media_id, f, x, y,
       |     ((s * s % $P) * 48271 % $P % 240 + shift)::BIGINT AS l
       |   FROM s1),
       | g AS (SELECT media_id, f, (y // 2) AS r, (x // 2) AS c,
       |     (sum(l) // 4)::BIGINT AS g
       |   FROM px GROUP BY media_id, f, (y // 2), (x // 2)),
       | db AS (SELECT a.media_id, a.r, a.c,
       |     count(*) FILTER (WHERE a.g < b.g) AS cnt
       |   FROM g a JOIN g b ON b.media_id = a.media_id AND b.f = a.f
       |     AND b.r = a.r AND b.c = a.c + 1
       |   WHERE a.c < 7 GROUP BY a.media_id, a.r, a.c),
       | vd AS (SELECT media_id,
       |     sum(CASE WHEN cnt * 2 > $n
       |       THEN (1::BIGINT << (r * 7 + c)) ELSE 0 END)::BIGINT AS dhash
       |   FROM db GROUP BY media_id),
       | mn AS (SELECT media_id, f, (sum(g) // 64)::BIGINT AS mg
       |   FROM g GROUP BY media_id, f),
       | ab AS (SELECT g.media_id, g.r, g.c,
       |     count(*) FILTER (WHERE g.g > mn.mg) AS cnt
       |   FROM g JOIN mn USING (media_id, f)
       |   GROUP BY g.media_id, g.r, g.c),
       | va AS (SELECT media_id,
       |     sum(CASE WHEN cnt * 2 <= $n THEN 0
       |       WHEN r * 8 + c = 63 THEN (-9223372036854775807 - 1)
       |       ELSE (1::BIGINT << (r * 8 + c)) END)::BIGINT AS ahash
       |   FROM ab GROUP BY media_id),
       | s AS (SELECT vd.media_id, vd.dhash, va.ahash
       |   FROM vd JOIN va USING (media_id)),
       |${ImageHash.pairCtesSql()}
       |SELECT media_a, media_b, hamming, a_hamming FROM pr
       |ORDER BY media_a, media_b""".stripMargin
  }
}
