package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Multimodal-column plumbing (north star): image/audio/video as
  * opaque `binary` payloads plus typed metadata, with batched
  * per-partition feature extraction. Decode dispatches on
  * `media_type` and is REAL wherever a format needs no native codec:
  * PNG/JPEG/GIF/BMP via the JDK's `javax.imageio` ([[decodeImage]]),
  * WAV/PCM audio via a direct RIFF parse ([[decodeWav]] — WAV is a
  * container, not a codec), and MJPEG-in-AVI video via RIFF walk +
  * per-frame JPEG decode ([[aviJpegFrames]]). Only formats that
  * genuinely need codec libraries absent from this container (MP3/
  * AAC audio, H.264+ video) fall back to the deterministic stub
  * ([[stubDecode]]), so the pipeline shape is identical for every
  * modality and a real deployment swaps only the per-format kernel.
  *
  * At 100 TB: payloads dominate storage, so (1) metadata-only queries
  * must never read the payload column (parquet column pruning — the
  * scan's ReadSchema excludes `payload`), and (2) decode runs
  * per-partition with bounded batch memory, never per-row JVM churn
  * and never a driver collect.
  */
object Multimodal {

  // heap-backed ImageIO streams: the default cache writes a TEMP FILE
  // per encode/decode — a filesystem round-trip per image under the
  // per-partition fan (see ImageHash; JVM-global, set in both objects
  // so either init order covers it)
  javax.imageio.ImageIO.setUseCache(false)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("content_sha", StringType, nullable = false)))

  /** Build a media table from `documents` — each text payload plays
    * the role of an opaque media blob (deterministic; lets every
    * downstream step run for real without media libs).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(
      $"doc_id".as("media_id"),
      $"text".cast(BinaryType).as("payload"),
      lit("text/plain").as("media_type"),
      octet_length($"text".cast(BinaryType)).cast(LongType).as("n_bytes"),
      sha2($"text".cast(BinaryType), 256).as("content_sha"))
  }

  /** STUB DECODE — stands in for the codec formats this container
    * cannot decode (MP3/AAC audio, H.264+ video; WAV and MJPEG-AVI
    * decode for real, see below). A real deployment swaps ONLY this
    * function (same signature: bytes → fixed-width feature vector).
    * Deterministic: 8-bucket byte histogram, L1-normalized.
    */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](8)
    if (payload == null || payload.isEmpty) hist
    else {
      payload.foreach { b => hist((b & 0xff) >> 5) += 1f }
      val n = payload.length.toFloat
      hist.map(_ / n)
    }
  }

  /** REAL image decode (JDK `javax.imageio`, no native deps): PNG or
    * JPEG bytes → an 8-wide pixel-stat feature vector
    * `[width, height, meanR, meanG, meanB, lumaMean, lumaStd,
    * alphaFrac]` with channel means in [0,1]. Returns null for
    * undecodable payloads (corrupt file, unsupported format) — the
    * caller keeps or routes them; a 100 TB media crawl ALWAYS
    * contains undecodable blobs and a throwing decoder would kill
    * the stage.
    */
  def decodeImage(payload: Array[Byte]): Array[Float] = {
    if (payload == null || payload.isEmpty) return null
    // NonFatal: plugin decoders throw RuntimeExceptions on corrupt
    // payloads (not only IOException) — the no-throw contract must
    // cover those (r12 advice)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    var sl = 0.0; var sl2 = 0.0; var nAlpha = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val argb = img.getRGB(x, y)
        val a = (argb >>> 24) & 0xff
        val r = (argb >>> 16) & 0xff
        val g = (argb >>> 8) & 0xff
        val b = argb & 0xff
        if (a < 255) nAlpha += 1
        sr += r; sg += g; sb += b
        val luma = 0.299 * r + 0.587 * g + 0.114 * b
        sl += luma; sl2 += luma * luma
        x += 1
      }
      y += 1
    }
    val n = w.toDouble * h
    val lm = sl / n
    val lvar = math.max(0.0, sl2 / n - lm * lm)
    Array(w.toFloat, h.toFloat,
      (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat,
      (sb / n / 255.0).toFloat,
      (lm / 255.0).toFloat, (math.sqrt(lvar) / 255.0).toFloat,
      (nAlpha / n).toFloat)
  }

  // ---- WAV (RIFF/PCM) — REAL audio decode, no codec libraries ------

  /** Parsed WAV payload: channel/rate metadata plus the channel-mean
    * ("mono mixdown") sample stream normalized to [-1, 1].
    */
  private[operators] final case class Wav(nChannels: Int, sampleRate: Int,
      bitsPerSample: Int, mono: Array[Float])

  private def leU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def leI32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Parse RIFF/WAVE bytes: PCM (format 1, 8/16/24/32-bit int) and
    * IEEE float32 (format 3), plus WAVE_FORMAT_EXTENSIBLE wrapping
    * either. WAV is a pure container — this is byte arithmetic, not a
    * codec, which is why the audio path can be REAL in a container
    * with no media libraries. Returns null for anything unparseable
    * (a 100 TB crawl always contains truncated/corrupt payloads; a
    * throwing decoder would kill the stage).
    */
  private[operators] def parseWav(payload: Array[Byte]): Wav = {
    if (payload == null || payload.length < 44) return null
    if (fourCC(payload, 0) != "RIFF" || fourCC(payload, 8) != "WAVE") return null
    var fmtCode = -1; var nCh = 0; var rate = 0; var bits = 0
    var blockAlign = 0; var dataOff = -1; var dataLen = 0
    // the cursor advances in Long: a crafted chunk size near
    // Int.MaxValue would wrap an Int cursor negative, and the loop
    // guard would then index out of bounds — violating the
    // null-for-unparseable no-throw contract this parser runs under
    // inside mapPartitions
    var pos = 12L
    while (pos + 8 <= payload.length) {
      val p = pos.toInt
      val id = fourCC(payload, p)
      val size = leI32(payload, p + 4)
      if (size < 0) return null
      val avail = math.min(size.toLong, payload.length - pos - 8).toInt
      id match {
        case "fmt " if avail >= 16 =>
          fmtCode = leU16(payload, p + 8)
          nCh = leU16(payload, p + 10)
          rate = leI32(payload, p + 12)
          blockAlign = leU16(payload, p + 20)
          bits = leU16(payload, p + 22)
          // WAVE_FORMAT_EXTENSIBLE: the real format is the first two
          // bytes of the SubFormat GUID at offset 24 of the extension
          if (fmtCode == 0xFFFE && avail >= 40)
            fmtCode = leU16(payload, p + 8 + 24)
        case "data" => dataOff = p + 8; dataLen = avail
        case _ => ()
      }
      pos += 8L + size + (size & 1) // chunks are word-aligned
    }
    if (dataOff < 0 || nCh <= 0 || rate <= 0) return null
    val bytesPer = bits / 8
    if (blockAlign <= 0) blockAlign = nCh * bytesPer
    val ok = (fmtCode == 1 && (bits == 8 || bits == 16 || bits == 24 || bits == 32)) ||
      (fmtCode == 3 && bits == 32)
    if (!ok || blockAlign != nCh * bytesPer) return null
    val nFrames = dataLen / blockAlign
    val mono = new Array[Float](nFrames)
    var i = 0
    while (i < nFrames) {
      var acc = 0.0
      var c = 0
      while (c < nCh) {
        val off = dataOff + i * blockAlign + c * bytesPer
        acc += (if (fmtCode == 3)
          java.lang.Float.intBitsToFloat(leI32(payload, off)).toDouble
        else bits match {
          case 8  => ((payload(off) & 0xff) - 128) / 128.0 // 8-bit is unsigned
          case 16 => leU16(payload, off).toShort / 32768.0
          case 24 =>
            val v = (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8) |
              (payload(off + 2) << 16) // top byte keeps its sign
            v / 8388608.0
          case _  => leI32(payload, off) / 2147483648.0
        })
        c += 1
      }
      mono(i) = (acc / nCh).toFloat
      i += 1
    }
    Wav(nCh, rate, bits, mono)
  }

  /** REAL WAV decode: bytes → an 8-wide audio-stat feature vector
    * `[nChannels, sampleRate, durationSec, rms, zeroCrossRate,
    * peakAbs, meanAbs, dcOffset]` over the mono mixdown. Null for
    * undecodable payloads, mirroring [[decodeImage]].
    */
  def decodeWav(payload: Array[Byte]): Array[Float] = {
    val w = parseWav(payload)
    if (w == null) return null
    Array(w.nChannels.toFloat, w.sampleRate.toFloat,
      w.mono.length.toFloat / w.sampleRate) ++ windowStats(w.mono)
  }

  /** `[rms, zeroCrossRate, peakAbs, meanAbs, dcOffset]` of a sample
    * window — the per-window kernel [[sampleAudioWindows]] shares
    * with the whole-file [[decodeWav]].
    */
  private def windowStats(xs: Array[Float]): Array[Float] = {
    var s = 0.0; var s2 = 0.0; var sa = 0.0; var peak = 0.0; var zc = 0
    var i = 0
    while (i < xs.length) {
      val x = xs(i)
      s += x; s2 += x * x; sa += math.abs(x)
      if (math.abs(x) > peak) peak = math.abs(x)
      if (i > 0 && ((x >= 0) != (xs(i - 1) >= 0))) zc += 1
      i += 1
    }
    val n = math.max(xs.length, 1)
    Array(math.sqrt(s2 / n).toFloat,
      if (xs.length > 1) zc.toFloat / (xs.length - 1) else 0f,
      peak.toFloat, (sa / n).toFloat, (s / n).toFloat)
  }

  // ---- MJPEG-in-AVI — REAL video frame extraction -------------------

  /** Extract the JPEG frame payloads from an MJPEG AVI: AVI is RIFF,
    * frames live in the `movi` LIST as `##dc` chunks (possibly
    * grouped inside nested `rec ` LISTs), and for the MJPEG fourcc
    * each chunk body IS a JPEG — so ImageIO finishes the job with no
    * video codec. Non-JPEG chunk bodies (uncompressed `##db` DIBs,
    * other codecs) are skipped; an unparseable container yields an
    * empty array, mirroring null-for-undecodable elsewhere.
    */
  private[operators] def aviJpegFrames(payload: Array[Byte]): Array[Array[Byte]] = {
    if (payload == null || payload.length < 12) return Array.empty
    if (fourCC(payload, 0) != "RIFF" || fourCC(payload, 8) != "AVI ") return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val frameId = java.util.regex.Pattern.compile("[0-9]{2}d[bc]")
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      // Long cursor + Long end arithmetic: a crafted chunk size near
      // Int.MaxValue must neither wrap the cursor negative (index
      // crash) nor wrap `body + size` (mis-sliced frame) — same
      // no-throw contract as parseWav
      var pos = from.toLong
      while (pos + 8 <= to) {
        val p = pos.toInt
        val id = fourCC(payload, p)
        val size = leI32(payload, p + 4)
        if (size < 0) return
        val body = p + 8
        val end = math.min(body.toLong + size, to.toLong).toInt
        if (id == "LIST" && end - body >= 4) {
          val sub = fourCC(payload, body)
          walk(body + 4, end, inMovi || sub == "movi")
        } else if (inMovi && frameId.matcher(id).matches() && end - body >= 2 &&
            (payload(body) & 0xff) == 0xFF && (payload(body + 1) & 0xff) == 0xD8) {
          out += java.util.Arrays.copyOfRange(payload, body, end)
        }
        pos = body.toLong + size + (size & 1)
      }
    }
    walk(12, payload.length, inMovi = false)
    out.toArray
  }

  /** An uncompressed-DIB AVI video: frame dimensions from the
    * `strf` BITMAPINFOHEADER, one raw bottom-up BGR24 pixel buffer
    * per `##db` chunk.
    */
  private[operators] final case class DibVideo(width: Int, height: Int,
      frames: Array[Array[Byte]])

  /** Parse an UNCOMPRESSED (BI_RGB 24bpp) AVI — the lossless sibling
    * of [[aviJpegFrames]], and the format that makes video decode
    * ORACLE-EXACT (JPEG frames are lossy, so MJPEG pixel values
    * can't be predicted by a SQL engine; raw DIB rows can). Real AVI
    * structure: dimensions and the BI_RGB/24bpp contract come from
    * the first video `strf` BITMAPINFOHEADER in the header LIST;
    * frames are the `##db` chunk bodies in `movi` whose size is
    * exactly height × 4-byte-padded row stride. Positive biHeight =
    * bottom-up row order (the DIB default), preserved here — the
    * consumer flips. Non-matching chunks (JUNK padding, `##dc`
    * compressed frames, wrong-size bodies) are skipped; an
    * unparseable container or a non-BI_RGB/24bpp stream yields null,
    * mirroring null-for-undecodable elsewhere.
    */
  private[operators] def parseAviDib(payload: Array[Byte]): DibVideo = {
    if (payload == null || payload.length < 12) return null
    if (fourCC(payload, 0) != "RIFF" || fourCC(payload, 8) != "AVI ") return null
    var w = 0
    var h = 0
    var ok = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val frameId = java.util.regex.Pattern.compile("[0-9]{2}db")
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var pos = from.toLong // Long cursor: the aviJpegFrames contract
      while (pos + 8 <= to) {
        val p = pos.toInt
        val id = fourCC(payload, p)
        val size = leI32(payload, p + 4)
        if (size < 0) return
        val body = p + 8
        val end = math.min(body.toLong + size, to.toLong).toInt
        if (id == "LIST" && end - body >= 4) {
          val sub = fourCC(payload, body)
          walk(body + 4, end, inMovi || sub == "movi")
        } else if (id == "strf" && !ok && end - body >= 40 &&
            leI32(payload, body) == 40) {
          // biSize == 40 marks a BITMAPINFOHEADER (an audio stream's
          // WAVEFORMATEX never starts with 40) — cheap video/audio
          // strf discrimination without tracking the sibling strh
          val bitCount = leU16(payload, body + 14)
          val compression = leI32(payload, body + 16)
          val bw = leI32(payload, body + 4)
          val bh = leI32(payload, body + 8)
          if (compression == 0 && bitCount == 24 && bw > 0 && bh > 0) {
            w = bw; h = bh; ok = true
          }
        } else if (inMovi && ok && frameId.matcher(id).matches()) {
          val stride = (w * 3 + 3) & ~3
          if (end - body == stride * h)
            frames += java.util.Arrays.copyOfRange(payload, body, end)
        }
        pos = body.toLong + size + (size & 1)
      }
    }
    walk(12, payload.length, inMovi = false)
    if (!ok || frames.isEmpty) null else DibVideo(w, h, frames.toArray)
  }

  /** Per-media-type kernel dispatch — REAL decode for every format
    * this container can handle without native codecs: ImageIO images,
    * RIFF-parsed WAV audio, first-frame stats of MJPEG AVI video.
    * Deterministic stub for the rest. One place to widen as codecs
    * land.
    */
  def decodeFor(mediaType: String, payload: Array[Byte]): Array[Float] =
    mediaType match {
      case "image/png" | "image/jpeg" | "image/gif" | "image/bmp"
         | "image/vnd.wap.wbmp" => decodeImage(payload)
      case "audio/wav" | "audio/x-wav" | "audio/wave" => decodeWav(payload)
      case "video/avi" | "video/x-msvideo" =>
        aviJpegFrames(payload).iterator.map(decodeImage)
          .find(_ != null).orNull
      case _ => stubDecode(payload)
    }

  /** Batched per-partition feature extraction: one task per input
    * split, payload bytes stream through the media-type-dispatched
    * decoder, output is (media_id, feature array). The Spark-side
    * shape — mapPartitions over an Iterator, no materialized
    * partition buffer — is what a Pandas-UDF `mapInPandas` would
    * compile to on a JVM-only stack.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select($"media_id", $"payload", $"media_type")
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, mt) =>
        (id, decodeFor(mt, bytes))
      })
      .toDF("media_id", "features")
  }

  /** REAL audio window sampler: WAV payloads → overlapping analysis
    * windows of the mono mixdown, each row carrying
    * `[rms, zeroCrossRate, peakAbs, meanAbs, dcOffset]` — the
    * one-to-many audio shape (what an MFCC/fbank front-end does)
    * running on real samples. flatMap inside mapPartitions: output
    * rows ≫ input rows, bounded memory, no driver involvement.
    * Undecodable payloads yield no rows.
    */
  def sampleAudioWindows(media: DataFrame, windowSamples: Int = 1024,
      hopSamples: Int = 512): DataFrame = {
    require(windowSamples > 0 && hopSamples > 0, "window/hop must be positive")
    import media.sparkSession.implicits._
    media.select($"media_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val w = parseWav(bytes)
        if (w == null || w.mono.isEmpty) Iterator.empty
        else (0 until w.mono.length by hopSamples).iterator.map { off =>
          val win = java.util.Arrays.copyOfRange(
            w.mono, off, math.min(off + windowSamples, w.mono.length))
          (id, off / hopSamples, off.toLong, windowStats(win))
        }
      })
      .toDF("media_id", "frame_idx", "sample_offset", "features")
  }

  /** REAL video frame sampler for MJPEG AVI: every `every`-th frame
    * of the container decodes through the image kernel, yielding the
    * per-frame pixel-stat vector — video → frames with no native
    * codec. Frames that fail JPEG decode yield null features (kept,
    * so frame indexing stays truthful); undecodable containers yield
    * no rows.
    */
  def sampleVideoFrames(media: DataFrame, every: Int = 1): DataFrame = {
    require(every > 0, "frame stride must be positive")
    import media.sparkSession.implicits._
    media.select($"media_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        aviJpegFrames(bytes).iterator.zipWithIndex
          .filter(_._2 % every == 0)
          .map { case (jpeg, i) => (id, i, decodeImage(jpeg)) }
      })
      .toDF("media_id", "frame_idx", "features")
  }

  /** STUB FRAME SAMPLER — the codec-less fallback of the one-to-many
    * shape for formats whose codecs are absent (MP3 windows, H.264
    * frames): each payload yields ceil(n_bytes / frameBytes)
    * pseudo-frames, each with its index and byte offset. The REAL
    * equivalents are [[sampleAudioWindows]] (WAV) and
    * [[sampleVideoFrames]] (MJPEG AVI); a deployment with codecs
    * swaps the slicing the same way.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256): DataFrame = {
    import media.sparkSession.implicits._
    media.select($"media_id", $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else bytes.grouped(frameBytes).zipWithIndex.map {
          case (frame, i) =>
            (id, i, i.toLong * frameBytes, stubDecode(frame))
        }
      })
      .toDF("media_id", "frame_idx", "byte_offset", "features")
  }

  /** STUB RESIZE — the dimension-normalization shape (image resize /
    * audio resample): bucket-mean a feature vector down to a fixed
    * output width, ragged buckets handled like any resampler
    * (bucket i covers [⌊i·in/out⌋, ⌊(i+1)·in/out⌋)). A real
    * deployment swaps this for interpolated pixel/sample resize; the
    * distributed contract — pure per-row transform, no shuffle, no
    * driver — is identical.
    */
  def resize(features: Array[Float], outDim: Int): Array[Float] = {
    val in = features.length
    val out = new Array[Float](outDim)
    if (in > 0) {
      var i = 0
      while (i < outDim) {
        val s = i * in / outDim
        val e = math.max(((i + 1) * in) / outDim, s + 1)
        var sum = 0f
        var j = s
        while (j < e && j < in) { sum += features(j); j += 1 }
        out(i) = if (j > s) sum / (j - s) else 0f
        i += 1
      }
    }
    out
  }

  /** Resize every row's feature vector — composes after
    * [[extractFeatures]] / [[sampleFrames]].
    */
  def resizeFeatures(feats: DataFrame, outDim: Int = 4): DataFrame = {
    import feats.sparkSession.implicits._
    feats.select($"media_id", $"features").as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, f) => (id, resize(f, outDim)) })
      .toDF("media_id", "features")
  }

  /** Q23 — metadata-only path, oracle-checked: byte length + content
    * hash per media item. `.explain` shows ReadSchema without the
    * payload column when run over a stored media table.
    */
  def q23MediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(Tables.load(spark, dir, "documents"))
      .select($"media_id", $"media_type", $"n_bytes", $"content_sha")
      .orderBy($"media_id")
  }

  // ---- MIME sniffing (q167) ---------------------------------------
  //
  // Content-type VALIDATION at ingest: a 100 TB media crawl cannot
  // trust declared Content-Type headers — payloads arrive mislabeled
  // (served-as-PNG BMPs, RIFF confusion between WAV and AVI), and a
  // pipeline that routes decode by declared type feeds corrupt inputs
  // to the wrong decoder. Magic-byte sniffing over the first bytes is
  // the standard gate (file(1) / WHATWG mime-sniff): pure codegen'd
  // byte-prefix comparisons on the binary column — no decode, no UDF,
  // zero shuffles, rides the ingest scan.

  /** Detected MIME from payload magic bytes: PNG (8-byte signature),
    * BMP (`BM`), RIFF-contained WAVE/`AVI ` (bytes 1-4 + 9-12), else
    * `application/octet-stream` (incl. NULL/short payloads —
    * undetectable routes to the quarantine bucket, the
    * null-for-undecodable contract's sniffing analogue).
    */
  def sniffMime(payload: Column): Column = {
    import org.apache.spark.sql.functions._
    val h8 = hex(substring(payload, 1, 8))
    val h2 = hex(substring(payload, 1, 2))
    val riff = hex(substring(payload, 1, 4)) === "52494646"
    val fmt = hex(substring(payload, 9, 4))
    when(h8 === "89504E470D0A1A0A", "image/png")
      .when(h2 === "424D", "image/bmp")
      .when(riff && fmt === "57415645", "audio/wav")
      .when(riff && fmt === "41564920", "video/avi")
      .otherwise("application/octet-stream")
  }

  /** Q167 — declared-vs-detected MIME audit over all three rendered
    * media fixtures (image PNG/BMP, audio WAV, video AVI — the id
    * lattices offset so the union stays collision-free): every
    * payload's magic bytes are sniffed through the REAL codec output,
    * with planted MISLABELS (every 13th doc's base image declared
    * `image/bmp`; every 31st doc's base clip declared `video/avi` —
    * the RIFF-confusion case sniffing exists to catch). The oracle
    * derives both columns from the doc-id lattice alone: a detected
    * mismatch with the oracle means a renderer stopped emitting the
    * magic its container promises.
    */
  def q167MimeSniff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val media = ImageHash.syntheticMedia(docs)
      .unionByName(AudioHash.syntheticMedia(docs)
        .withColumn("media_id", $"media_id" + 3L))
      .unionByName(VideoHash.syntheticMedia(docs)
        .withColumn("media_id", $"media_id" + 6L))
    // doc = media_id div 10 — Column `/` is Double division, div is
    // the exact integer form
    val declared =
      when($"media_id" % 10 === 0 &&
          expr("(media_id div 10) % 13") === 0, lit("image/bmp"))
        .when($"media_id" % 10 === 3 &&
          expr("((media_id - 3) div 10) % 31") === 0, lit("video/avi"))
        .otherwise($"media_type")
    media
      .select($"media_id", declared.as("declared"),
        sniffMime($"payload").as("detected"))
      .withColumn("mismatch", $"declared" =!= $"detected")
      .orderBy($"media_id")
  }

  /** DuckDB oracle for [[q167MimeSniff]] — both columns from the id
    * lattice: the image family renders PNG bases/resizes and BMP
    * re-encodes, audio renders WAVE, video renders `AVI `; declared
    * applies the same mislabel plants.
    */
  def mimeSniffOracleSql(resizeMod: Long = 17L, reencodeMod: Long = 29L,
      aReencodeMod: Long = 19L, aGainMod: Long = 23L,
      vJunkMod: Long = 19L, vBrightMod: Long = 23L): String =
    s"""WITH m AS (
       |  SELECT doc_id, doc_id * 10 AS media_id,
       |    'image/png' AS detected FROM documents
       |  UNION ALL SELECT doc_id, doc_id * 10 + 1, 'image/png'
       |    FROM documents WHERE doc_id % $resizeMod = 0
       |  UNION ALL SELECT doc_id, doc_id * 10 + 2, 'image/bmp'
       |    FROM documents WHERE doc_id % $reencodeMod = 0
       |  UNION ALL SELECT doc_id, doc_id * 10 + 3, 'audio/wav'
       |    FROM documents
       |  UNION ALL SELECT doc_id, doc_id * 10 + 4, 'audio/wav'
       |    FROM documents WHERE doc_id % $aReencodeMod = 0
       |  UNION ALL SELECT doc_id, doc_id * 10 + 5, 'audio/wav'
       |    FROM documents WHERE doc_id % $aGainMod = 0
       |  UNION ALL SELECT doc_id, doc_id * 10 + 6, 'video/avi'
       |    FROM documents
       |  UNION ALL SELECT doc_id, doc_id * 10 + 7, 'video/avi'
       |    FROM documents WHERE doc_id % $vJunkMod = 0
       |  UNION ALL SELECT doc_id, doc_id * 10 + 8, 'video/avi'
       |    FROM documents WHERE doc_id % $vBrightMod = 0),
       | d AS (SELECT media_id,
       |    CASE WHEN media_id % 10 = 0 AND doc_id % 13 = 0 THEN 'image/bmp'
       |         WHEN media_id % 10 = 3 AND doc_id % 31 = 0 THEN 'video/avi'
       |         ELSE detected END AS declared,
       |    detected
       |  FROM m)
       |SELECT media_id, declared, detected,
       |  (declared <> detected) AS mismatch
       |FROM d
       |ORDER BY media_id""".stripMargin
}
