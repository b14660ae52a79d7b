package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Multimodal-column plumbing (north star): image/audio/video as
  * opaque `binary` payloads plus typed metadata, with batched
  * per-partition feature extraction. Decode dispatches on
  * `media_type`: PNG/JPEG payloads decode FOR REAL via the JDK's
  * `javax.imageio` ([[decodeImage]] — pixel-stat feature vector);
  * formats needing native libs absent from this container (audio,
  * video) fall back to the deterministic stub ([[stubDecode]]), so
  * the pipeline shape is identical for every modality and a real
  * deployment swaps only the per-format kernel.
  *
  * At 100 TB: payloads dominate storage, so (1) metadata-only queries
  * must never read the payload column (parquet column pruning — the
  * scan's ReadSchema excludes `payload`), and (2) decode runs
  * per-partition with bounded batch memory, never per-row JVM churn
  * and never a driver collect.
  */
object Multimodal {

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

  /** STUB DECODE — stands in for image decode / audio PCM / frame
    * sampling, which need native libs absent from this container. A
    * real deployment swaps ONLY this function (same signature: bytes →
    * fixed-width feature vector). Deterministic: 8-bucket byte
    * histogram, L1-normalized.
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
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
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

  /** Per-media-type kernel dispatch: real image decode for every
    * format the bundled JDK's ImageIO ships a reader for (PNG, JPEG,
    * GIF, BMP — and WBMP, which shares the BMP family), deterministic
    * stub for everything else (audio/video codecs aren't in this
    * container). One place to widen as codecs land.
    */
  def decodeFor(mediaType: String, payload: Array[Byte]): Array[Float] =
    mediaType match {
      case "image/png" | "image/jpeg" | "image/gif" | "image/bmp"
         | "image/vnd.wap.wbmp" => decodeImage(payload)
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

  /** STUB FRAME SAMPLER — the one-to-many extraction shape (video →
    * frames, audio → windows): each payload yields ceil(n_bytes /
    * frameBytes) pseudo-frames, each with its index and byte offset.
    * A real deployment swaps the slicing for codec-aware frame
    * decoding; the Spark shape — flatMap inside mapPartitions, output
    * rows ≫ input rows, no driver involvement — is the real contract.
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
}
