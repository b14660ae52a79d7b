package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NorthStarSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: n-grams, distinct, short-text guard") {
    val df = Seq("a b c d", "a b", "x y z x y z").toDF("text")
    val got = df.select(NearDup.shingles($"text", 3).as("s"))
      .collect().map(_.getSeq[String](0).toSet)
    assert(got(0) == Set("a b c", "b c d"))
    assert(got(1) == Set.empty[String]) // shorter than n → empty, not sequence-down
    assert(got(2) == Set("x y z", "y z x", "z x y")) // distinct collapses repeats
  }

  test("jaccardPairs finds planted near-dup, skips unrelated") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy cat today"),
      (3L, "completely different words with no overlap at all here"),
    ).toDF("doc_id", "text")
    val pairs = NearDup.jaccardPairs(docs, 0.3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val jac = pairs.head.getDouble(2)
    // docs 1,2 share 6 of their 8+8 distinct shingles → 6/10
    assert(math.abs(jac - 0.6) < 1e-12)
  }

  test("q20 as-of join: strict before, carries latest snapshot, null before first") {
    // hand fixture via temp view shadowing is overkill — check invariants on sf data
    val df = Temporal.q20AsOfJoin(spark, sf).cache()
    val e = graft.core.Tables.load(spark, sf, "events")
    assert(df.count() == e.count()) // left join keeps every event
    // strictly before: snap_ts < ts for every matched row
    val joined = df.join(e.select($"event_id", $"ts"), "event_id")
    assert(joined.filter($"snap_ts".isNotNull && $"snap_ts" >= $"ts").count() == 0)
    // each user's earliest event has no earlier snapshot
    val firstEvents = e.groupBy($"user_id").agg(min(struct($"ts", $"event_id")).as("f"))
      .select($"user_id", $"f.event_id".as("event_id"))
    assert(firstEvents.join(df, "event_id").filter($"snap_value".isNotNull).count() == 0)
  }

  test("q19 windowed agg partitions all events into day buckets") {
    val df = Temporal.q19WindowedAgg(spark, sf)
    val total = df.agg(sum($"n")).head().getLong(0)
    assert(total == graft.core.Tables.load(spark, sf, "events").count())
  }

  test("q21 cube emits all 4 granularities consistently") {
    val rows = Temporal.q21Cube(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val detail = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1)).map(_.getLong(2)).sum
    assert(grand.length == 1 && grand.head.getLong(2) == detail)
  }

  test("detectLanguage: argmax with declaration-order tie-break") {
    val df = Seq(
      "the cat is on the mat",       // en hits
      "le chat est dans la maison",  // fr hits
      "xyz qrs tuv",                 // no hits anywhere → tie at 0 → en
    ).toDF("text")
    val got = df.select(TextAnalysis.detectLanguage($"text")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "fr", "en"))
  }

  test("fingerprint: deterministic rolling hash, matches hand computation") {
    val got = Seq("ab").toDF("text")
      .select(TextAnalysis.fingerprint($"text")).head().getLong(0)
    // ((0*31+97) * 31 + 98) % 1000000007 = 97*31+98 = 3105
    assert(got == 3105L)
  }

  test("multimodal: stub decode histogram is L1-normalized; features distributed per partition") {
    val media = Multimodal.mediaFromDocuments(
      graft.core.Tables.load(spark, sf, "documents")).repartition(4)
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() == 500)
    val sums = feats.select(aggregate($"features",
      lit(0.0), (a, x) => a + x).as("s")).collect().map(_.getDouble(0))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-5))
  }

  test("multimodal: frame sampling yields ceil(bytes/frame) rows with correct offsets") {
    val media = Multimodal.mediaFromDocuments(
      graft.core.Tables.load(spark, sf, "documents"))
    val frames = Multimodal.sampleFrames(media, frameBytes = 256).cache()
    val expected = media.select(
      ceil($"n_bytes".cast("double") / 256).cast("long").as("nf"))
      .agg(sum($"nf")).head().getLong(0)
    assert(frames.count() == expected)
    val f = frames.filter($"media_id" === 0L).orderBy($"frame_idx").collect()
    assert(f.zipWithIndex.forall { case (r, i) =>
      r.getInt(1) == i && r.getLong(2) == i.toLong * 256
    })
  }

  /** A real encoded image, generated in-memory with known pixels. */
  private def imgBytes(fmt: String, w: Int, h: Int,
      rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def pngBytes(w: Int, h: Int,
      rgb: (Int, Int) => Int): Array[Byte] = imgBytes("png", w, h, rgb)

  test("multimodal: REAL PNG bytes decode to exact pixel-stat features") {
    // 4x2: left half pure red, right half pure blue
    val bytes = pngBytes(4, 2,
      (x, _) => if (x < 2) 0xff0000 else 0x0000ff)
    val media = Seq((1L, bytes, "image/png", bytes.length.toLong, "sha"))
      .toDF("media_id", "payload", "media_type", "n_bytes", "content_sha")
    val f = Multimodal.extractFeatures(media)
      .head().getSeq[Float](1)
    assert(f(0) == 4f && f(1) == 2f)                  // dimensions
    assert(math.abs(f(2) - 0.5f) < 1e-6)              // mean R: half red
    assert(f(3) == 0f)                                // no green anywhere
    assert(math.abs(f(4) - 0.5f) < 1e-6)              // mean B: half blue
    // luma: red 0.299*255, blue 0.114*255 → mean (0.299+0.114)/2
    assert(math.abs(f(5) - (0.299f + 0.114f) / 2) < 1e-3)
    assert(f(6) > 0f)                                 // two-tone → nonzero std
    assert(f(7) == 0f)                                // fully opaque
    // a non-image media_type with the same bytes takes the stub path
    val stub = Multimodal.extractFeatures(
        media.withColumn("media_type", lit("video/mp4")))
      .head().getSeq[Float](1)
    assert(stub.toArray.toSeq == Multimodal.stubDecode(bytes).toSeq)
  }

  test("multimodal: BMP bytes decode to exact pixel-stat features") {
    // same half-red / half-blue frame as the PNG spec — BMP is
    // 24-bit-exact, so the stats are identical
    val bytes = imgBytes("bmp", 4, 2,
      (x, _) => if (x < 2) 0xff0000 else 0x0000ff)
    val media = Seq((1L, bytes, "image/bmp", bytes.length.toLong, "sha"))
      .toDF("media_id", "payload", "media_type", "n_bytes", "content_sha")
    val f = Multimodal.extractFeatures(media).head().getSeq[Float](1)
    assert(f(0) == 4f && f(1) == 2f, "bmp dimensions")
    assert(math.abs(f(2) - 0.5f) < 1e-6, "bmp mean R")
    assert(f(3) == 0f, "bmp green")
    assert(math.abs(f(4) - 0.5f) < 1e-6, "bmp mean B")
    assert(math.abs(f(5) - (0.299f + 0.114f) / 2) < 1e-3, "bmp luma")
    assert(f(7) == 0f, "bmp alpha")
    // and NOT the stub: the stub's histogram features are
    // L1-normalized over 8 bins, so its f(0) is ≤ 1, never a width
    assert(Multimodal.stubDecode(bytes)(0) != f(0), "bmp real path")
  }

  test("multimodal: GIF bytes decode to exact pixel-stat features") {
    // HANDCRAFTED GIF89a fixture — ground truth independent of any
    // encoder (this JDK's GIF *writer* corrupts the last row of small
    // frames, so a write-then-read round trip would test the writer's
    // bug, not our decode path): 2x2, 2-color palette {red, blue},
    // pixel indices [0,1,0,1] via byte-aligned 8-bit LZW codes (the
    // "uncompressed GIF" encoding: clear, px0..px3, end-of-info)
    val bytes = Array[Int](
      0x47, 0x49, 0x46, 0x38, 0x39, 0x61,             // "GIF89a"
      0x02, 0x00, 0x02, 0x00, 0xF0, 0x00, 0x00,       // LSD 2x2 + GCT(2)
      0xFF, 0x00, 0x00, 0x00, 0x00, 0xFF,             // palette red, blue
      0x2C, 0, 0, 0, 0, 0x02, 0x00, 0x02, 0x00, 0x00, // image descriptor
      0x07,                                           // LZW min code size
      0x06, 0x80, 0x00, 0x01, 0x00, 0x01, 0x81,       // clear 0 1 0 1 EOI
      0x00, 0x3B                                      // terminator+trailer
    ).map(_.toByte)
    val media = Seq((1L, bytes, "image/gif", bytes.length.toLong, "sha"))
      .toDF("media_id", "payload", "media_type", "n_bytes", "content_sha")
    val f = Multimodal.extractFeatures(media).head().getSeq[Float](1)
    assert(f(0) == 2f && f(1) == 2f, "gif dimensions")
    assert(math.abs(f(2) - 0.5f) < 1e-6, "gif mean R: one red per row")
    assert(f(3) == 0f, "gif green")
    assert(math.abs(f(4) - 0.5f) < 1e-6, "gif mean B: one blue per row")
    assert(math.abs(f(5) - (0.299f + 0.114f) / 2) < 1e-3, "gif luma")
    assert(f(7) == 0f, "gif alpha")
    assert(Multimodal.stubDecode(bytes)(0) != f(0), "gif real path")
  }

  test("multimodal: corrupt image payload yields null features, not a crash") {
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val media = Seq(
      (1L, junk, "image/png", 64L, "sha"),
      (2L, pngBytes(2, 2, (_, _) => 0xffffff), "image/png", 0L, "sha2"))
      .toDF("media_id", "payload", "media_type", "n_bytes", "content_sha")
    val rows = Multimodal.extractFeatures(media)
      .orderBy($"media_id").collect()
    assert(rows(0).isNullAt(1), "corrupt payload must decode to null")
    assert(rows(1).getSeq[Float](1)(2) == 1f, "white image meanR = 1")
  }

  test("multimodal: metadata-only query prunes the payload column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("media-test").toString
    Multimodal.mediaFromDocuments(
      graft.core.Tables.load(spark, sf, "documents"))
      .write.parquet(s"$dir/media")
    val meta = spark.read.parquet(s"$dir/media")
      .select($"media_id", $"n_bytes", $"content_sha")
    val scan = meta.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema") && !scan.contains("payload"))
  }


  test("multimodal resize: bucket means, ragged division, row preservation") {
    assert(Multimodal.resize(Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f), 4)
      .toSeq == Seq(1.5f, 3.5f, 5.5f, 7.5f))
    // 5 -> 2: buckets [0,2) and [2,5)
    assert(Multimodal.resize(Array(1f, 2f, 3f, 4f, 5f), 2)
      .toSeq == Seq(1.5f, 4f))
    // upsample-ish: 2 -> 4 repeats bucket sources, never divides by 0
    assert(Multimodal.resize(Array(2f, 6f), 4).toSeq == Seq(2f, 2f, 6f, 6f))
    assert(Multimodal.resize(Array.empty[Float], 3).toSeq == Seq(0f, 0f, 0f))
    val media = Multimodal.mediaFromDocuments(
      graft.core.Tables.load(spark, sf, "documents"))
    val feats = Multimodal.extractFeatures(media)
    val resized = Multimodal.resizeFeatures(feats, 4)
    assert(resized.count() == feats.count())
    assert(resized.head().getSeq[Float](1).length == 4)
  }

  test("stratified sample: deterministic, roughly honors per-stratum fractions") {
    val e = graft.core.Tables.load(spark, sf, "events")
    val fr = Map("click" -> 0.5, "view" -> 0.1, "error" -> 0.0,
      "purchase" -> 1.0, "signup" -> 0.25)
    val s1 = Profiling.stratifiedSample(e, "event_type", fr)
    val s2 = Profiling.stratifiedSample(e, "event_type", fr)
    assert(s1.collect().toSeq == s2.collect().toSeq) // seeded => identical
    val got = s1.groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = e.groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("error"))                        // 0.0 stratum empty
    assert(got("purchase") == base("purchase"))           // 1.0 stratum full
    val clickRatio = got("click").toDouble / base("click")
    assert(clickRatio > 0.3 && clickRatio < 0.7, s"click ratio $clickRatio")
  }
}
