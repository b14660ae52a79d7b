package graft.store

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** RETRIEVAL SERVING (VERDICT r11 #8) — the [[ServingCache]] bucket
  * pattern applied to the standing search indexes: a query-side tier
  * that answers BM25 and ANN probes from DRIVER-CACHED index slices
  * with ZERO Spark jobs on the warm path, while reproducing the
  * batch operators' results bit-for-bit (spec-pinned wire parity
  * with [[graft.operators.Retrieval.bm25TopKFromIndex]] and
  * [[IvfIndex.topK]]).
  *
  * Read units mirror how each index is partitioned on disk:
  *
  *  - BM25: the postings store `(doc_id, th, tf, dl)` is laid out
  *    `tb = pmod(th, nBuckets)` ([[Bm25SearchTier.writeIndex]]), so
  *    one query term's postings — INCLUDING its exact global df —
  *    live in exactly one partition directory; a probe reads only
  *    its terms' buckets (partition-pruned), memoized in a per-bucket
  *    LRU. Corpus scalars (N, Σdl) are one Spark reduction, cached
  *    on the driver and refreshed only on [[Bm25SearchTier.invalidate]]
  *    — the BM25 analogue of [[ServingCache]]'s warm tier. `nBuckets`
  *    sizes the read unit: at corpus scale thousands of buckets keep
  *    a bucket cache-able while a term's df stays exact.
  *  - ANN: the IVF store is laid out `cell=<id>` (the
  *    [[IvfIndex.assign]] partition contract); the FROZEN quantizer
  *    lives on the driver, probe→cell choice is a driver-side cosine
  *    over nLists centroids, and only the nProbe chosen cells are
  *    read (partition-pruned) and reranked with the IDENTICAL cosine
  *    fold the codegen'd expression runs.
  *
  * Scoring parity is exact, not approximate: the driver evaluates
  * the same left-associated double dag, the same
  * `BigDecimal.valueOf(...).setScale(_, HALF_UP)` rounding Spark's
  * `round` applies, the same Long tick summation, and the same
  * (ticks DESC, doc_id) / (sim DESC, vec_id) total orders.
  */
object SearchEndpoint {

  /** Write a BM25 postings frame as the term-bucketed serving layout. */
  def writeBm25Index(post: org.apache.spark.sql.DataFrame, dir: String,
      nBuckets: Int = 64): Unit =
    post.withColumn("tb", pmod(col("th"), lit(nBuckets.toLong)))
      .write.partitionBy("tb").mode("overwrite").parquet(dir)

  /** Write an assigned IVF frame (`vec_id, embedding, cell`) as the
    * cell-partitioned serving layout.
    */
  def writeIvfIndex(indexed: org.apache.spark.sql.DataFrame,
      dir: String): Unit =
    indexed.select(col("vec_id"), col("embedding"), col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(dir)

  /** Write a `(media_id, dhash, ahash)` signature frame as the
    * BAND-bucketed serving layout: each signature explodes into its
    * [[graft.operators.ImageHash.chunks]] pigeonhole bands, and rows
    * partition by `bb = pmod(chunk·2^bandBits + chunk_val, nBuckets)`
    * — the probe computes the same 4 band keys driver-side, so a
    * near-dup admission check reads at most 4 bucket directories
    * (partition-pruned), never the index.
    */
  def writeSignatureIndex(sig: org.apache.spark.sql.DataFrame,
      dir: String, nBuckets: Int = 64): Unit = {
    val bandBits = graft.operators.ImageHash.dBits /
      graft.operators.ImageHash.chunks
    sig.select(col("media_id"), col("dhash"), col("ahash"),
        explode(sequence(lit(0),
          lit(graft.operators.ImageHash.chunks - 1))).as("chunk"))
      .withColumn("chunk_val",
        expr(s"shiftrightunsigned(dhash, chunk * $bandBits)")
          .bitwiseAND(lit((1L << bandBits) - 1)))
      .withColumn("bb", pmod(
        col("chunk").cast("long") * (1L << bandBits) + col("chunk_val"),
        lit(nBuckets.toLong)))
      .write.partitionBy("bb").mode("overwrite").parquet(dir)
  }
}

/** Driver-side BM25 scorer over the term-bucketed postings store —
  * see [[SearchEndpoint]]. Thread-safe; per-bucket memoization with
  * an LRU bound (the [[ServingCache]] shape).
  */
final class Bm25SearchTier(spark: SparkSession, indexDir: String,
    nBuckets: Int = 64, maxCachedBuckets: Int = 16,
    k1: Double = 1.2, b: Double = 0.75) {
  require(nBuckets > 0 && maxCachedBuckets > 0,
    "nBuckets and maxCachedBuckets must be positive")

  /** th → postings (doc_id, tf, dl), grouped per term at load. */
  private type Bucket = Map[Long, Array[(Long, Long, Long)]]

  private val lru = new java.util.LinkedHashMap[Int, Bucket](
      16, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[Int, Bucket]): Boolean =
      size() > maxCachedBuckets
  }
  private var hitsN = 0L
  private var missesN = 0L
  @volatile private var scalars: (Long, Long) = null // (n, totDl)

  def stats: (Long, Long) = synchronized((hitsN, missesN))

  def invalidate(): Unit = synchronized { lru.clear(); scalars = null }

  /** Corpus scalars (N docs, Σdl) — ONE Spark reduction over the
    * store, then driver-cached for the tier's lifetime (every doc
    * contributes `dl` identically on all its rows, so a per-doc
    * first() is exact). The only Spark work a warm tier ever did.
    */
  private def corpusScalars(): (Long, Long) = {
    val s = scalars
    if (s != null) return s
    val row = spark.read.parquet(indexDir)
      .groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).cast("long"), sum(col("dl")).cast("long"))
      .head()
    // empty-but-present store: count 0 makes sum(dl) NULL — guard
    // instead of letting getLong throw (and search() divide by 0);
    // an empty index answers every query with no results (r12 advice)
    val computed =
      if (row.getLong(0) == 0L) (0L, 0L) else (row.getLong(0), row.getLong(1))
    scalars = computed
    computed
  }

  private def bucketOf(th: Long): Int =
    java.lang.Math.floorMod(th, nBuckets.toLong).toInt

  /** Partition-pruned bucket load: reads ONLY `tb=<b>`. */
  private def loadBucket(bkt: Int): Bucket =
    spark.read.parquet(s"$indexDir/tb=$bkt")
      .select(col("th"), col("doc_id"), col("tf"), col("dl"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (th, rows) =>
        th -> rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      }

  private def bucket(bkt: Int): Bucket = {
    val hit = synchronized {
      val c = Option(lru.get(bkt))
      c.foreach(_ => hitsN += 1)
      c
    }
    hit.getOrElse {
      val loaded = loadBucket(bkt)
      synchronized { missesN += 1; lru.put(bkt, loaded); loaded }
    }
  }

  /** Top-k BM25 over the standing index for a distinct term-hash set:
    * `(rank, doc_id, score)` — the exact rows
    * `bm25TopKFromIndex(post, [(queryId, th…)], k)` emits for this
    * query. `exclude` reproduces the batch operator's own-doc
    * exclusion (pass the query's doc_id, or -1 for none).
    */
  def search(terms: Seq[Long], k: Int,
      exclude: Long = -1L): Seq[(Int, Long, Double)] = {
    val (n, tot) = corpusScalars()
    if (n == 0L) return Seq.empty
    val ticksByDoc = new java.util.HashMap[java.lang.Long, java.lang.Long]
    terms.distinct.foreach { th =>
      bucket(bucketOf(th)).get(th).foreach { postings =>
        val df = postings.length.toLong
        val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        postings.foreach { case (doc, tf, dl) =>
          if (doc != exclude) {
            // the EXACT left-associated dag of Retrieval.score
            val t = idf * tf * (k1 + 1.0) /
              (tf + k1 * ((1.0 - b) + b * dl * n / tot)) * 1000000.0
            val tick = java.math.BigDecimal.valueOf(t)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
            ticksByDoc.merge(java.lang.Long.valueOf(doc),
              java.lang.Long.valueOf(tick),
              (a: java.lang.Long, b2: java.lang.Long) =>
                java.lang.Long.valueOf(a.longValue() + b2.longValue())): Unit
          }
        }
      }
    }
    import scala.jdk.CollectionConverters._
    ticksByDoc.asScala.toSeq
      .map { case (doc, ticks) => (doc.longValue(), ticks.longValue()) }
      .sortBy { case (doc, ticks) => (-ticks, doc) }
      .take(k)
      .zipWithIndex
      .map { case ((doc, ticks), i) =>
        (i + 1, doc, java.math.BigDecimal.valueOf(ticks / 1000000.0)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
      }
  }
}

/** Driver-side ANN scorer over the cell-partitioned IVF store — see
  * [[SearchEndpoint]]. The quantizer is FROZEN on the driver; a
  * probe reads only its nProbe nearest cells.
  */
final class IvfSearchTier(spark: SparkSession, indexDir: String,
    model: IvfIndex.Model, maxCachedCells: Int = 8) {
  require(maxCachedCells > 0, "maxCachedCells must be positive")

  private val lru = new java.util.LinkedHashMap[Int, Array[(Long, Array[Double])]](
      16, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[Int, Array[(Long, Array[Double])]]): Boolean =
      size() > maxCachedCells
  }
  private var hitsN = 0L
  private var missesN = 0L

  def stats: (Long, Long) = synchronized((hitsN, missesN))

  def invalidate(): Unit = synchronized(lru.clear())

  /** Partition-pruned cell load: reads ONLY `cell=<c>`. */
  private def loadCell(c: Int): Array[(Long, Array[Double])] =
    spark.read.parquet(s"$indexDir/cell=$c")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  private def cell(c: Int): Array[(Long, Array[Double])] = {
    val hit = synchronized {
      val got = Option(lru.get(c))
      got.foreach(_ => hitsN += 1)
      got
    }
    hit.getOrElse {
      val loaded = loadCell(c)
      synchronized { missesN += 1; lru.put(c, loaded); loaded }
    }
  }

  /** The identical sequential cosine fold the codegen'd
    * [[org.apache.spark.sql.graft.CosineSimilarityExpr]] runs — bit
    * parity is what makes the wire results equal the batch rerank.
    */
  private def cosine(x: Array[Double], y: Array[Double]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { dot += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Top-k over the probe's nProbe nearest cells:
    * `(vec_id, sim)` ranked (sim DESC, vec_id) — the exact rows
    * [[IvfIndex.topK]] emits for this probe vector.
    */
  def search(vec: Array[Double], k: Int,
      nProbe: Int = 4): Seq[(Long, Double)] =
    model.nearestCells(vec, nProbe).flatMap(cell(_))
      .map { case (id, e) => (id, cosine(e, vec)) }
      .sortBy { case (id, sim) => (-sim, id) }
      .take(k)
}

/** Driver-side perceptual near-dup ADMISSION probe over the
  * band-bucketed signature store — the serving form of
  * [[graft.operators.ImageHash.nearDupGate]]: an ingest worker asks
  * "is this media already in the corpus?" before admitting it. The
  * probe's 4 pigeonhole band keys map to at most 4 bucket
  * directories ([[SearchEndpoint.writeSignatureIndex]]'s layout),
  * loaded partition-pruned and memoized in the LRU — warm probes are
  * ZERO Spark jobs, and results are exactly the batch gate's rows
  * for a one-probe batch (banding is EXACT for Hamming ≤ 3, so
  * parity is a theorem, not a tolerance).
  */
final class SigSearchTier(spark: SparkSession, indexDir: String,
    nBuckets: Int = 64, maxCachedBuckets: Int = 16) {
  require(nBuckets > 0 && maxCachedBuckets > 0,
    "nBuckets and maxCachedBuckets must be positive")

  private val bandBits = graft.operators.ImageHash.dBits /
    graft.operators.ImageHash.chunks
  private val bandMask = (1L << bandBits) - 1

  /** (chunk, chunk_val) → signatures in that band. */
  private type Bucket = Map[(Int, Long), Array[(Long, Long, Long)]]

  private val lru = new java.util.LinkedHashMap[Int, Bucket](
      16, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[Int, Bucket]): Boolean =
      size() > maxCachedBuckets
  }
  private var hitsN = 0L
  private var missesN = 0L

  def stats: (Long, Long) = synchronized((hitsN, missesN))

  def invalidate(): Unit = synchronized(lru.clear())

  private def bandsOf(dhash: Long): Seq[(Int, Long)] =
    (0 until graft.operators.ImageHash.chunks)
      .map(c => (c, (dhash >>> (c * bandBits)) & bandMask))

  private def bucketOf(band: (Int, Long)): Int =
    java.lang.Math.floorMod(
      band._1.toLong * (1L << bandBits) + band._2, nBuckets.toLong).toInt

  /** Partition-pruned bucket load: reads ONLY `bb=<b>`. */
  private def loadBucket(bkt: Int): Bucket =
    spark.read.parquet(s"$indexDir/bb=$bkt")
      .select(col("chunk"), col("chunk_val"), col("media_id"),
        col("dhash"), col("ahash"))
      .collect()
      .groupBy(r => (r.getInt(0), r.getLong(1)))
      .map { case (k, rows) =>
        k -> rows.map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
      }

  private def bucket(bkt: Int): Bucket = {
    val hit = synchronized {
      val c = Option(lru.get(bkt))
      c.foreach(_ => hitsN += 1)
      c
    }
    hit.getOrElse {
      val loaded = loadBucket(bkt)
      synchronized { missesN += 1; lru.put(bkt, loaded); loaded }
    }
  }

  /** Near-dup matches of one probe signature against the standing
    * index: `(media_id, hamming, a_hamming)` ordered (hamming ASC,
    * media_id) — the exact row set
    * `nearDupGate(index, [(probe)], maxHamming)` emits. An empty
    * result means the probe is novel and safe to admit.
    */
  def probe(dhash: Long, ahash: Long,
      maxHamming: Int = 3): Seq[(Long, Int, Int)] = {
    require(maxHamming < graft.operators.ImageHash.chunks,
      s"banding supports Hamming < ${graft.operators.ImageHash.chunks}")
    val seen = new java.util.HashMap[java.lang.Long, (Int, Int)]
    bandsOf(dhash).foreach { band =>
      bucket(bucketOf(band)).get(band).foreach(_.foreach {
        case (media, dh, ah) =>
          val hd = java.lang.Long.bitCount(dh ^ dhash)
          if (hd <= maxHamming)
            seen.putIfAbsent(java.lang.Long.valueOf(media),
              (hd, java.lang.Long.bitCount(ah ^ ahash))): Unit
      })
    }
    import scala.jdk.CollectionConverters._
    seen.asScala.toSeq
      .map { case (m, (hd, ha)) => (m.longValue(), hd, ha) }
      .sortBy { case (m, hd, _) => (hd, m) }
  }
}

/** Loopback HTTP surface over the two search tiers — the retrieval
  * sibling of [[ServingEndpoint]] (same JDK-HttpServer threading
  * shape, same compute-then-respond discipline):
  *
  *   GET /search?q=quick+brown&k=5[&exclude=7]
  *     → {"Results":[{"rank":1,"doc_id":9,"score":1.234567},…]}
  *   GET /ann?vec=0.1,0.2,…&k=10[&nprobe=4]
  *     → {"Results":[{"vec_id":3,"sim":0.987654},…]}
  *   GET /stats → bucket/cell cache hits+misses for both tiers
  *
  * Query text tokenizes with the corpus contract
  * ([[graft.operators.NearDup.tokenHash64]] over single-space
  * tokens), so wire queries hash exactly like ingested documents.
  */
final class SearchHttpEndpoint(bm25: Bm25SearchTier, ivf: IvfSearchTier,
    sig: SigSearchTier = null, port: Int = 0, nThreads: Int = 4,
    scrub: Seq[String] = Nil) {
  require(nThreads > 0, "nThreads must be positive")

  // the scrub catalog compiles to its automaton at construction and
  // every /scrub request is pure driver compute — zero Spark jobs by
  // construction. CATALOG GROWTH (the rescrub event) reaches the
  // online tier through [[reloadScrubCatalog]]: one driver-side
  // automaton rebuild, atomically swapped — in-flight requests finish
  // on the old automaton, the next request masks under the grown
  // catalog. No restart, still zero Spark jobs.
  @volatile private var scrubAc =
    if (scrub.isEmpty) null
    else graft.operators.Blocklist.buildAutomaton(scrub)

  /** Swap the scrub catalog for a grown one (the online leg of
    * `Blocklist.rescrub` — the batch side rewrites the landed corpus,
    * this keeps request-time masking in step). Pure driver compute;
    * the same catalog validation as the batch automaton build.
    */
  def reloadScrubCatalog(patterns: Seq[String],
      caseFold: Boolean = false): Unit = {
    scrubAc = graft.operators.Blocklist.buildAutomaton(patterns, caseFold)
  }

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)

  private def jsonEsc(s: String): String = graft.core.Json.esc(s)

  private final class BadRequest(msg: String) extends RuntimeException(msg)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  private def queryParam(ex: HttpExchange, name: String): Option[String] =
    Option(ex.getRequestURI.getRawQuery).flatMap {
      _.split("&").iterator.map(_.split("=", 2)).collectFirst {
        case Array(k, v) if k == name =>
          try java.net.URLDecoder.decode(v, "UTF-8")
          catch {
            case _: IllegalArgumentException =>
              throw new BadRequest(s"malformed percent-encoding in '$name'")
          }
      }
    }

  private def num(fmt: Double): String = String.format(
    java.util.Locale.ROOT, "%.6f", Double.box(fmt))

  // numeric query params parse inside the BadRequest wrapper — a
  // malformed k/exclude/nprobe/maxh is a client error (400), not a
  // 500 with an exception string (r12 advice; vec and dhash/ahash
  // already followed this pattern)
  private def intParam(ex: HttpExchange, name: String, dflt: Int): Int =
    queryParam(ex, name).map { v =>
      try v.toInt
      catch { case _: NumberFormatException =>
        throw new BadRequest(s"'$name' must be a 32-bit integer")
      }
    }.getOrElse(dflt)

  private def longParam(ex: HttpExchange, name: String, dflt: Long): Long =
    queryParam(ex, name).map { v =>
      try v.toLong
      catch { case _: NumberFormatException =>
        throw new BadRequest(s"'$name' must be a 64-bit integer")
      }
    }.getOrElse(dflt)

  private def handler(route: HttpExchange => (Int, String)): HttpHandler =
    (ex: HttpExchange) => {
      val (code, body) =
        try route(ex)
        catch {
          case bad: BadRequest =>
            (400, s"""{"error":"${jsonEsc(bad.getMessage)}"}""")
          case t: Throwable =>
            (500, s"""{"error":"${jsonEsc(t.toString.take(160))}"}""")
        }
      try respond(ex, code, body)
      catch { case _: java.io.IOException => ex.close() }
    }

  server.createContext("/search", handler { ex =>
    queryParam(ex, "q").map(_.trim).filter(_.nonEmpty) match {
      case None => (400, """{"error":"missing required query parameter 'q'"}""")
      case Some(q) =>
        val k = intParam(ex, "k", 5)
        val exclude = longParam(ex, "exclude", -1L)
        val terms = q.split(" ", -1).toSeq
          .map(graft.operators.NearDup.tokenHash64)
        val results = bm25.search(terms, k, exclude).map {
          case (rank, doc, score) =>
            s"""{"rank":$rank,"doc_id":$doc,"score":${num(score)}}"""
        }
        (200, results.mkString("""{"Results":[""", ",", "]}"))
    }
  })

  server.createContext("/ann", handler { ex =>
    queryParam(ex, "vec").map(_.trim).filter(_.nonEmpty) match {
      case None => (400, """{"error":"missing required query parameter 'vec'"}""")
      case Some(v) =>
        val vec =
          try v.split(",", -1).map(_.trim.toDouble)
          catch { case _: NumberFormatException =>
            throw new BadRequest("vec must be a comma-separated double list")
          }
        val k = intParam(ex, "k", 10)
        val nProbe = intParam(ex, "nprobe", 4)
        val results = ivf.search(vec, k, nProbe).map { case (id, sim) =>
          s"""{"vec_id":$id,"sim":${num(sim)}}"""
        }
        (200, results.mkString("""{"Results":[""", ",", "]}"))
    }
  })

  // GET /neardup?dhash=…&ahash=…[&maxh=3] — the admission check:
  // {"Results":[{"media_id":…,"hamming":…,"a_hamming":…},…]}; an
  // empty Results list means novel, admit. Only when a signature
  // tier is wired.
  if (sig != null) server.createContext("/neardup", handler { ex =>
    (queryParam(ex, "dhash"), queryParam(ex, "ahash")) match {
      case (Some(d), Some(a)) =>
        val (dh, ah) =
          try (d.toLong, a.toLong)
          catch { case _: NumberFormatException =>
            throw new BadRequest("dhash/ahash must be signed 64-bit longs")
          }
        val maxH = intParam(ex, "maxh", 3)
        val results = sig.probe(dh, ah, maxH).map { case (m, hd, ha) =>
          s"""{"media_id":$m,"hamming":$hd,"a_hamming":$ha}"""
        }
        (200, results.mkString("""{"Results":[""", ",", "]}"))
      case _ =>
        (400, """{"error":"missing required query parameters 'dhash','ahash'"}""")
    }
  })

  // GET /scrub?text=… — the online leg of the blocklist family
  // (q171's cover masking at request time): {"masked":…,
  // "n_masked":N,"n_spans":N}. 503 until a catalog is wired
  // (at construction or via reloadScrubCatalog) — answering
  // UNMASKED text from a scrub route would be the silent
  // compliance failure.
  server.createContext("/scrub", handler { ex =>
    val ac = scrubAc // one volatile read per request
    if (ac == null)
      (503, """{"error":"no scrub catalog wired"}""")
    else queryParam(ex, "text") match {
      case None =>
        (400, """{"error":"missing required query parameter 'text'"}""")
      case Some(t) =>
        val (m, nm, ns) = ac.maskCovered(t, '*')
        (200,
          s"""{"masked":"${jsonEsc(m)}","n_masked":$nm,"n_spans":$ns}""")
    }
  })

  server.createContext("/stats", handler { _ =>
    val (bh, bm) = bm25.stats
    val (ih, im) = ivf.stats
    val sigPart =
      if (sig == null) ""
      else {
        val (sh, sm) = sig.stats
        s""","sig":{"hits":$sh,"misses":$sm}"""
      }
    (200, s"""{"bm25":{"hits":$bh,"misses":$bm},""" +
      s""""ann":{"hits":$ih,"misses":$im}$sigPart}""")
  })

  server.setExecutor(pool)

  def start(): Int = {
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = {
    server.stop(0)
    pool.shutdownNow(): Unit
  }
}
