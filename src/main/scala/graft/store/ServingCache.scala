package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}

/** ElastiCache-shaped keyed serving tier, Spark-native (the
  * reference's scaling plan puts ElastiCache in front of the online
  * store for sub-ms lookups, `Scaling and monitoring strategies.md:
  * 19-21`). The Spark-native answer keeps the BUCKET as the cache
  * unit: the serving layout is already hash-partitioned into `kb=`
  * dirs (`Layout.mergeBucketPartitioned`), so a point lookup needs
  * exactly one bucket — this tier memoizes whole buckets in a
  * bounded driver-side LRU and serves repeated lookups from memory
  * with NO Spark job at all.
  *
  * Read-through consistency: each get checks the bucket dir's file
  * signature (names + lengths + mtimes — one filesystem LIST, no data
  * read) and reloads the bucket iff a serving merge rewrote it since
  * caching. That gives read-your-merges semantics without TTL
  * guesswork; `invalidate()` drops everything for the blunt version.
  *
  * Capacity: memory = maxCachedBuckets × bucket size. At 100 TB the
  * knob pairs with `nBuckets` — more buckets ⇒ smaller cache units ⇒
  * a hot-set cache that holds the hot KEYS' buckets, exactly how a
  * production keyed cache shards. The LRU keeps the hot buckets
  * resident and evicts cold ones on access order.
  */
final class ServingCache(spark: SparkSession, servingDir: String,
    keyCol: String, nBuckets: Int = 64, maxCachedBuckets: Int = 16,
    dropCols: Seq[String] = Nil) {
  require(nBuckets > 0 && maxCachedBuckets > 0,
    "nBuckets and maxCachedBuckets must be positive")

  private final case class CachedBucket(sig: String, rows: Map[String, Row])

  private val lru = new java.util.LinkedHashMap[Int, CachedBucket](
      16, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[Int, CachedBucket]): Boolean =
      size() > maxCachedBuckets
  }
  private var hitsN = 0L
  private var missesN = 0L

  /** (hits, misses) — a miss is any get that (re)loaded its bucket. */
  def stats: (Long, Long) = synchronized((hitsN, missesN))

  def invalidate(): Unit = synchronized(lru.clear())

  private def fs =
    new Path(servingDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private lazy val keyType: DataType =
    spark.read.parquet(servingDir).schema(keyCol).dataType

  /** Normalize the caller's id to the STORED key type so the hash
    * matches `Layout.keyBucket`'s `xxhash64(cast(key))` exactly.
    */
  private def norm(id: Any): Any = keyType match {
    case LongType    => id.toString.toLong
    case IntegerType => id.toString.toInt
    case StringType  => id.toString
    case _           => id
  }

  /** The bucket `Layout.keyBucket` assigns this key — computed by
    * evaluating the SAME Catalyst expression (`pmod(xxhash64(key),
    * n)`) driver-side, so no 1-row Spark job per lookup.
    */
  def bucketOf(id: Any): Int = {
    val h = new XxHash64(Seq(Literal.create(norm(id), keyType)))
      .eval(null).asInstanceOf[Long]
    (((h % nBuckets) + nBuckets) % nBuckets).toInt
  }

  /** Change signature of one bucket dir: one filesystem LIST, no data
    * read. "absent" for a bucket no merge has written yet.
    */
  private def signature(b: Int): String = {
    val dir = new Path(s"$servingDir/kb=$b")
    if (!fs.exists(dir)) "absent"
    else fs.listStatus(dir).map(st =>
        s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("|")
  }

  /** Point lookup. Cache hit: zero Spark jobs, one LIST. Miss: one
    * single-bucket parquet read (the same pruned scan
    * `FeatureStore.getServingRecord` plans), memoized for next time.
    */
  def get(id: Any): Option[Row] = synchronized {
    // a layout no merge has written yet has no keys (and no schema to
    // normalize against) — None, not a PATH_NOT_FOUND from the driver
    if (!fs.exists(new Path(servingDir))) return None
    val b = bucketOf(id)
    val sig = signature(b)
    val cached = Option(lru.get(b)).filter(_.sig == sig)
    val bucket = cached.getOrElse {
      missesN += 1
      val rows: Map[String, Row] =
        if (sig == "absent") Map.empty
        else spark.read.parquet(s"$servingDir/kb=$b").drop(dropCols: _*)
          .collect().map(r => r.getAs[Any](keyCol).toString -> r).toMap
      val cb = CachedBucket(sig, rows)
      lru.put(b, cb)
      cb
    }
    if (cached.isDefined) hitsN += 1
    bucket.rows.get(norm(id).toString)
  }
}
