package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Pin

/** Physical-layout controls for 100 TB: bucketed tables (co-located,
  * shuffle-free joins) and key salting (skew spreading). These are the
  * knobs SCALE.md's claims rest on; each has a plan-level spec
  * (LayoutSpec) proving the exchange disappears / the skew spreads.
  */
object Layout {

  /** Write `df` as a bucketed managed table. Joins between tables
    * bucketed the same way on the join key plan with zero Exchange on
    * either side (asserted in LayoutSpec). This is how the offline
    * store and the online view co-locate with event streams at scale:
    * bucket both by the entity key once at write time, join forever
    * without shuffling.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Key-bucket column for the partitioned-merge layout:
    * `pmod(xxhash64(key), nBuckets)`.
    */
  def keyBucket(keyCol: String, nBuckets: Int): Column =
    pmod(xxhash64(col(keyCol)), lit(nBuckets.toLong)).cast("int")

  /** Incremental newest-wins merge into a key-bucket-PARTITIONED
    * parquet table (`dir/kb=N/…`): the O(batch) upsert path at scale.
    * A full-table rewrite per micro-batch costs O(#keys) no matter how
    * small the batch; here the batch's keys hash to ≤ nBuckets
    * partition dirs, only those partitions are read (partition-pruned
    * scan), merged (newest `orderCols` per key wins), and rewritten
    * via DYNAMIC partition overwrite — untouched buckets' files are
    * never opened or replaced.
    *
    * The touched current buckets are pinned with `Pin.snapshot`
    * before the write: it materializes exactly the data the merge
    * must hold before overwriting, and cuts the file-source lineage
    * so the plan never reads the dir it is replacing.
    *
    * Consistency: dynamic partition overwrite commits per-partition
    * (not atomic across buckets). Single writer, and a crashed merge
    * is repaired by replaying the batch — the merge is idempotent
    * (newest-wins dedup), the usual at-least-once contract.
    */
  /** True iff `dir` holds ≥ 1 committed `kb=` partition — a bare
    * existence probe would treat a crashed first merge's leftover
    * `_temporary` dir as a table and wedge the replay-repair path on
    * an unreadable (schema-less) directory.
    */
  def hasCommittedBuckets(spark: SparkSession, dir: String): Boolean = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(root) &&
      fs.listStatus(root).exists(_.getPath.getName.startsWith("kb="))
  }

  def mergeBucketPartitioned(dir: String, batch: DataFrame,
      keyCol: String, orderCols: Seq[String], nBuckets: Int): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    // pin the stamped batch once: the emptiness probe, the
    // touched-bucket collect, and the final write otherwise each
    // re-execute the batch plan — three full offline scans when the
    // bootstrap batch is itself a windowed history dedup
    val b = batch.withColumn("kb", keyBucket(keyCol, nBuckets))
      .transform(Pin.snapshot)
    if (b.isEmpty) return // no touched buckets — a write would leave
                          // an empty (schema-less) partition root
    val all =
      if (!hasCommittedBuckets(spark, dir)) b
      else {
        val touched = b.select($"kb").distinct().as[Int].collect().toSeq
        // mergeSchema: earlier add-column batches may have rewritten
        // only SOME buckets — footer-sampled inference without it
        // could resurface the old schema and drop the widened column
        val cur = spark.read.option("mergeSchema", "true").parquet(dir)
          .filter($"kb".isin(touched: _*))
          .transform(Pin.snapshot)
        // widen in BOTH directions: a batch with a new feature column
        // must reach the serving files (projecting it away would
        // silently diverge serving from the offline history forever),
        // and a batch missing a column must not throw — its rows get
        // null for the column, exactly like the history table's
        // schema evolution
        cur.unionByName(b, allowMissingColumns = true)
      }
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col(_).desc): _*)
    all.withColumn("_rn", row_number().over(w))
      .filter($"_rn" === 1).drop("_rn")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("kb")
      .parquet(dir)
  }

  /** Partition-pruned point lookup against a
    * [[mergeBucketPartitioned]] table: the filter pins `kb`, so the
    * scan lists exactly one bucket directory. The key literal is cast
    * to the STORED key column's type before hashing — xxhash64 hashes
    * an Int and a Long to different values, so an uncast
    * `getServingRecord(42)` against a Long-keyed table would pin the
    * wrong bucket and silently return nothing.
    */
  def bucketLookup(spark: SparkSession, dir: String, keyCol: String,
      keyValue: Column, nBuckets: Int): DataFrame = {
    // mergeSchema: bucket dirs can disagree after an add-column merge
    // rewrote only some of them (see mergeBucketPartitioned)
    val table = spark.read.option("mergeSchema", "true").parquet(dir)
    val k = keyValue.cast(table.schema(keyCol).dataType)
    table.filter(col("kb") === pmod(xxhash64(k), lit(nBuckets.toLong))
      .cast("int") && col(keyCol) === k)
  }

  /** Salted aggregation for skewed keys: two-phase group-by. Phase 1
    * groups on (key, salt) — the hot key's rows spread over
    * `saltBuckets` reducers; phase 2 merges the partials. Correct for
    * algebraic aggregates (sum/count here; min/max/avg derivable).
    */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
      saltBuckets: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
      .groupBy(col(keyCol), $"_salt")
      .agg(sum(col(valueCol)).as("_s"), count(lit(1)).as("_c"))
      .groupBy(col(keyCol))
      .agg(sum($"_s").as("total"), sum($"_c").as("n"))
  }

  /** Salted broadcast-replicated join for a skewed fact side: the dim
    * side is exploded `saltBuckets`× with a salt column, the fact side
    * gets a random-ish but deterministic salt, and the join key
    * becomes (key, salt) — a single hot key's rows land on
    * `saltBuckets` different reducers instead of one. Use when the
    * dim side is too big to broadcast outright but the fact key
    * distribution is pathological.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    import fact.sparkSession.implicits._
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("_salt", $"_salt".cast("long"))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
