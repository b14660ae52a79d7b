package graft

import org.apache.spark.sql.functions._

/** Scale-up fixture generator for the r17 scaling measurement
  * (VERDICT #8): replicates the driver's sf0.1 tables K× with
  * id-offset copies and writes them MULTI-FILE so scans can actually
  * parallelize (the driver's single-row-group files cap every scan
  * at one task — the measured local parallelism floor). Replica text
  * gets a per-replica prefix so replicas are distinguishable, but
  * NOTE: replicas of one doc stay near-identical, so pairwise
  * similarity queries (Jaccard graph family, SemDedup) explode
  * quadratically on this fixture BY CONSTRUCTION — the scaling run
  * covers the compute/store/Mondrian families only. Test-scoped
  * measurement tooling, never part of the bench contract.
  *
  * Run: `sbt "Test/runMain graft.ScaleUp /root/testdata/sf0.1
  * /tmp/sfbig 16"`.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sfbig")
    val k = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = core.Sessions.local(appName = "scale-up")
    val reps = explode(lit((0 until k).toArray)).as("_i")
    val off = col("_i") * lit(10000000L)

    def write(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.repartition(32).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      println(s"wrote $name x$k")
    }

    val docs = spark.read.parquet(s"$src/documents.parquet")
    write("documents")(docs.select(reps, col("*"))
      .withColumn("doc_id", col("doc_id") + off)
      .withColumn("text",
        concat(lit("r"), col("_i").cast("string"), lit(" "), col("text")))
      .drop("_i"))

    val cust = spark.read.parquet(s"$src/customer.parquet")
    write("customer")(cust.select(reps, col("*"))
      .withColumn("c_custkey", col("c_custkey") + off)
      .drop("_i"))

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    write("embeddings")(emb.select(reps, col("*"))
      .withColumn("vec_id", col("vec_id") + off)
      .drop("_i"))

    val ev = spark.read.parquet(s"$src/events.parquet")
    write("events")(ev.select(reps, col("*"))
      .withColumn("event_id", col("event_id") + off)
      .withColumn("user_id", col("user_id") + off)
      .drop("_i"))

    // untouched tables carry over verbatim (fast relational families)
    Seq("lineitem", "orders", "nation", "region", "part", "supplier")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
          .parquet(s"$out/$t.parquet")
        println(s"copied $t")
      }
    spark.stop()
  }
}
