package graft.core

import org.apache.spark.sql.DataFrame

/** Input fan-out for compute-heavy operators.
  *
  * A small single-file parquet scan plans as ONE input partition, so a
  * per-row-expensive stage downstream (shingling, minhash signatures,
  * simhash, embedding kernels) runs on one core no matter how many the
  * session has — at sf0.1 this pinned the whole dedup family to a
  * single thread. At warehouse scale inputs arrive as many splits and
  * fan-out is a no-op, so the round-trip shuffle is only ever paid on
  * inputs small enough for it to be cheap.
  */
object Parallel {

  /** Repartition `df` up to the session's default parallelism iff the
    * planned scan has fewer partitions. Costs one small shuffle when it
    * fires; never reduces partitioning.
    */
  def fan(df: DataFrame): DataFrame = {
    // A streaming plan has no static partitioning to inspect (`.rdd`
    // would throw); micro-batch inputs arrive pre-split by the source.
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
