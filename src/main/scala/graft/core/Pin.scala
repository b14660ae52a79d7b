package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Materialization-pin strategy for intermediate results that feed
  * multiple consumers or iterative loops.
  *
  * Why this exists: through round 9 every hot-path pin was an eager
  * `localCheckpoint(true)`. That truncates lineage and stores the
  * blocks NON-reliably on executors — perfect in `local[*]` (one JVM,
  * nothing to lose), but on a 1000-executor cluster losing a single
  * executor mid-job makes the pinned partitions unrecoverable and
  * fails the whole job. At 100 TB an executor loss is routine, not a
  * corner case, so the default pin must be one the scheduler can
  * recover from. The fix is intent-driven:
  *
  *   - [[reuse]] — the pin only exists to avoid recomputing a shared
  *     subtree (postings, hash sets, filtered indexes). Lineage is
  *     still VALID, so the fault-tolerant form is a lineage-preserving
  *     `persist(MEMORY_AND_DISK)`: a lost block recomputes from its
  *     (immutable) source instead of failing the job. Lazy — the
  *     first consumer materializes the cache, so no extra job.
  *   - [[iterative]] — loop state whose lineage GROWS each round
  *     (label propagation, star contraction). Lineage must be CUT or
  *     the logical plan accretes exponentially; a recoverable cut
  *     needs a reliable checkpoint (HDFS-class storage). When the
  *     session has a checkpoint dir the pin is `Dataset.checkpoint`;
  *     otherwise it falls back to `localCheckpoint` — the only
  *     remaining non-recoverable pin, and only where no checkpoint
  *     dir was configured (i.e. local mode).
  *   - [[snapshot]] — the rows must be captured BEFORE their source
  *     is mutated (read-merge-overwrite layouts, bus files subject to
  *     vacuum). Lineage preservation is actively WRONG here: a
  *     recompute would re-read the mutated source. Reliable
  *     checkpoint when a dir is set, eager `localCheckpoint`
  *     otherwise.
  *
  * `auto` (the default) resolves by deployment: under a LOCAL master
  * there is no executor to lose — the whole point of lineage
  * preservation is moot in one JVM — and `localCheckpoint` stores
  * raw row blocks where `persist` pays the InMemoryRelation columnar
  * encode + per-consumer decode (measured 2–4× task time on the
  * postings/iterative pins at sf0.1), so local mode keeps
  * `localCheckpoint`. Under a CLUSTER master, [[reuse]] pins become
  * the lineage-preserving persist and [[iterative]]/[[snapshot]]
  * pins prefer a reliable checkpoint — recoverability is worth the
  * columnar cache cost when an executor loss would otherwise fail a
  * multi-hour job.
  *
  * The session conf `spark.graft.pin` (`auto` | `persist` |
  * `localCheckpoint` | `checkpoint`) force-overrides the strategy for
  * benchmarking / migration, except that [[snapshot]] never honors
  * `persist` (it would break the read-before-overwrite contract) and
  * the reliable-checkpoint path is always persist-backed + eager (a
  * bare `rdd.checkpoint()` recomputes the RDD in the checkpoint-write
  * job — Spark's own docs recommend persisting first).
  *
  * Cluster deployment note (SCALE.md "Pinning strategy"): set
  * `spark.sparkContext.setCheckpointDir` to an HDFS/S3 path and every
  * iterative/snapshot pin becomes executor-loss-proof; reuse pins
  * already are, via lineage.
  */
object Pin {

  /** Conf key selecting the pin implementation; default `auto`. */
  val ModeKey = "spark.graft.pin"

  private def mode(ds: Dataset[_]): String =
    ds.sparkSession.conf.get(ModeKey, "auto")

  private def hasCheckpointDir(ds: Dataset[_]): Boolean =
    ds.sparkSession.sparkContext.getCheckpointDir.isDefined

  /** Reliable checkpoint with the persist-first idiom: without it the
    * checkpoint-write job recomputes the dataset from scratch (the
    * write runs as its own job after the materializing action). Eager
    * regardless of the caller's preference — a lazy reliable
    * checkpoint pays the double-compute the persist exists to avoid.
    */
  private def reliable[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.persist(StorageLevel.MEMORY_AND_DISK)
    val c = p.checkpoint(true)
    p.unpersist(blocking = false)
    c
  }

  private def isLocal(ds: Dataset[_]): Boolean =
    ds.sparkSession.sparkContext.isLocal

  /** Pin a subtree consumed by ≥ 2 downstream branches. On a cluster
    * (`auto`): lazy, lineage-preserving persist — a lost cached block
    * recomputes from the immutable source, the executor-loss-safe
    * form. Locally: eager `localCheckpoint` (nothing to lose, raw
    * row blocks beat the columnar cache 2–4× on task time).
    */
  def reuse[T](ds: Dataset[T]): Dataset[T] = mode(ds) match {
    case "localCheckpoint"       => ds.localCheckpoint(true)
    // forced checkpoint mode degrades like iterative/snapshot do when
    // no checkpoint dir is configured — Dataset.checkpoint would throw
    // at runtime, and a forced MODE must not turn a valid pipeline
    // into a crash on a session-config detail
    case "checkpoint"            =>
      if (hasCheckpointDir(ds)) reliable(ds) else ds.localCheckpoint(true)
    case "persist"               => ds.persist(StorageLevel.MEMORY_AND_DISK)
    case _ if isLocal(ds)        => ds.localCheckpoint(true)
    case _                       => ds.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Pin loop state: lineage must be cut every round. Recoverable
    * (reliable checkpoint) when the session has a checkpoint dir;
    * `localCheckpoint(eager)` otherwise. `eager = false` keeps the
    * lazy one-job-per-round shape of the propagation loops.
    */
  def iterative[T](ds: Dataset[T], eager: Boolean = true): Dataset[T] =
    mode(ds) match {
      case "persist"         => ds.persist(StorageLevel.MEMORY_AND_DISK)
      case "localCheckpoint" => ds.localCheckpoint(eager)
      case _ =>
        if (hasCheckpointDir(ds)) reliable(ds) else ds.localCheckpoint(eager)
    }

  /** Pin rows that must survive mutation of their own source. Always
    * truncates lineage and always eager — `persist` mode is ignored
    * here because a lineage recompute would re-read the mutated
    * source and silently corrupt the result.
    */
  def snapshot[T](ds: Dataset[T]): Dataset[T] =
    if (hasCheckpointDir(ds) && mode(ds) != "localCheckpoint") reliable(ds)
    else ds.localCheckpoint(true)

  /** Release a pinned dataset's storage once no consumer remains —
    * the loop-state cleanup for [[iterative]] pins (each round pins a
    * new frame; without release, `localCheckpoint` blocks accumulate
    * O(rounds) of executor storage).
    *
    * `Dataset.unpersist` only talks to the cache manager, so it
    * covers persist-backed pins but is a silent no-op on a
    * checkpoint-rooted frame (the blocks live on the RDD, not in the
    * plan cache) — this helper additionally unpersists the underlying
    * `LogicalRDD`'s RDD, which is exactly the block set
    * `localCheckpoint` pinned. RELIABLE checkpoint FILES are not
    * deleted here (there is no public API); enable
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (set by
    * `Sessions.local`) so the ContextCleaner removes them when the
    * RDD is garbage-collected.
    *
    * Safe on never-pinned datasets (both paths no-op). UNSAFE on a
    * frame that still has consumers: a released `localCheckpoint` has
    * no lineage left to recompute from.
    */
  def release(ds: Dataset[_]): Unit = {
    ds.unpersist(blocking = false)
    ds.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
