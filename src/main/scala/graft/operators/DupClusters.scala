package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Pin, Tables}

/** Near-duplicate CLUSTER assignment — the step after pair detection
  * in a training-data dedup pipeline: near-dup pairs form a graph,
  * each connected component is one duplicate cluster, and the keeper
  * per cluster is the canonical representative (min doc_id). The
  * reference has no graph ops at all; at corpus scale this is the
  * standard "dedup by transitive closure" shape (a ∼ b ∼ c collapses
  * to one survivor even when a ≁ c directly).
  *
  * Components via iterative min-label propagation over DataFrames:
  * every vertex starts labeled with its own id; each round joins
  * labels across edges and takes the per-vertex min; fixpoint when no
  * label shrinks. Rounds = graph diameter — near-dup clusters are
  * shallow (pairs share text, so clusters are dense and tiny), which
  * makes plain propagation the right cost at 100 TB: each round is
  * one equi-join + one partial-agg min, all shuffle-on-key, no
  * driver-side graph. (For adversarially long path graphs the
  * large-star/small-star scheme [Kiveris et al., "Connected
  * Components in MapReduce and Beyond"] halves diameter per round;
  * not needed for dedup-shaped graphs, documented as the escalation
  * path.)
  */
object DupClusters {

  /** (id, cluster_id) for every vertex of `edges`; cluster_id = min
    * vertex id reachable. `edges` is undirected (any orientation).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    import edges.sparkSession.implicits._
    // pin the INPUT once before the symmetric union: both union
    // branches reference the edge subtree, and near-dup pair chains
    // (shingle joins, banded media hashes) are the expensive part —
    // unpinned, the whole upstream chain evaluated TWICE inside the
    // sym job (measured r13: q41 29.4 → 16.5 task-secs, q125
    // 4.6 → 2.9, q156 35.6 → 26.5 from this pin alone)
    val e = Pin.reuse(edges.toDF("src", "dst"))
    // symmetric closure once; propagation then only needs src→dst.
    // Pin.iterative on every iteration state: an
    // iterative DataFrame algorithm otherwise accretes each round's
    // joins into one exponentially-growing logical plan — lineage
    // must be CUT, not just cached.
    // LAZY pins throughout the loop: `Pin.iterative(_, eager = false)`
    // still cuts lineage when it resolves to a checkpoint (and a lazy
    // persist never grows the plan — the cached subtree is swapped for
    // InMemoryRelation at planning) while deferring materialization to
    // the first action — the convergence probe — so each round is ONE
    // Spark job (materialize + sum) instead of two. Tiny dedup graphs are
    // fixed-overhead-bound, so job count is the cost driver; at
    // corpus scale the fused job also saves one full pass per round.
    val sym = e.union(e.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
      .transform(Pin.reuse)
    // seed labels with the 1-hop closed-neighborhood min — exactly
    // what round 1 of propagation would compute from identity labels,
    // for the price of the agg alone (no join): one round saved
    var labels = sym.groupBy($"src")
      .agg(min(least($"dst", $"src")).as("label"))
      .withColumnRenamed("src", "id")
      .transform(Pin.iterative(_, eager = false))
    // convergence probe: labels only ever DECREASE under min-label
    // propagation, so sum(label) is strictly monotone until fixpoint —
    // one agg per round instead of a join-and-compare
    // decimal accumulator: a Long sum could wrap at corpus scale and
    // (astronomically unlikely, but) fake a fixpoint
    def labelSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.agg(sum($"label".cast("decimal(38,0)"))).head()
        .getDecimal(0)
    // one job: materializes sym + the seed checkpoint AND probes
    var prevSum = labelSum(labels)
    // the edge-input pin has served its purpose once sym is
    // materialized (released AFTER the first action so a lazy
    // cluster-mode persist still dedups the union's two branches)
    Pin.release(e)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = labels
        .join(
          sym.join(labels.select($"id".as("dst"), $"label".as("nl")), "dst")
            .groupBy($"src").agg(min($"nl").as("nl"))
            .withColumnRenamed("src", "id"),
          Seq("id"), "left")
        .select($"id", least($"label", coalesce($"nl", $"label")).as("label"))
        .transform(Pin.iterative(_, eager = false))
      val nextSum = labelSum(next)
      // drop the previous round's pinned blocks — Pin.release reaches
      // the checkpoint-rooted RDD where a bare Dataset.unpersist is a
      // cache-manager-only no-op
      Pin.release(labels)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    Pin.release(sym)
    // an unconverged result is silently WRONG (split clusters, several
    // keepers per real component) — fail loudly instead of returning it
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "graph diameter exceeds the propagation budget; raise maxIter " +
          "or use a diameter-halving scheme (large-star/small-star)")
    // the result stays backed by the final round's checkpoint blocks
    // (|vertices-in-pairs| label rows); callers done with it may
    // `.unpersist()` to release them
    labels.select($"id", $"label".as("cluster_id"))
  }

  /** [[connectedComponents]] for vertices of ANY ordered type
    * (strings — domains, URLs — as well as numerics): the same
    * min-label propagation, but the convergence probe counts CHANGED
    * labels this round (`sum(chg)`, one agg on the already-pinned
    * frame — identical per-round cost) instead of summing the labels
    * themselves, which only works when labels are numeric. The
    * fixpoint label is the component's MINIMUM vertex key, so for
    * string graphs the label doubles as the component's canonical
    * representative with no second election pass.
    */
  def connectedComponentsOrdered(edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    import edges.sparkSession.implicits._
    // input pinned once — see connectedComponents: an unpinned edge
    // chain evaluates once per union branch
    val e = Pin.reuse(edges.toDF("src", "dst"))
    val sym = e.union(e.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
      .transform(Pin.reuse)
    var labels = sym.groupBy($"src")
      .agg(min(least($"dst", $"src")).as("label"))
      .withColumnRenamed("src", "id")
      .transform(Pin.iterative(_, eager = false))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // chg marks vertices whose label shrank this round; the probe
      // is one agg over the pinned frame (materialize + count fused
      // into one job, the lazy-pin idiom of connectedComponents)
      val next = labels
        .join(
          sym.join(labels.select($"id".as("dst"), $"label".as("nl")), "dst")
            .groupBy($"src").agg(min($"nl").as("nl"))
            .withColumnRenamed("src", "id"),
          Seq("id"), "left")
        .select($"id", least($"label", coalesce($"nl", $"label")).as("label"),
          (coalesce($"nl", $"label") < $"label").cast("long").as("chg"))
        .transform(Pin.iterative(_, eager = false))
      val changed = next.agg(coalesce(sum($"chg"), lit(0L))).head().getLong(0)
      if (iter == 0) Pin.release(e) // sym materialized by round 1's probe
      Pin.release(labels)
      labels = next
      converged = changed == 0L
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsOrdered did not converge in $maxIter rounds — " +
          "graph diameter exceeds the propagation budget; raise maxIter " +
          "or use a diameter-halving scheme (large-star/small-star)")
    labels.select($"id", $"label".as("cluster_id"))
  }

  /** Components via alternating large-star/small-star rounds
    * [Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14] — the diameter-halving escalation for graphs
    * where plain min-label propagation's round count (= diameter)
    * is the bottleneck: long chains, adversarial paths. Converges in
    * O(log n) rounds regardless of diameter.
    *
    * Each round is two (join + partial-agg min) passes over the
    * edge set — same shuffle-on-key shape as one propagation round,
    * so the trade is 2× per-round cost for exponentially fewer
    * rounds. Dedup-shaped graphs (dense, shallow clusters) converge
    * in 2-3 propagation rounds and don't need this; q41 keeps
    * [[connectedComponents]] and this is the documented switch for
    * chain-shaped graphs (e.g. temporal session stitching).
    *
    * Large-star: every node's strictly-larger neighbors re-attach to
    * the min of its closed neighborhood. Small-star: orient edges to
    * the smaller endpoint; every node's smaller neighbors (and the
    * node) attach to the minimum one. Both preserve connectivity
    * exactly; fixpoint = star forests, one star per component rooted
    * at its min id.
    */
  def connectedComponentsStar(edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    import edges.sparkSession.implicits._
    val spark = edges.sparkSession
    // input pinned once: verts references the edge subtree twice and
    // the initial contraction set a third time
    val e0 = Pin.reuse(edges.toDF("src", "dst"))
    val verts = e0.select($"src".as("id"))
      .union(e0.select($"dst".as("id"))).distinct()
      .transform(Pin.reuse)

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select($"dst".as("src"), $"src".as("dst")))
      val mins = sym.groupBy($"src")
        .agg(min(least($"dst", $"src")).as("m"))
      sym.join(mins, "src").filter($"dst" > $"src")
        .select($"dst".as("src"), $"m".as("dst")).distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val or = e.filter($"src" =!= $"dst")
        .select(greatest($"src", $"dst").as("src"),
          least($"src", $"dst").as("dst"))
      val mins = or.groupBy($"src").agg(min($"dst").as("m"))
      or.join(mins, "src")
        .select($"dst".as("src"), $"m".as("dst"))
        .union(mins.select($"src", $"m".as("dst")))
        .filter($"src" =!= $"dst").distinct()
    }

    var e = e0
      .filter($"src" =!= $"dst").distinct()
      .transform(Pin.iterative(_, eager = false))
    var converged = e.isEmpty // materializes the lazy pin
    Pin.release(e0)
    var iter = 0
    while (!converged && iter < maxIter) {
      // lazy pin + ONE fused probe job per round (the propagation
      // loops' idiom): the union-of-bag-differences is empty iff the
      // edge multisets are identical, and its isEmpty both
      // materializes `next`'s checkpoint and answers convergence —
      // the r12 shape ran 3 jobs/round (eager pin + 2 exceptAll
      // probes), and rounds-serialized job count IS the wall cost on
      // shallow graphs (the q125 lesson)
      val next = smallStar(largeStar(e))
        .transform(Pin.iterative(_, eager = false))
      converged = next.exceptAll(e).union(e.exceptAll(next)).isEmpty
      Pin.release(e)
      e = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds")
    // fixpoint edges are (member → root); roots have no outgoing edge
    verts.join(e.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select($"id", coalesce($"dst", $"id").as("cluster_id"))
  }

  /** Q41 — oracle-checked duplicate-cluster assignment over the
    * `documents` near-dup graph at τ = 0.5 (the q18 pair set):
    * (doc_id, cluster_id, is_keeper). DuckDB recomputes components
    * with a recursive transitive-closure CTE — feasible because
    * clusters are tiny; Spark never materializes the closure.
    */
  def q41DupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = NearDup.jaccardPairs(Tables.load(spark, dir, "documents"), 0.5)
      .select($"doc_a", $"doc_b")
    connectedComponents(pairs)
      .select($"id".as("doc_id"), $"cluster_id",
        ($"id" === $"cluster_id").as("is_keeper"))
      .orderBy($"doc_id")
  }

  /** Near-dup graph degree profile — the hub report that decides
    * which documents are template/boilerplate sources (high degree =
    * one text near-duplicated across many others): per-endpoint
    * degree and strongest similarity over the τ-thresholded pair
    * set. Pairs are pinned once (they feed both endpoint
    * projections); degrees are one union + one agg over |pairs|·2
    * rows — graph-sized, never corpus-sized.
    */
  def degreeProfile(pairs: DataFrame): DataFrame = {
    import pairs.sparkSession.implicits._
    val p = pairs.transform(Pin.reuse)
    val ends = p.select($"doc_a".as("doc_id"), $"jac")
      .unionByName(p.select($"doc_b".as("doc_id"), $"jac"))
    ends.groupBy($"doc_id")
      .agg(count(lit(1)).as("degree"), round(max($"jac"), 6).as("max_jac"))
  }

  /** Q86 — degree profile of the τ=0.5 near-dup graph. */
  def q86DupDegrees(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    degreeProfile(
        NearDup.jaccardPairs(Tables.load(spark, dir, "documents"), 0.5))
      .orderBy($"doc_id")
  }
}
