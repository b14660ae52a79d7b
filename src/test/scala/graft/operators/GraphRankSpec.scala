package graft.operators

import graft.SparkSpec

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  /** Scala reference implementation of the exact-tick recurrence —
    * plain Maps, no Spark — the independent oracle for the
    * distributed version. Floor division on non-negative longs.
    */
  private def referenceRanks(pairs: Seq[(Long, Long)],
      iters: Int): Map[Long, (Long, Long)] = {
    val e = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = e.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    var r = deg.map { case (v, _) => v -> 1000000L }
    for (_ <- 1 to iters) {
      val c = r.map { case (v, rv) => v -> rv / deg(v) }
      val s = e.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => c(u) }.sum
      }
      r = s.map { case (v, sv) => v -> (150000L + (sv * 17) / 20) }
    }
    r.map { case (v, rv) => v -> (deg(v), rv) }
  }

  private def run(pairs: Seq[(Long, Long)], iters: Int) =
    GraphRank.pageRankTicks(pairs.toDF("doc_a", "doc_b"), iters)
      .as[(Long, Long, Long)].collect()
      .map { case (v, d, r) => v -> (d, r) }.toMap

  test("path graph: hand-traced two iterations") {
    // 1-2-3: deg 1/2/1; iter1 ranks 575000/1850000/575000 (traced in
    // the operator's scaladoc terms), iter2 936250/1127500/936250
    val got = run(Seq((1L, 2L), (2L, 3L)), iters = 2)
    assert(got === Map(
      1L -> (1L, 936250L), 2L -> (2L, 1127500L), 3L -> (1L, 936250L)))
  }

  test("triangle is symmetric and conserves the uniform start") {
    // every vertex identical by symmetry; deg 2, r stays at the
    // fixpoint of r = 150000 + (2*(r div 2)*17) div 20 from 1e6
    val got = run(Seq((1L, 2L), (2L, 3L), (1L, 3L)), iters = 5)
    assert(got.values.map(_._1).toSet === Set(2L))
    assert(got.values.map(_._2).toSet.size === 1)
  }

  test("seeded random graph matches the plain-Scala reference exactly") {
    val rnd = new scala.util.Random(4242)
    val pairs = (1 to 120).map { _ =>
      val a = rnd.nextInt(30).toLong
      var b = rnd.nextInt(30).toLong
      while (b == a) b = rnd.nextInt(30).toLong
      (math.min(a, b), math.max(a, b))
    }.distinct
    for (iters <- Seq(1, 3, 5))
      assert(run(pairs, iters) === referenceRanks(pairs, iters),
        s"divergence at iters=$iters")
  }

  test("disconnected components rank independently") {
    val pairs = Seq((1L, 2L), (10L, 11L), (11L, 12L))
    assert(run(pairs, 4) === referenceRanks(pairs, 4))
  }

  test("empty edge set yields an empty ranking (schema intact)") {
    val df = GraphRank.pageRankTicks(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"), 5)
    assert(df.columns.toSeq === Seq("doc_id", "degree", "rank_ticks"))
    assert(df.count() === 0L)
  }

  test("q110 on sf0.001 runs and ranks hub docs above leaves") {
    val rows = GraphRank.q110PageRank(spark, sf)
      .as[(Long, Long, Long)].collect()
    // rank order must be consistent with the output's declared sort
    assert(rows.sortBy(t => (-t._3, t._1)).toSeq === rows.toSeq)
    // all ranks at/above the teleport floor of a degree-1 leaf
    assert(rows.forall(_._3 >= 150000L))
  }

  /** Plain-Scala reference for the WEIGHTED recurrence: the degree
    * split becomes a weight split, same floor-division Long dag.
    */
  private def referenceWeighted(edges: Seq[(Long, Long, Long)],
      iters: Int): Map[Long, (Long, Long)] = {
    val e = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
      .filter(t => t._1 != t._2)
      .groupBy(t => (t._1, t._2))
      .map { case ((s, d), es) => (s, d, es.map(_._3).max) }.toSeq
    val ws = e.groupBy(_._1).map { case (v, es) => v -> es.map(_._3).sum }
    var r = ws.map { case (v, _) => v -> 1000000L }
    for (_ <- 1 to iters) {
      val s = e.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _, w) => (r(u) * w) / ws(u) }.sum
      }
      r = s.map { case (v, sv) => v -> (150000L + (sv * 17) / 20) }
    }
    r.map { case (v, rv) => v -> (ws(v), rv) }
  }

  private def runWeighted(edges: Seq[(Long, Long, Long)], iters: Int,
      tolTicks: Long = -1L) =
    GraphRank.pageRankTicksWeighted(
        edges.toDF("doc_a", "doc_b", "wt"), iters, tolTicks)
      .as[(Long, Long, Long)].collect()
      .map { case (v, w, r) => v -> (w, r) }.toMap

  test("weighted: seeded random weighted graph matches the reference") {
    val rnd = new scala.util.Random(1717)
    val edges = (1 to 140).map { _ =>
      val a = rnd.nextInt(25).toLong
      var b = rnd.nextInt(25).toLong
      while (b == a) b = rnd.nextInt(25).toLong
      (math.min(a, b), math.max(a, b), 50L + rnd.nextInt(950).toLong)
    }.distinct
    for (iters <- Seq(1, 3, 5))
      assert(runWeighted(edges, iters) === referenceWeighted(edges, iters),
        s"divergence at iters=$iters")
  }

  test("weighted: uniform weights reproduce the unweighted ranking") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val uw = run(pairs, 4)
    val w = runWeighted(pairs.map { case (a, b) => (a, b, 1000L) }, 4)
    // (r * w) div (d * w) = r div d when all weights are equal
    assert(w.map { case (v, (wt, r)) => v -> (wt / 1000L, r) } === uw)
  }

  test("weighted: duplicate/reoriented/self-loop edges are collapsed") {
    val clean = Seq((1L, 2L, 700L), (2L, 3L, 400L))
    val dirty = clean ++ Seq((2L, 1L, 700L), (1L, 2L, 700L), (3L, 3L, 999L))
    assert(runWeighted(dirty, 3) === runWeighted(clean, 3))
  }

  test("weighted: heavier neighbor pulls more rank") {
    // star 2-1-3 with edge (1,2) 5x the weight of (1,3): vertex 2
    // receives 5/6 of vertex 1's mass each round, so it must outrank 3
    val got = runWeighted(Seq((1L, 2L, 1000L), (1L, 3L, 200L)), 5)
    assert(got(2L)._2 > got(3L)._2)
  }

  /** Plain-Scala reference for the DIRECTED recurrence: endpoints are
    * the vertex set; a vertex with no in-links holds the teleport
    * floor; parallel edges sum their weights.
    */
  private def referenceDirected(edges: Seq[(Long, Long, Long)],
      iters: Int): Map[Long, (Long, Long)] = {
    val e = edges.filter(t => t._1 != t._2)
      .groupBy(t => (t._1, t._2))
      .map { case ((s, d), es) => (s, d, es.map(_._3).sum) }.toSeq
    val ws = e.groupBy(_._1).map { case (v, es) => v -> es.map(_._3).sum }
    val verts = (e.map(_._1) ++ e.map(_._2)).distinct
    var r = verts.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val s = e.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _, w) => (r(u) * w) / ws(u) }.sum
      }
      r = verts.map(v => v -> (150000L + (s.getOrElse(v, 0L) * 17) / 20)).toMap
    }
    r.map { case (v, rv) => v -> (ws.getOrElse(v, 0L), rv) }
  }

  private def runDirected(edges: Seq[(Long, Long, Long)], iters: Int) =
    GraphRank.pageRankTicksDirected(
        edges.toDF("src", "dst", "wt"), iters)
      .as[(Long, Long, Long)].collect()
      .map { case (v, w, r) => v -> (w, r) }.toMap

  test("directed: seeded random digraph matches the reference") {
    val rnd = new scala.util.Random(2929)
    val edges = (1 to 150).map { _ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong,
        1L + rnd.nextInt(3).toLong)
    }.filter(t => t._1 != t._2).distinct
    for (iters <- Seq(1, 3, 5))
      assert(runDirected(edges, iters) === referenceDirected(edges, iters),
        s"divergence at iters=$iters")
  }

  test("directed: in-link-less sources hold the teleport floor; sinks leak") {
    // 1 -> 2 -> 3: vertex 1 never receives, 3 never gives
    val got = runDirected(Seq((1L, 2L, 1L), (2L, 3L, 1L)), 4)
    assert(got(1L)._2 === 150000L + (0L * 17) / 20)
    assert(got(3L)._1 === 0L, "sink has no out-weight")
    assert(got(2L)._2 > got(1L)._2 && got(3L)._2 > got(1L)._2)
    assert(got === referenceDirected(Seq((1L, 2L, 1L), (2L, 3L, 1L)), 4))
  }

  test("directed: parallel edges sum weights; self-links drop") {
    val clean = Seq((1L, 2L, 3L), (1L, 3L, 1L))
    val dirty = Seq((1L, 2L, 1L), (1L, 2L, 2L), (1L, 3L, 1L), (2L, 2L, 9L))
    assert(runDirected(dirty, 3) === runDirected(clean, 3))
  }

  test("weighted: convergence probe stops only at the exact fixpoint") {
    // a triangle reaches its symmetric fixpoint quickly; tolTicks=0
    // must stop early with EXACTLY the fixed-count result
    val tri = Seq((1L, 2L, 600L), (2L, 3L, 600L), (1L, 3L, 600L))
    assert(runWeighted(tri, 50, tolTicks = 0L) === runWeighted(tri, 50))
    // and a probed run over a non-trivial graph matches the reference
    val edges = Seq((1L, 2L, 900L), (2L, 3L, 300L), (3L, 4L, 500L),
      (4L, 1L, 250L), (2L, 4L, 750L))
    assert(runWeighted(edges, 5, tolTicks = 0L) ===
      referenceWeighted(edges, 5))
  }
}
