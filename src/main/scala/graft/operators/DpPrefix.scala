package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** CONTINUAL-RELEASE DP COUNTS — the binary (logarithmic) mechanism
  * of Chan, Shi & Song (TISSEC'11) / Dwork, Naor, Pitassi & Rothblum
  * (STOC'10): release the RUNNING event count at every time tick,
  * ε-DP over the whole stream. The naive form is untenable — fresh
  * Laplace(1/ε) per prefix composes to ε·T spent, while reusing one
  * noisy count leaks every increment. The binary mechanism decomposes
  * each prefix [1, t] into the O(log T) dyadic segments of t's binary
  * representation and releases each DYADIC NODE once with its own
  * noise: an event lands in exactly `levels` nodes (one per level),
  * so the node vector has L1 sensitivity `levels`, per-node
  * Laplace(levels/ε) gives ε-DP for ALL prefixes together, and each
  * released prefix sums ≤ `levels` noisy nodes — O(log^1.5 T / ε)
  * error instead of O(T).
  *
  * Node/decomposition identity (1-based ticks): node (l, j) covers
  * ticks ((j−1)·2^l, j·2^l]; an event at tick e belongs to node
  * (l, ((e−1) >> l) + 1) at every level l; prefix [1, t] is exactly
  * the nodes (l, t >> l) over t's SET bits. Empty decomposition
  * nodes still carry noise (the mechanism releases every node, not
  * just occupied ones), so the noise term is computed on the
  * DECOMPOSITION side and the node table only supplies true counts
  * via a left join.
  *
  * Same deterministic noise seam as [[Privacy.dpCounts]] (fingerprint
  * + Knuth mix keyed by (level, node, seed), salt `:pfx`) — and the
  * same NOT-DP-until-production-swaps-the-CSPRNG caveat; the
  * mechanism (dyadic decomposition, sensitivity accounting, noise
  * calibration) is the engine deliverable.
  *
  * Scale shape: node build = one `levels`-way per-event fan-out into
  * a (level, node)-keyed partial-agg count (≤ 2·T node rows at any
  * data size); releases = the distinct-tick partial agg, a
  * popcount-sized fan-out, a join against the node table on (l, j)
  * (broadcast — the node table is tick-domain-sized, never
  * data-sized), and a per-tick partial-agg sum. No windows anywhere;
  * every stage is partial-agg'd and bounded by the TICK domain, not
  * the event count.
  */
object DpPrefix {

  /** Released running counts: (tick, released_n) for every distinct
    * occupied tick. `tickCol` must be a 1-based integer tick
    * (non-positive ticks are rejected); the tick domain must fit
    * `levels` (max tick < 2^levels — checked, loudly).
    */
  def dpPrefixCounts(events: DataFrame, tickCol: Column,
      levels: Int = 10, epsilonTicks: Long = 1000000L,
      seed: Long = 0L): DataFrame = {
    require(levels >= 1 && levels <= 62, "levels must be in [1, 62]")
    require(epsilonTicks > 0, "epsilon must be positive")
    val ev = events.select(tickCol.cast("long").as("_t"))
      .filter(col("_t").isNotNull)
    val Seq(lo, hi) = ev.agg(min(col("_t")), max(col("_t")))
      .collect()(0).toSeq.map(v => Option(v).fold(1L)(_.asInstanceOf[Long]))
    require(lo >= 1, s"ticks must be 1-based positive (saw $lo)")
    require(hi < (1L << levels),
      s"tick domain $hi does not fit $levels levels — raise `levels`" +
        " (each level adds one noisy node per event and widens the" +
        " per-node noise scale)")
    releases(nodeCounts(ev, col("_t"), levels), levels,
      epsilonTicks, seed)
  }

  /** The (level, node) true-count table — one `levels`-way fan-out
    * into a partial-agg count, ≤ 2·T rows at any data size. Works on
    * a STREAMING frame unchanged (a standard incremental aggregation
    * in Update mode — the node counts are mergeable, so the stream
    * maintains them without custom state; state is tick-DOMAIN-sized,
    * never data-sized). [[releases]] over the maintained table is
    * then the batch release verbatim — batch ≡ stream by
    * construction, spec'd across micro-batch splits.
    */
  def nodeCounts(events: DataFrame, tickCol: Column,
      levels: Int): DataFrame = {
    require(levels >= 1 && levels <= 62, "levels must be in [1, 62]")
    events.select(tickCol.cast("long").as("_t"))
      .filter(col("_t").isNotNull)
      .select(explode(array((0 until levels).map(l => struct(
        lit(l).as("_l"),
        (shiftright(col("_t") - 1, l) + 1).as("_j"))): _*)).as("_x"))
      .groupBy(col("_x._l").as("_l"), col("_x._j").as("_j"))
      .agg(count(lit(1)).as("_n"))
  }

  /** Released prefixes from a node-count table: the occupied ticks
    * ARE the level-0 nodes; each tick fans out to its set-bit
    * decomposition, left-joins true counts (empty nodes still draw
    * noise — the mechanism releases every node), and sums. The node
    * table is tick-domain-sized; the join deliberately carries NO
    * broadcast hint — a hint is honored at ANY size, but AQE already
    * broadcasts the table when it is small (every fixture regime)
    * and falls back to a shuffled join when a years-of-seconds tick
    * domain makes it tens of millions of rows.
    */
  def releases(nodes: DataFrame, levels: Int,
      epsilonTicks: Long = 1000000L, seed: Long = 0L): DataFrame = {
    require(epsilonTicks > 0, "epsilon must be positive")
    val b = levels * 1e6 / epsilonTicks
    val dec = nodes.filter(col("_l") === 0)
      .select(col("_j").as("_t"))
      .select(col("_t"), explode(array((0 until levels).map(l => struct(
        lit(l).as("_l"),
        shiftright(col("_t"), l).as("_j"))): _*)).as("_x"))
      .filter(col("_x._j") % 2 === 1)
      .select(col("_t"), col("_x._l").as("_l"), col("_x._j").as("_j"))
    dec
      .join(nodes, Seq("_l", "_j"), "left")
      .withColumn("_lap", Privacy.laplaceDraw(
        Privacy.noiseKey(Seq("_l", "_j"), s"$seed:pfx"), b))
      .groupBy(col("_t"))
      .agg(sum(coalesce(col("_n"), lit(0L)) +
        round(col("_lap"), 0).cast("long")).as("_s"))
      .select(col("_t").as("tick"),
        greatest(lit(0L), col("_s")).as("released_n"))
  }

  /** Q193 — continual-release DP counts over `events` at HOUR grain:
    * tick = hours since 2024-01-01 00:00 UTC + 1 (the fixture
    * month spans 720 hour ticks; 10 levels cover 1023).
    */
  def q193DpPrefix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dpPrefixCounts(Tables.load(spark, dir, "events"),
        expr("(unix_timestamp(ts) - unix_timestamp(" +
          "timestamp'2024-01-01 00:00:00')) div 3600 + 1"),
        levels = 10, epsilonTicks = 1000000L, seed = 193L)
      .orderBy($"tick")
  }

  /** DuckDB oracle for [[q193DpPrefix]] — the same dyadic node
    * counts, set-bit decomposition, and fingerprint-seam Laplace
    * draws, computed from the parquet directly.
    */
  def dpPrefixOracleSql(levels: Int = 10,
      epsilonTicks: Long = 1000000L, seed: Long = 193L): String = {
    val b = levels * 1e6 / epsilonTicks
    s"""WITH ev AS (
       |  -- date_diff('second') is exact-integer; epoch()::BIGINT
       |  -- would ROUND fractional seconds where Spark's
       |  -- unix_timestamp truncates, shifting boundary events an hour
       |  SELECT (date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts)
       |      // 3600) + 1 AS _t
       |  FROM events WHERE ts IS NOT NULL),
       | lv AS (SELECT unnest(range(0, $levels))::BIGINT AS _l),
       | nodes AS (
       |  SELECT _l, ((_t - 1) >> _l) + 1 AS _j, count(*)::BIGINT AS _n
       |  FROM ev, lv GROUP BY 1, 2),
       | dec AS (
       |  SELECT _t, _l, (_t >> _l) AS _j
       |  FROM (SELECT DISTINCT _t FROM ev), lv
       |  WHERE ((_t >> _l) % 2) = 1),
       | nz AS (
       |  SELECT d._t, coalesce(n._n, 0)::BIGINT AS _n,
       |    concat_ws(chr(1), d._l::VARCHAR, d._j::VARCHAR,
       |      '$seed:pfx') AS gk
       |  FROM dec d LEFT JOIN nodes n ON n._l = d._l AND n._j = d._j),
       | u AS (
       |  SELECT _t, _n,
       |    ((((${graft.operators.TextAnalysis.fingerprintSql("gk")}) * 2654435761)
       |        % 2147483648 + 0.5)
       |      / 2147483648.0) - 0.5 AS c
       |  FROM nz)
       |SELECT _t AS tick,
       |  greatest(0, sum(_n +
       |    round(-$b * sign(c) * ln(1.0 - 2.0 * abs(c)), 0)::BIGINT))::BIGINT
       |    AS released_n
       |FROM u GROUP BY _t
       |ORDER BY tick""".stripMargin
  }
}
