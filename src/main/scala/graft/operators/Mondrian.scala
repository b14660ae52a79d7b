package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** MONDRIAN MULTIDIMENSIONAL GENERALIZATION (LeFevre, DeWitt,
  * Ramakrishnan, "Mondrian Multidimensional k-Anonymity", ICDE'06) —
  * the multi-attribute leg [[Privacy.generalize]] lacks (r14 verdict
  * missing #5): real anonymization coarsens SEVERAL quasi-attributes
  * JOINTLY. Mondrian kd-partitions the quasi space with greedy median
  * cuts: repeatedly split a partition at the median of one dimension,
  * keeping the cut only when BOTH halves still hold ≥ k rows (the
  * "strict" allowable-cut rule), and release each final partition as
  * per-dimension [lo, hi] ranges instead of exact values.
  *
  * DETERMINISM (the oracle contract): the engine runs a fixed number
  * of breadth-first ROUNDS. Each round, every current leaf picks the
  * dimension with the widest NORMALIZED range (range / global range,
  * LeFevre's choose_dimension; ties by dimension order — at round 1
  * every dimension ties at 1.0, so dimension 1 cuts first), splits at
  * the LOWER MEDIAN (the value whose running count first reaches
  * ceil(n/2); rows with v ≤ median go Left), and keeps the cut iff
  * both sides reach k. Unallowable leaves pass through unchanged. A
  * leaf's id is its cut path ("" → "|1L" → "|1L|2R" …), so the whole
  * recursion unrolls round-by-round in DuckDB CTEs — the q90/q110
  * unrolled-recurrence oracle pattern.
  *
  * Scale shape: per round and dimension, ONE histogram aggregation
  * (groupBy (leaf, value) — distinct-value-sized, partial aggs absorb
  * row skew), running-count windows over the HISTOGRAM (never over
  * rows), and the per-leaf cut table — ≤ 2^round rows, a bounded
  * driver read (the [[Privacy.generalize]] (j+1)-row pick contract) —
  * broadcast-joined back. The fact table never shuffles; rounds are
  * capped (leaf count doubles per round, so `rounds` beyond ~20 is
  * meaningless anyway — every leaf long since hit k).
  */
object Mondrian {

  /** Partition `df` by strict Mondrian over numeric `dims` and
    * release (idCol, dim1_lo, dim1_hi, …): every row tagged with its
    * final partition's per-dimension min/max. Partitions smaller than
    * k never arise from a cut (the allowable rule); only the ROOT can
    * be under k (a table smaller than k), and then nothing releases.
    *
    * With a `sensitive` column and `l > 1` the RELEASE also enforces
    * l-diversity (r15, mirroring `Privacy.kSuppress` — the release
    * ops must agree on what "safe" means): a final partition with
    * fewer than `l` distinct sensitive values suppresses whole. This
    * is RELEASE-side enforcement, deliberately NOT the cut-refusal
    * variant (LeFevre's l-diverse Mondrian refuses cuts that would
    * break l, keeping partitions coarser): suppression never ships
    * an l-risky group either, is deterministic with the same cut
    * tree as the k-only release (oracle reuse), and mirrors how the
    * one-dimensional releases compose their gates. NULL sensitive
    * values count as one value (the census convention). The common
    * failure it catches is structural: cutting a dimension the
    * sensitive attribute correlates with collapses per-partition
    * sensitive diversity — the q188 fixture plants exactly that.
    */
  def generalize(df: DataFrame, idCol: String, dims: Seq[String],
      k: Long, rounds: Int, sensitive: Option[Column] = None,
      l: Long = 1L): DataFrame = {
    require(dims.size >= 2,
      "Mondrian is the MULTI-dimensional generalization — use " +
        "Privacy.generalize for one attribute")
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1 && rounds <= 20,
      "rounds out of [1, 20] — leaves double per round; past ~20 " +
        "every leaf has long hit k")
    require(l >= 1, "l must be >= 1")
    require(l == 1L || sensitive.nonEmpty,
      "enforcing l-diversity (l > 1) needs the sensitive column")
    val ss = df.sparkSession
    import ss.implicits._
    val d = dims.size
    val vCols = (1 to d).map(i => s"_v$i")
    val sensCol = sensitive.map(sc =>
      coalesce(sc.cast("string"), lit("\u0002")).as("_sens")).toSeq
    // rows with a NULL in ANY dimension have no position in the quasi
    // space: they are excluded from partitioning AND release (the
    // conservative direction, the t-closeness NULL convention — a
    // NULL-keyed row can neither satisfy a cut predicate nor carry a
    // range). r15 review finding: Spark windows order NULLS FIRST vs
    // DuckDB's NULLS LAST, and a NULL-counted left side would route
    // its rows Right — excluding them removes both hazards.
    val base = df.select((col(idCol).as("_id") +:
      dims.zipWithIndex.map { case (c, i) =>
        col(c).cast("double").as(s"_v${i + 1}") }) ++ sensCol: _*)
      .filter((1 to dims.size)
        .map(i => col(s"_v$i").isNotNull).reduce(_ && _))
    // global per-dimension ranges for choose_dimension normalization
    // (one tiny agg; d doubles to the driver)
    val grRow = base.agg(
      (max(col(vCols.head)) - min(col(vCols.head))).as("_g1"),
      vCols.tail.zipWithIndex.map { case (v, i) =>
        (max(col(v)) - min(col(v))).as(s"_g${i + 2}") }: _*).head()
    val g = (0 until d).map(i =>
      if (grRow.isNullAt(i)) 0.0 else grRow.getDouble(i))
    var rows = base.withColumn("_leaf", lit(""))
    var r = 1
    var live = true
    while (live && r <= rounds) {
      // per-dimension per-leaf cut stats off the VALUE HISTOGRAM:
      // lower median = first value whose running count reaches
      // ceil(tot/2) (cum*2 >= tot — integer arithmetic, no
      // division), left size = that running count
      val stats = (1 to d).map { i =>
        val hist = rows.groupBy(col("_leaf"), col(s"_v$i").as("_v"))
          .agg(count(lit(1)).as("_n"))
        val wCum = Window.partitionBy("_leaf").orderBy("_v")
        val wAll = Window.partitionBy("_leaf")
        hist
          .withColumn("_cum", sum(col("_n")).over(wCum))
          .withColumn("_tot", sum(col("_n")).over(wAll))
          .groupBy(col("_leaf"))
          .agg(
            min(when(col("_cum") * 2 >= col("_tot"), col("_v")))
              .as("_med"),
            min(when(col("_cum") * 2 >= col("_tot"), col("_cum")))
              .as("_lcnt"),
            max(col("_tot")).as("_tot"),
            (max(col("_v")) - min(col("_v"))).as("_rng"))
          .withColumn("_dim", lit(i))
      }
      val normRng = (1 to d).foldLeft(lit(0.0)) { (acc, i) =>
        when(col("_dim") === i,
          if (g(i - 1) > 0) col("_rng") / g(i - 1) else lit(0.0))
          .otherwise(acc)
      }
      val cuts = stats.reduce(_ unionByName _)
        .filter(col("_lcnt") >= k && col("_tot") - col("_lcnt") >= k)
        .withColumn("_nrm", normRng)
        .withColumn("_rn", row_number().over(Window
          .partitionBy("_leaf")
          .orderBy(col("_nrm").desc, col("_dim"))))
        .filter(col("_rn") === 1)
        .select(col("_leaf"), col("_dim"), col("_med"))
        .as[(String, Int, Double)]
        .collect() // <= 2^(round-1) rows: the bounded cut-table read
      if (cuts.isEmpty) live = false // fixed point: no allowable cut
      else {
        val cutDf = cuts.toSeq.toDF("_leaf", "_cdim", "_cmed")
        val vPicked = (1 to d).foldLeft(lit(Double.NaN)) { (acc, i) =>
          when(col("_cdim") === i, col(s"_v$i")).otherwise(acc)
        }
        // pin the round's output (Pin.iterative — reliable on a
        // cluster, localCheckpoint locally): without the cut, round
        // r's stats and the final release re-execute every prior
        // round's join chain from the base scan (r15 review finding)
        rows = graft.core.Pin.iterative(
          rows.join(broadcast(cutDf), Seq("_leaf"), "left")
            .withColumn("_leaf",
              when(col("_cdim").isNull, col("_leaf"))
                .otherwise(concat(col("_leaf"), lit("|"),
                  col("_cdim").cast("string"),
                  when(vPicked <= col("_cmed"), lit("L"))
                    .otherwise(lit("R")))))
            .drop("_cdim", "_cmed"))
      }
      r += 1
    }
    // release: per-leaf ranges broadcast back; only the uncut root
    // can sit under k, and then it suppresses. With l > 1, leaves
    // whose sensitive diversity is under l suppress whole (diversity
    // via the census's two-level agg — no distinct-state explosion)
    val fin = rows.groupBy(col("_leaf")).agg(
      count(lit(1)).as("_n"),
      (1 to d).flatMap(i => Seq(
        min(col(s"_v$i")).as(s"_lo$i"),
        max(col(s"_v$i")).as(s"_hi$i"))): _*)
    val released = rows.join(broadcast(fin), Seq("_leaf"))
      .filter(col("_n") >= k)
    val gated =
      if (l <= 1L) released
      else {
        val lDiv = rows.groupBy(col("_leaf"), col("_sens"))
          .agg(count(lit(1)).as("_c"))
          .groupBy(col("_leaf")).agg(count(lit(1)).as("_ldiv"))
          .filter(col("_ldiv") >= l)
          .select(col("_leaf"))
        released.join(broadcast(lDiv), Seq("_leaf"), "left_semi")
      }
    gated
      .select(col("_id").as(idCol) +:
        dims.zipWithIndex.flatMap { case (c, i) => Seq(
          col(s"_lo${i + 1}").as(s"${c}_lo"),
          col(s"_hi${i + 1}").as(s"${c}_hi")) }: _*)
  }

  /** Q180 — Mondrian release over `customer`: quasi dimensions
    * (account balance, nation), k = 50, 4 breadth-first rounds; each
    * customer ships as its partition's (acctbal, nationkey) ranges.
    */
  def q180Mondrian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    generalize(Tables.load(spark, dir, "customer"), "c_custkey",
        Seq("c_acctbal", "c_nationkey"), k = 50L, rounds = 4)
      .orderBy($"c_custkey")
  }

  /** Q188 — Mondrian k+l release: the q180 partitioning with
    * l-diversity enforced at release (sensitive = the coarse spend
    * band floor(acctbal/2000), l = 3). The planted structural hazard:
    * the sensitive correlates with cut dimension 1 (acctbal), so the
    * deeper the acctbal cuts go, the fewer spend bands a partition
    * spans — 12 of the 16 leaves collapse to under 3 bands and
    * suppress at BOTH sfs, 4 release.
    */
  def q188MondrianKl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    generalize(Tables.load(spark, dir, "customer"), "c_custkey",
        Seq("c_acctbal", "c_nationkey"), k = 50L, rounds = 4,
        sensitive = Some(floor($"c_acctbal" / 2000.0).cast("long")),
        l = 3L)
      .orderBy($"c_custkey")
  }

  /** DuckDB oracle for [[q180Mondrian]] — the recursion unrolled
    * round-by-round (hist → running counts → per-leaf per-dim cut
    * stats → normalized-range pick → leaf extension), the q90/q110
    * unrolled-recurrence pattern. Fixed to the q180 shape: 2
    * dimensions over customer.
    */
  def mondrianOracleSql(k: Long = 50L, rounds: Int = 4,
      sensSql: Option[String] = None, l: Long = 1L): String = {
    val sensSel = sensSql
      .map(e => s", coalesce(($e)::VARCHAR, chr(2)) AS sens")
      .getOrElse("")
    val sensCarry = if (sensSql.isDefined) ", r.sens" else ""
    val sensFin = if (sensSql.isDefined)
      ", count(DISTINCT sens) AS ld" else ""
    val sensGate = if (l > 1L) s" AND f.ld >= $l" else ""
    val sb = new StringBuilder
    sb ++= "WITH r0 AS (SELECT c_custkey AS id, " +
      "c_acctbal::DOUBLE AS v1, c_nationkey::DOUBLE AS v2" +
      sensSel + ", '' AS leaf FROM customer " +
      "WHERE c_acctbal IS NOT NULL AND c_nationkey IS NOT NULL),\n"
    sb ++= " gr AS (SELECT max(v1) - min(v1) AS g1, " +
      "max(v2) - min(v2) AS g2 FROM r0),\n"
    for (r <- 1 to rounds) {
      val prev = s"r${r - 1}"
      for (i <- 1 to 2) {
        sb ++= s" h${r}_$i AS (SELECT leaf, v$i AS v, " +
          s"count(*)::BIGINT AS n FROM $prev GROUP BY 1, 2),\n"
        sb ++= s" s${r}_$i AS (SELECT leaf, v, " +
          "sum(n) OVER (PARTITION BY leaf ORDER BY v) AS cum, " +
          s"sum(n) OVER (PARTITION BY leaf) AS tot FROM h${r}_$i),\n"
        sb ++= s" m${r}_$i AS (SELECT leaf, $i AS dim, " +
          "min(CASE WHEN cum*2 >= tot THEN v END) AS med, " +
          "min(CASE WHEN cum*2 >= tot THEN cum END) AS lcnt, " +
          "max(tot) AS tot, max(v) - min(v) AS rng " +
          s"FROM s${r}_$i GROUP BY 1),\n"
      }
      sb ++= s" p$r AS (SELECT leaf, dim, med FROM (" +
        "SELECT m.leaf, m.dim, m.med, row_number() OVER (" +
        "PARTITION BY m.leaf ORDER BY (CASE WHEN " +
        "(CASE m.dim WHEN 1 THEN g.g1 ELSE g.g2 END) > 0 THEN " +
        "m.rng / (CASE m.dim WHEN 1 THEN g.g1 ELSE g.g2 END) " +
        "ELSE 0 END) DESC, m.dim) AS rn " +
        s"FROM (SELECT * FROM m${r}_1 UNION ALL " +
        s"SELECT * FROM m${r}_2) m, gr g " +
        s"WHERE m.lcnt >= $k AND m.tot - m.lcnt >= $k) q " +
        "WHERE rn = 1),\n"
      sb ++= s" r$r AS (SELECT r.id, r.v1, r.v2$sensCarry, " +
        "CASE WHEN p.dim IS NULL THEN r.leaf ELSE " +
        "r.leaf || '|' || p.dim::VARCHAR || " +
        "(CASE WHEN (CASE p.dim WHEN 1 THEN r.v1 ELSE r.v2 END) " +
        "<= p.med THEN 'L' ELSE 'R' END) END AS leaf " +
        s"FROM $prev r LEFT JOIN p$r p ON r.leaf = p.leaf),\n"
    }
    sb ++= s" fin AS (SELECT leaf, count(*) AS n$sensFin, " +
      "min(v1) AS lo1, max(v1) AS hi1, min(v2) AS lo2, " +
      s"max(v2) AS hi2 FROM r$rounds GROUP BY 1)\n"
    sb ++= "SELECT r.id AS c_custkey, f.lo1 AS c_acctbal_lo, " +
      "f.hi1 AS c_acctbal_hi, f.lo2 AS c_nationkey_lo, " +
      s"f.hi2 AS c_nationkey_hi FROM r$rounds r " +
      s"JOIN fin f ON r.leaf = f.leaf WHERE f.n >= $k$sensGate " +
      "ORDER BY 1"
    sb.toString
  }
}
