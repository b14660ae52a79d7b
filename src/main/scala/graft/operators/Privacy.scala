package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** PRIVACY-RISK AUDITING for data releases — the census a customer
  * dataset must pass BEFORE it ships as training data or a shared
  * extract. Re-identification risk comes from QUASI-IDENTIFIER
  * combinations (Sweeney's k-anonymity): a row whose (nation,
  * segment, spend band) combination is shared by fewer than k rows
  * is linkable, even with every direct identifier removed; and a
  * k-large group whose SENSITIVE attribute barely varies leaks that
  * attribute to anyone who can place a person in the group
  * (Machanavajjhala's l-diversity).
  *
  * Reference scope: absent from the reference (no privacy auditing);
  * extends the r13/r14 compliance family (takedown, retention,
  * right-to-be-forgotten, blocklists, deletion audit) with the
  * pre-RELEASE leg: forget/expire remove what must go, this measures
  * whether what REMAINS is safe to hand out.
  *
  * Scale shape: the census is one quasi-identifier groupBy with
  * algebraic aggregates (count + distinct-sensitive via a two-level
  * agg) — partial aggregation before the exchange, group-count-sized
  * output. Suppression reuses that shape and BROADCASTS the safe
  * group list back as a null-safe semi-join: the fact table never
  * shuffles (r14 verdict #1 — a window count over the quasi key puts
  * every row of a group through one task's buffer, and k-anonymous
  * groups are large BY DESIGN). Both run unchanged at any corpus
  * size.
  */
object Privacy {

  /** K-ANONYMITY / L-DIVERSITY census: one row per quasi-identifier
    * group — (quasi cols…, group_n, l_div, k_risk, l_risk). `k_risk`:
    * fewer than `k` rows share the combination (re-identifiable).
    * `l_risk`: fewer than `l` distinct sensitive values in the group
    * (attribute disclosure). NULL quasi values group as their own
    * combination (NULL is itself linkable); NULL sensitive values
    * count as one value.
    */
  def kAnonymityCensus(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: Column, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "k-anonymity needs quasi-identifiers")
    require(k >= 1 && l >= 1, "k and l must be >= 1")
    val qs = quasiCols.map(col)
    df.select(qs :+ sensitiveCol.as("_sens"): _*)
      // two-level agg: distinct sensitive per group without
      // count_distinct's per-group state explosion on wide groups
      .groupBy(qs :+ col("_sens"): _*)
      .agg(count(lit(1)).as("_n"))
      .groupBy(qs: _*)
      .agg(sum(col("_n")).as("group_n"), count(lit(1)).as("l_div"))
      .withColumn("k_risk", col("group_n") < k)
      .withColumn("l_risk", col("l_div") < l)
  }

  /** SUPPRESSION release — the minimal k-anonymization: drop every
    * row whose quasi-identifier group is smaller than `k`; the
    * released rows all sit in groups of ≥ k by construction. With a
    * `sensitive` column and `l > 1` the release ALSO enforces
    * l-diversity (r14 verdict missing #4): a group of 10,000 rows
    * whose sensitive attribute barely varies leaks it to anyone who
    * can place a person in the group, so groups with fewer than `l`
    * distinct sensitive values suppress too — the census FLAGS that
    * risk, this is the release op that acts on it.
    *
    * Scale shape (r14 verdict #1 — replaces the full-table window
    * count): group sizes come from the census's own partial-agg
    * groupBy (group-count-sized exchange, map-side combine absorbs
    * any quasi-key skew), and the SAFE group list — group-count-sized
    * by definition — broadcasts back as a LEFT SEMI join. The fact
    * table never shuffles and no task ever buffers a whole group
    * (k-anonymous groups are large BY DESIGN; the window plan put
    * tens of GBs through single tasks at 100 TB). The join is
    * NULL-SAFE (`<=>`) so a NULL quasi combination — its own
    * linkable group, same as the census — suppresses or releases as
    * a group like any other.
    */
  def kSuppress(df: DataFrame, quasiCols: Seq[String], k: Long,
      sensitive: Option[Column] = None, l: Long = 1L,
      broadcastSafe: Boolean = true): DataFrame = {
    require(quasiCols.nonEmpty, "k-suppression needs quasi-identifiers")
    require(l >= 1, "l must be >= 1")
    require(l == 1L || sensitive.nonEmpty,
      "enforcing l-diversity (l > 1) needs the sensitive column")
    val qs = quasiCols.map(col)
    val safe = sensitive match {
      case Some(s) =>
        kAnonymityCensus(df, quasiCols, s, k, l)
          .filter(!col("k_risk") && !col("l_risk"))
      case None =>
        df.groupBy(qs: _*).agg(count(lit(1)).as("group_n"))
          .filter(col("group_n") >= k)
    }
    semiJoinSafeGroups(df, quasiCols, safe, broadcastSafe)
  }

  /** The release gate every suppression op shares: null-safe LEFT
    * SEMI join of `df` against the safe-group key list. The broadcast
    * hint is ON by default (a k-anonymous release's group list is
    * usually tiny next to the fact table) but NOT unconditional: the
    * safe list is bounded only by N/k, and a fine-grained quasi key
    * at small k can exceed the broadcast ceiling — callers in that
    * regime pass `broadcastSafe = false` and let the join shuffle
    * (the gate stays correct; only the strategy changes).
    */
  private def semiJoinSafeGroups(df: DataFrame, quasiCols: Seq[String],
      safe: DataFrame, broadcastSafe: Boolean): DataFrame = {
    val keys = safe.select(
      quasiCols.map(c => col(c).as(s"_safe_$c")): _*)
    val cond = quasiCols
      .map(c => col(c) <=> col(s"_safe_$c"))
      .reduce(_ && _)
    df.join(if (broadcastSafe) broadcast(keys) else keys,
      cond, "left_semi")
  }

  /** QUASI-IDENTIFIER DISCOVERY — the governance step BEFORE every
    * census above: the k/l/t audits all take the quasi columns as
    * GIVEN, but in practice nobody hands them over; someone has to
    * find which column combinations are re-identifying (Sweeney's
    * original observation was exactly this measurement: 87% of the
    * US population is unique under (ZIP, birth date, sex)). For every
    * combination of `candidates` up to `maxArity`, one row:
    * (combo, arity, n_groups, singleton_groups — combinations unique
    * to ONE row, the directly re-identifying ones — and rows_at_risk,
    * rows in groups under `k`). A combo with high singletons/at-risk
    * counts is a quasi-identifier; feed it to the censuses and
    * releases above.
    *
    * Scale shape: ONE grouping-sets aggregation computes every
    * combo's group histogram in a single pass and a single shuffle
    * (partial aggs as always) — not one groupBy per combo; a
    * second combo-keyed agg (combo-count-sized) folds histograms to
    * the per-combo stats. The combinatorial guard is explicit:
    * ≤ 12 candidates and the grouping-set count is capped, because
    * the lattice is exponential and a silent 2^20-set plan is worse
    * than a loud refusal. NULL candidate values group as their own
    * combination (linkable, like the census); grouping-set NULLs are
    * disambiguated by grouping_id, not by value.
    */
  def quasiScan(df: DataFrame, candidates: Seq[String],
      maxArity: Int, k: Long): DataFrame = {
    require(candidates.nonEmpty && candidates.size <= 12,
      "quasiScan needs 1..12 candidate columns")
    require(candidates.distinct.size == candidates.size,
      "duplicate candidate column")
    require(maxArity >= 1 && maxArity <= candidates.size,
      s"maxArity out of [1, ${candidates.size}]")
    require(k >= 1, "k must be >= 1")
    val combos: Seq[Seq[String]] =
      (1 to maxArity).flatMap(a => candidates.combinations(a))
    require(combos.size <= 256,
      s"${combos.size} grouping sets — cap is 256; lower maxArity")
    val m = candidates.size
    // SQL-standard grouping_id: bit (m-1-i) SET when candidate i is
    // NOT in the row's grouping set
    def gidOf(combo: Seq[String]): Long =
      candidates.zipWithIndex
        .filterNot { case (c, _) => combo.contains(c) }
        .map { case (_, i) => 1L << (m - 1 - i) }.sum
    val label = combos.foldRight(lit(null).cast("string")) { (c, els) =>
      when(col("_gid") === gidOf(c), lit(c.mkString("+")))
        .otherwise(els)
    }
    val arity = combos.foldRight(lit(0)) { (c, els) =>
      when(col("_gid") === gidOf(c), lit(c.size)).otherwise(els)
    }
    df.groupingSets(combos.map(_.map(col)), candidates.map(col): _*)
      .agg(grouping_id().as("_gid"), count(lit(1)).as("_n"))
      .withColumn("combo", label)
      .withColumn("arity", arity)
      .groupBy(col("combo"), col("arity"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("_n") === 1L, 1L).otherwise(0L))
          .as("singleton_groups"),
        sum(when(col("_n") < k, col("_n")).otherwise(0L))
          .as("rows_at_risk"))
  }

  /** T-CLOSENESS census (Li, Li & Venkatasubramanian ICDE'07) — the
    * third privacy model of the trio, catching what k-anonymity and
    * l-diversity both miss: a group can be large (k passes) with many
    * distinct sensitive values (l passes) whose DISTRIBUTION still
    * differs sharply from the table's — e.g. a group whose spend
    * bands are all in the top decile discloses "high spender" to
    * anyone who can place a person in it. t-closeness bounds the
    * Earth Mover's Distance between each group's sensitive
    * distribution and the GLOBAL one; for an ordered discrete domain
    * of D values, EMD = Σ|cumulative difference| / (D − 1) (the
    * paper's ordered-distance formula). Output: one row per quasi
    * group — (quasi…, group_n, emd_ticks, t_risk) with EMD in
    * integer millionths and `t_risk` ⟺ emd > tTicks.
    *
    * Per-term ticks round BEFORE the per-group sum, so the sum is
    * exact long arithmetic (partition-invariant, the house
    * convention); the one double division (Σticks / (D−1)) is
    * deterministic. Rows with a NULL sensitive value are EXCLUDED:
    * the ordered-domain EMD needs every value to have a position and
    * NULL has none (the k/l census is where NULL-as-a-value belongs);
    * a single-value domain (D = 1) has EMD 0 by definition.
    *
    * Scale shape: two histogram aggs (quasi×sensitive and global
    * sensitive — both partial-agg, histogram-sized), the dense
    * group×domain frame via a BROADCAST cross of the domain
    * (G×D rows — D is the banded-sensitive domain, bounded by
    * design), cumulative windows partitioned per GROUP over D rows
    * each (never over raw rows), one final group agg.
    */
  def tClosenessCensus(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: Column, tTicks: Long): DataFrame = {
    require(quasiCols.nonEmpty, "t-closeness needs quasi-identifiers")
    require(tTicks >= 0, "t must be >= 0")
    val qs = quasiCols.map(col)
    val base = df.select(qs :+ sensitiveCol.as("_sens"): _*)
      .filter(col("_sens").isNotNull)
    val hist = base.groupBy(qs :+ col("_sens"): _*)
      .agg(count(lit(1)).as("_cnt"))
    tCensusFromHist(hist, quasiCols, tTicks)
  }

  /** The census tail shared with the STREAMING leg
    * ([[graft.streaming.StreamingTCensus]]): given the per-(quasi,
    * sensitive) count histogram — the mergeable state both legs
    * maintain — compute the ordered-domain EMD census. Everything
    * here is histogram-sized: the global distribution is a
    * sensitive-domain-sized rollup OF THE HISTOGRAM, never a second
    * fact scan.
    */
  private[graft] def tCensusFromHist(hist: DataFrame,
      quasiCols: Seq[String], tTicks: Long): DataFrame = {
    val qs = quasiCols.map(col)
    val global = hist.groupBy(col("_sens"))
      .agg(sum(col("_cnt")).as("_gcnt"))
    val total = global.agg(sum(col("_gcnt")).as("_N"))
    val groups = hist.groupBy(qs: _*).agg(sum(col("_cnt")).as("_ng"))
    // the histogram side renames its columns: groupBy preserves expr
    // ids, so a bare self-join condition would be ambiguous
    val hist2 = hist.select(
      quasiCols.map(c => col(c).as(s"_h_$c")) :+
        col("_sens").as("_hsens") :+ col("_cnt"): _*)
    val dense = groups
      .crossJoin(broadcast(global.select(col("_sens").as("_dsens"),
        col("_gcnt"))))
      .join(hist2,
        quasiCols.map(c => col(c) <=> col(s"_h_$c"))
          .reduce(_ && _) && col("_dsens") === col("_hsens"),
        "left")
      .select(qs :+ col("_dsens") :+
        col("_ng") :+ col("_gcnt") :+
        coalesce(col("_cnt"), lit(0L)).as("_cnt"): _*)
      .crossJoin(broadcast(total))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qs: _*).orderBy(col("_dsens"))
    dense
      .withColumn("_cumg", sum(col("_cnt")).over(w))
      .withColumn("_cuma", sum(col("_gcnt")).over(w))
      .withColumn("_tt", round(lit(1e6) *
        abs(col("_cumg").cast("double") / col("_ng") -
          col("_cuma").cast("double") / col("_N")), 0).cast("long"))
      .groupBy(qs: _*)
      .agg(max(col("_ng")).as("group_n"), sum(col("_tt")).as("_s"),
        count(lit(1)).as("_d"))
      .withColumn("emd_ticks",
        when(col("_d") > 1,
          round(col("_s").cast("double") / (col("_d") - 1), 0)
            .cast("long"))
          .otherwise(lit(0L)))
      .withColumn("t_risk", col("emd_ticks") > tTicks)
      .drop("_s", "_d")
  }

  /** T-SUPPRESSION release: drop every row whose quasi group's
    * sensitive distribution strays more than `tTicks` EMD from the
    * global one — the release op for the census above, in the
    * [[kSuppress]] shape (group stats partial-agg'd, the safe-group
    * list broadcast back as a null-safe semi-join; the fact table
    * never shuffles). Compose with [[kSuppress]] for k+l+t releases —
    * each gate is a semi-join against a group-count-sized list.
    *
    * ALL-NULL-SENSITIVE groups SUPPRESS (r15 ADVICE #4, now the
    * documented contract): NULL sensitive rows contribute nothing to
    * the census base, so a quasi group whose sensitive values are ALL
    * NULL gets no census row at all and the semi-join drops it —
    * deliberately the conservative direction. Such a group carries no
    * distribution evidence either way, and a release gate must not
    * ship what it cannot measure; a caller who wants "unknown
    * sensitive" to count as ordinary evidence should encode NULL as a
    * domain value before the census (the band-it-first convention).
    */
  def tSuppress(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: Column, tTicks: Long,
      broadcastSafe: Boolean = true): DataFrame = {
    val safe = tClosenessCensus(df, quasiCols, sensitiveCol, tTicks)
      .filter(!col("t_risk"))
    semiJoinSafeGroups(df, quasiCols, safe, broadcastSafe)
  }

  /** [[kSuppress]] committed INTO A VERSIONED TABLE with its
    * information-LOSS evidence on the manifest (r15 verdict missing
    * #8): a suppression release that leaves no record of what it
    * dropped cannot answer the first governance question — "how much
    * of the table did this release actually ship?". The audit map
    * records rows_in / rows_released / groups_total /
    * groups_suppressed — COUNTS ONLY, never keys or group values,
    * matching the deletion-audit convention. Evidence comes from ONE
    * group-count-sized aggregation (group sizes joined against the
    * pinned safe list), so the accounting adds no fact-table pass
    * beyond the release itself. Idempotent under txn replay: a
    * replayed release skips the evidence jobs entirely.
    */
  def releaseKSuppress(table: graft.store.VersionedTable,
      df: DataFrame, quasiCols: Seq[String], k: Long,
      sensitive: Option[Column] = None, l: Long = 1L,
      broadcastSafe: Boolean = true,
      txnId: Option[String] = None): Long = {
    require(quasiCols.nonEmpty, "k-suppression needs quasi-identifiers")
    require(l >= 1, "l must be >= 1")
    require(l == 1L || sensitive.nonEmpty,
      "enforcing l-diversity (l > 1) needs the sensitive column")
    val qs = quasiCols.map(col)
    val safe = (sensitive match {
      case Some(sc) =>
        kAnonymityCensus(df, quasiCols, sc, k, l)
          .filter(!col("k_risk") && !col("l_risk"))
      case None =>
        df.groupBy(qs: _*).agg(count(lit(1)).as("group_n"))
          .filter(col("group_n") >= k)
    }).select(qs: _*)
    releaseSuppressed(table, df, quasiCols, safe,
      Map("privacy.mechanism" -> "k_suppress",
        "privacy.k" -> k.toString) ++
        (if (l > 1L) Map("privacy.l" -> l.toString) else Map.empty),
      broadcastSafe, txnId)
  }

  /** [[tSuppress]] committed with loss evidence — see
    * [[releaseKSuppress]]. Note the evidence counts use TRUE group
    * sizes from the fact frame (the t census's group_n excludes
    * NULL-sensitive rows, which DO release with a safe group), and
    * all-NULL-sensitive groups — which conservatively suppress, see
    * [[tSuppress]] — count as suppressed groups here.
    */
  def releaseTSuppress(table: graft.store.VersionedTable,
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: Column,
      tTicks: Long, broadcastSafe: Boolean = true,
      txnId: Option[String] = None): Long = {
    val safe = tClosenessCensus(df, quasiCols, sensitiveCol, tTicks)
      .filter(!col("t_risk"))
      .select(quasiCols.map(col): _*)
    releaseSuppressed(table, df, quasiCols, safe,
      Map("privacy.mechanism" -> "t_suppress",
        "privacy.t_ticks" -> tTicks.toString),
      broadcastSafe, txnId)
  }

  /** Shared audited-suppression commit: pin the safe-key list (it
    * feeds both the evidence aggregation and the release semi-join),
    * count per-group losses with a null-safe left join of the
    * group-size table against it, release through the usual gate,
    * commit with the counts on the manifest.
    */
  private def releaseSuppressed(table: graft.store.VersionedTable,
      df: DataFrame, quasiCols: Seq[String], safeKeys: DataFrame,
      evidence: Map[String, String], broadcastSafe: Boolean,
      txnId: Option[String]): Long = {
    if (txnId.exists(table.txnCommitted))
      return table.currentVersion.getOrElse(
        throw new IllegalStateException("replayed txn on empty table"))
    val safe = graft.core.Pin.reuse(safeKeys)
    val marked = safe.select(
      quasiCols.map(c => col(c).as(s"_safe_$c")) :+ lit(1).as("_ok"): _*)
    val cond = quasiCols
      .map(c => col(c) <=> col(s"_safe_$c"))
      .reduce(_ && _)
    val sizes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_gn"))
    val ev = sizes
      .join(if (broadcastSafe) broadcast(marked) else marked, cond, "left")
      .agg(sum(col("_gn")).as("_in"),
        sum(when(col("_ok").isNotNull, col("_gn"))).as("_rel"),
        count(lit(1)).as("_gt"),
        count(when(col("_ok").isNull, lit(1))).as("_gs"))
      .collect().head
    def cnt(i: Int): Long = if (ev.isNullAt(i)) 0L else ev.getLong(i)
    val release = semiJoinSafeGroups(df, quasiCols, safe, broadcastSafe)
    table.commitAudited(release, evidence ++ Map(
      "privacy.rows_in" -> cnt(0).toString,
      "privacy.rows_released" -> cnt(1).toString,
      "privacy.groups_total" -> cnt(2).toString,
      "privacy.groups_suppressed" -> cnt(3).toString), txnId)
  }

  /** Group key || salt for the noise seam, NULLs as a sentinel
    * (concat_ws would skip them and collide NULL with empty).
    */
  private[operators] def noiseKey(quasiCols: Seq[String], salt: String): Column =
    concat_ws("\u0001",
      quasiCols.map(c =>
        coalesce(col(c).cast("string"), lit("\u0002"))) :+
        lit(salt): _*)

  /** The deterministic Laplace(b) draw of the noise seam: fingerprint
    * then the Knuth multiplicative mix (the q165 grouping device —
    * the polynomial fingerprint of SHORT structured keys is not
    * uniform, adjacent keys give adjacent values; the multiplication
    * spreads any change across the 31-bit range), inverse CDF from
    * the resulting uniform. Long-safe: fingerprint < 1e9+7, times the
    * Knuth constant < 2^63.
    */
  /** The deterministic Gumbel(0,1) draw of the noise seam — the
    * exponential-mechanism counterpart of [[laplaceDraw]]: same
    * fingerprint + Knuth mix to a uniform, then g = −ln(−ln(u)).
    */
  private def gumbelDraw(keyStr: Column): Column = {
    val m = pmod(TextAnalysis.fingerprint(keyStr) * lit(2654435761L),
      lit(2147483648L))
    val u = (m + lit(0.5)) / lit(2.147483648e9)
    -log(-log(u))
  }

  private[operators] def laplaceDraw(keyStr: Column, b: Double): Column =
    laplaceDrawMult(TextAnalysis.fingerprint(keyStr), b, 2654435761L)

  /** One Laplace(b) from a SHARED fingerprint and a draw-specific
    * odd multiplier — the r16 decorrelation device (see
    * [[gaussianDraw]]): a release that needs TWO draws per group
    * remixes one fingerprint rather than salting two keys, because
    * same-length salts give affine-correlated fingerprints.
    */
  private[operators] def laplaceDrawMult(f: Column, b: Double,
      mult: Long): Column = {
    val m = pmod(f * lit(mult), lit(2147483648L))
    val u = (m + lit(0.5)) / lit(2.147483648e9)
    val c = u - lit(0.5)
    -lit(b) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
  }

  /** The deterministic STANDARD-NORMAL draw of the noise seam — the
    * Gaussian-mechanism counterpart of [[laplaceDraw]]: Box–Muller,
    * z = sqrt(−2·ln u1) · cos(2π·u2). The two uniforms come from ONE
    * fingerprint mixed by TWO different odd multipliers (Knuth's
    * 2654435761 and xxHash's 2246822519) — the r16 q194 finding: two
    * SALTED keys are NOT two independent draws, because the
    * polynomial fingerprint is affine in key differences, so the
    * original `:gs1`/`:gs2` pair had u2 = u1 + const (mod 1) and the
    * Box–Muller angle was a deterministic function of the radius
    * (draws traced a 1-D curve, not a 2-D Gaussian; measured
    * radius-angle rank correlation ≈ 1 on the q192 groups). The
    * multiplicative remix decorrelates (measured ≈ 0). Same
    * engine-portability contract as the Laplace/Gumbel draws
    * (ln/cos/sqrt bit-identical across Spark and DuckDB by the
    * q177/q181/q183/q192 oracles) and the same
    * NOT-DP-until-production-swaps-the-CSPRNG caveat.
    */
  private def gaussianDraw(key: Column): Column = {
    val f = TextAnalysis.fingerprint(key)
    def u(mult: Long): Column =
      (pmod(f * lit(mult), lit(2147483648L)) + lit(0.5)) /
        lit(2.147483648e9)
    sqrt(lit(-2.0) * log(u(2654435761L))) *
      cos(lit(2.0 * math.Pi) * u(2246822519L))
  }

  /** DIFFERENTIALLY-PRIVATE COUNT RELEASE mechanics — the third
    * privacy leg: where [[kSuppress]] protects by dropping rows,
    * the Laplace mechanism releases EVERY group with calibrated
    * noise: released = max(0, n + round(Laplace(1/ε))) — a count
    * query has sensitivity 1 (one person changes any group count by
    * at most 1), so Laplace noise of scale b = 1/ε gives ε-DP
    * (Dwork et al. 2006). Clamping at 0 and rounding to integers are
    * standard post-processing (DP survives post-processing).
    *
    * NOISE SOURCE SEAM: the engine draws the Laplace sample by
    * inverse CDF from a uniform DERIVED DETERMINISTICALLY from the
    * group key and a caller seed (the shared
    * [[TextAnalysis.fingerprint]] polynomial hash — a native codegen
    * expression with an exact DuckDB mirror). That makes the release
    * testable and oracle-checkable end-to-end — and, deliberately
    * documented: a PREDICTABLE noise source is NOT differential
    * privacy. The mechanism (sensitivity analysis, scale
    * calibration, clamp/round post-processing, the one-shuffle
    * group-count plan) is the engine deliverable; production swaps
    * the uniform for a CSPRNG draw by replacing one column
    * expression. Noise magnitude is bounded by b·ln(2^31) ≈ 21.5·b
    * (the inverse CDF of the coarsest representable uniform).
    *
    * `epsilonTicks` is ε in the repo's 1e6-tick convention
    * (1_000_000 = ε 1.0). Scale shape: one quasi-key groupBy with a
    * partial-agg count; the noise is a per-group projection.
    */
  def dpCounts(df: DataFrame, quasiCols: Seq[String],
      epsilonTicks: Long = 1000000L, seed: Long = 0L): DataFrame = {
    require(quasiCols.nonEmpty, "dpCounts needs group columns")
    require(epsilonTicks > 0, "epsilon must be positive")
    val qs = quasiCols.map(col)
    val b = 1e6 / epsilonTicks
    df.groupBy(qs: _*).agg(count(lit(1)).as("_n"))
      .withColumn("_lap",
        laplaceDraw(noiseKey(quasiCols, seed.toString), b))
      .select(qs :+
        greatest(lit(0L),
          col("_n") + round(col("_lap"), 0).cast("long"))
          .as("released_n"): _*)
  }

  /** DP SUM RELEASE with BOUNDED SENSITIVITY (r14 verdict missing
    * #6) — the actually useful release for spend-style columns. A
    * raw sum has unbounded sensitivity (one row's contribution is
    * unbounded), so every contribution is CLAMPED per row to
    * [loTicks, hiTicks] FIRST; changing one row then moves the
    * clamped sum by at most (hi − lo), which is the sensitivity, and
    * Laplace noise of scale b = (hi − lo)/ε gives ε-DP (Dwork et al.
    * 2006). Values are integer TICKS (the repo convention — exact
    * long sums, no cross-engine float association drift); the
    * released sum is the clamped true sum plus rounded noise,
    * UNCLAMPED (a sum may legitimately be negative when lo < 0;
    * range post-processing is the caller's choice). Same
    * deterministic noise seam — and the same NOT-DP-until-production-
    * swaps-the-CSPRNG caveat — as [[dpCounts]]; the salt suffix
    * `:sum` keeps the draw independent of a count release over the
    * same groups.
    *
    * Scale shape: one quasi-key groupBy with a partial-agg sum of the
    * clamped column; noise is a per-group projection.
    */
  def dpSum(df: DataFrame, quasiCols: Seq[String], valueTicks: Column,
      loTicks: Long, hiTicks: Long, epsilonTicks: Long = 1000000L,
      seed: Long = 0L): DataFrame = {
    require(quasiCols.nonEmpty, "dpSum needs group columns")
    require(epsilonTicks > 0, "epsilon must be positive")
    require(loTicks < hiTicks, "dpSum needs a clamp range lo < hi")
    val qs = quasiCols.map(col)
    val b = (hiTicks - loTicks) * 1e6 / epsilonTicks
    val clamped = greatest(least(valueTicks.cast("long"),
      lit(hiTicks)), lit(loTicks))
    df.groupBy(qs: _*).agg(sum(clamped).as("_s"))
      .withColumn("_lap",
        laplaceDraw(noiseKey(quasiCols, s"$seed:sum"), b))
      .select(qs :+
        (col("_s") + round(col("_lap"), 0).cast("long"))
          .as("released_sum"): _*)
  }

  /** DP SUM under the GAUSSIAN MECHANISM — the (ε, δ) release that
    * puts the ledger's δ field to work: for ε ∈ (0, 1), noise
    * N(0, σ²) with σ = Δ·sqrt(2·ln(1.25/δ))/ε and Δ = hi − lo is
    * (ε, δ)-DP (the classic Gaussian mechanism, Dwork & Roth 2014
    * Thm A.1). Why a pipeline picks it over [[dpSum]]'s Laplace:
    * Gaussian noise CONCENTRATES (sub-gaussian tails) and composes
    * by summing VARIANCES, so across many releases the same total
    * privacy buys materially less noise — at the price of the δ
    * failure mass, which is exactly what the ledger records
    * ([[releaseDp]] with `deltaTicks`; disjoint scopes compose in
    * parallel for δ too). Per-row clamp bounds the L2 sensitivity at
    * Δ (each row contributes to ONE group), exact long sums, and a
    * deterministic Box–Muller draw on the shared seam (ONE `:gs`
    * salted key, two multiplier remixes — see [[gaussianDraw]] for
    * why two salted keys would NOT be independent — keeping the pair
    * independent of any Laplace release over the same groups). σ is
    * calibrated ONCE driver-side and inlined, so the oracle shares
    * the exact double.
    */
  def dpSumGaussian(df: DataFrame, quasiCols: Seq[String],
      valueTicks: Column, loTicks: Long, hiTicks: Long,
      epsilonTicks: Long = 500000L, deltaTicks: Long = 1000L,
      seed: Long = 0L): DataFrame = {
    require(quasiCols.nonEmpty, "dpSumGaussian needs group columns")
    require(epsilonTicks > 0 && epsilonTicks < 1000000L,
      "the classic Gaussian-mechanism calibration holds for " +
        "0 < epsilon < 1 (ticks in (0, 1e6)); for epsilon >= 1 use " +
        "the Laplace dpSum")
    require(deltaTicks > 0 && deltaTicks < 1000000L,
      "delta must sit in (0, 1) ticks — delta = 0 is pure-epsilon " +
        "territory (Laplace); delta >= 1 is no guarantee at all")
    require(loTicks < hiTicks, "dpSumGaussian needs a clamp range lo < hi")
    val qs = quasiCols.map(col)
    val sigma = gaussianSigma(loTicks, hiTicks, epsilonTicks, deltaTicks)
    val clamped = greatest(least(valueTicks.cast("long"),
      lit(hiTicks)), lit(loTicks))
    df.groupBy(qs: _*).agg(sum(clamped).as("_s"))
      .withColumn("_z", gaussianDraw(
        noiseKey(quasiCols, s"$seed:gs")))
      .select(qs :+
        (col("_s") + round(lit(sigma) * col("_z"), 0).cast("long"))
          .as("released_sum"): _*)
  }

  /** The classic Gaussian-mechanism scale, computed ONCE driver-side
    * so the engine and the oracle share the identical double.
    */
  private[graft] def gaussianSigma(loTicks: Long, hiTicks: Long,
      epsilonTicks: Long, deltaTicks: Long): Double =
    (hiTicks - loTicks) *
      math.sqrt(2.0 * math.log(1.25 / (deltaTicks / 1e6))) /
      (epsilonTicks / 1e6)

  /** DP MEAN RELEASE — the standard composition: an ε/2 noised
    * clamped sum ([[dpSum]]'s clamp, so sum sensitivity is hi − lo)
    * divided by an ε/2 noised count (sequential composition spends ε
    * total; the ratio is post-processing, which DP survives). The
    * denominator clamps at 1 so an emptied-out noisy count cannot
    * divide by zero or flip the sign. Released as a double — the
    * division of two exact longs is deterministic across engines.
    * The two draws remix ONE `:mean`-salted fingerprint with two odd
    * multipliers — distinct same-length salts (the pre-r16 `:sum`/
    * `:cnt`) gave affine-CORRELATED uniforms (u_cnt = u_sum + const
    * mod 1, the q194 finding), which collapsed the claimed two-draw
    * sequential composition into one effective draw: an observer of
    * both coordinates could pin the shared uniform and strip both
    * noises. The remix restores a decorrelated pair on the
    * deterministic seam (production still swaps in a CSPRNG).
    */
  def dpMean(df: DataFrame, quasiCols: Seq[String], valueTicks: Column,
      loTicks: Long, hiTicks: Long, epsilonTicks: Long = 1000000L,
      seed: Long = 0L): DataFrame = {
    require(quasiCols.nonEmpty, "dpMean needs group columns")
    require(epsilonTicks > 1, "dpMean splits epsilon; needs >= 2 ticks")
    require(loTicks < hiTicks, "dpMean needs a clamp range lo < hi")
    val qs = quasiCols.map(col)
    val epsSum = epsilonTicks / 2
    val epsCnt = epsilonTicks - epsSum
    val bSum = (hiTicks - loTicks) * 1e6 / epsSum
    val bCnt = 1e6 / epsCnt.toDouble
    val clamped = greatest(least(valueTicks.cast("long"),
      lit(hiTicks)), lit(loTicks))
    val f = TextAnalysis.fingerprint(
      noiseKey(quasiCols, s"$seed:mean"))
    df.groupBy(qs: _*)
      .agg(sum(clamped).as("_s"), count(lit(1)).as("_n"))
      .withColumn("_ls", laplaceDrawMult(f, bSum, 2654435761L))
      .withColumn("_lc", laplaceDrawMult(f, bCnt, 2246822519L))
      .select(qs :+
        ((col("_s") + round(col("_ls"), 0).cast("long"))
            .cast("double") /
          greatest(lit(1L),
            col("_n") + round(col("_lc"), 0).cast("long"))
            .cast("double"))
          .as("released_mean"): _*)
  }

  /** DP TOP-K SELECTION — the EXPONENTIAL MECHANISM (McSherry &
    * Talwar FOCS'07) specialization the other releases can't express:
    * release WHICH k groups are largest without releasing their
    * counts (a noisy-counts release still leaks magnitudes; selection
    * leaks only identity + rank). Utility = group count (sensitivity
    * Δu = 1), one selection draws a group with probability
    * ∝ exp(ε·u/2Δ); the classic Gumbel-max identity (argmax of
    * ε·u/2 + Gumbel(0,1) IS that draw) turns k peeled selections at
    * ε/k each — simple sequential composition, total ε — into ONE
    * top-k over noisy scores (the one-shot Gumbel trick, Durfee &
    * Rogers NeurIPS'19). Ranks ship; counts never do.
    *
    * The Gumbel draw rides the same deterministic noise seam (and the
    * same NOT-DP-until-production-swaps-the-CSPRNG caveat) as
    * [[dpCounts]]: g = −ln(−ln(u)) with u from the fingerprint mix,
    * salt suffix `:topk`. Ties (same noisy score — measure-zero but
    * the contract is total) break by the quasi columns ascending.
    *
    * Scale shape: one quasi-key groupBy (partial aggs), a per-group
    * score projection, and a TakeOrderedAndProject top-k — never a
    * global sort; the rank window runs over the k survivors only.
    */
  def dpTopK(df: DataFrame, quasiCols: Seq[String], k: Int,
      epsilonTicks: Long = 1000000L, seed: Long = 0L): DataFrame = {
    require(quasiCols.nonEmpty, "dpTopK needs group columns")
    require(k >= 1, "k must be >= 1")
    require(epsilonTicks > 0, "epsilon must be positive")
    val qs = quasiCols.map(col)
    // per-selection ε/k, utility coefficient ε_sel / (2Δ), Δ = 1
    val coef = epsilonTicks / 1e6 / k / 2.0
    df.groupBy(qs: _*).agg(count(lit(1)).as("_n"))
      .withColumn("_score", lit(coef) * col("_n") +
        gumbelDraw(noiseKey(quasiCols, s"$seed:topk")))
      .orderBy(col("_score").desc +: qs.map(_.asc): _*)
      .limit(k)
      .withColumn("rank", row_number().over(org.apache.spark.sql
        .expressions.Window
        .orderBy(col("_score").desc +: qs.map(_.asc): _*)))
      .select(qs :+ col("rank"): _*)
  }

  /** ANONYMIZATION QUALITY CENSUS over a range-generalized release —
    * the information-loss side of the privacy trade, measured so a
    * release pipeline can pick k / cut depth on evidence instead of
    * folklore: per released partition (the distinct [lo, hi] range
    * combination), its size `n`, its NORMALIZED CERTAINTY PENALTY in
    * integer millionths (`ncp_ticks` — mean over dimensions of range
    * width / global domain width, Xu et al. KDD'06: 0 = exact values
    * survived, 1e6 = the dimension collapsed to its whole domain) and
    * its DISCERNIBILITY cost (`dm` = n², Bayardo & Agrawal ICDE'05 —
    * every row is indistinguishable from n−1 others). Totals are
    * exact-long sums of these per-group rows, so the census is
    * partition-invariant like everything else.
    *
    * `dims` are the base column names; the release carries
    * `<dim>_lo` / `<dim>_hi` (the [[Mondrian.generalize]] shape);
    * `globalRange` is the ORIGINAL domain width per dim (0-width
    * domains contribute 0 penalty — a constant column loses nothing
    * by generalization). One groupBy over the release, group-count-
    * sized output.
    */
  def releaseQuality(release: DataFrame, dims: Seq[String],
      globalRange: Map[String, Double]): DataFrame = {
    require(dims.nonEmpty, "releaseQuality needs dimensions")
    require(dims.forall(globalRange.contains),
      s"globalRange must cover $dims")
    val ncp = dims.map { d =>
      val w = globalRange(d)
      if (w > 0) (col(s"${d}_hi") - col(s"${d}_lo")) / lit(w)
      else lit(0.0)
    }.reduce(_ + _) / lit(dims.size.toDouble)
    release
      .groupBy(dims.flatMap(d =>
        Seq(col(s"${d}_lo"), col(s"${d}_hi"))): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("ncp_ticks", round(ncp * 1e6, 0).cast("long"))
      .withColumn("dm", col("n") * col("n"))
  }

  /** DP QUANTILE RELEASE — the exponential mechanism again, this
    * time for VALUE selection (Smith STOC'11's DP median): release a
    * per-group quantile of a banded numeric column without releasing
    * the distribution. Candidates are the group's distinct values;
    * a candidate's utility is −|rank(v) − q·n| (how far its running
    * count sits from the quantile target — sensitivity 1, one row
    * moves any rank by at most 1), and the mechanism draws with
    * probability ∝ exp(ε·u/2) — realized as argmax(ε·u/2 + Gumbel)
    * per group, the same one-shot identity as [[dpTopK]]. Groups are
    * DISJOINT, so the release satisfies ε-DP by parallel composition
    * (each person sits in one group). Rows with a NULL value are
    * excluded (no rank position, the t-closeness convention); ties
    * on the noisy score break by value ascending. Same deterministic
    * noise seam and NOT-DP-until-CSPRNG caveat as the rest of the
    * family; salt suffix `:qtl`.
    *
    * Scale shape: one (quasi × value)-histogram agg (partial aggs),
    * running-count windows over the HISTOGRAM per group (never over
    * rows — the t-closeness shape), a per-candidate score projection,
    * and a histogram-sized row_number pick.
    */
  def dpQuantile(df: DataFrame, quasiCols: Seq[String],
      valueTicks: Column, qTicks: Long = 500000L,
      epsilonTicks: Long = 1000000L, seed: Long = 0L): DataFrame = {
    require(quasiCols.nonEmpty, "dpQuantile needs group columns")
    require(qTicks > 0 && qTicks < 1000000L,
      "quantile must be in (0, 1) ticks")
    require(epsilonTicks > 0, "epsilon must be positive")
    val qs = quasiCols.map(col)
    val coef = epsilonTicks / 1e6 / 2.0
    val qFrac = qTicks / 1e6
    val hist = df
      .select(qs :+ valueTicks.cast("long").as("_v"): _*)
      .filter(col("_v").isNotNull)
      .groupBy(qs :+ col("_v"): _*)
      .agg(count(lit(1)).as("_n"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(qs: _*).orderBy(col("_v"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(qs: _*)
    hist
      .withColumn("_cum", sum(col("_n")).over(wCum))
      .withColumn("_tot", sum(col("_n")).over(wAll))
      .withColumn("_score",
        lit(coef) * -abs(col("_cum").cast("double") -
          lit(qFrac) * col("_tot").cast("double")) +
          gumbelDraw(noiseKey(quasiCols :+ "_v", s"$seed:qtl")))
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(qs: _*)
          .orderBy(col("_score").desc, col("_v"))))
      .filter(col("_rn") === 1)
      .select(qs :+ col("_v").as("released_q"): _*)
  }

  /** Publish a DP release INTO A VERSIONED TABLE with its privacy
    * budget on the ledger (r14 verdict missing #6, second half): the
    * release frame appends via an audited commit whose manifest
    * records `privacy.mechanism`, `privacy.epsilon_ticks` and (when
    * nonzero) `privacy.delta_ticks`, so the table's `auditLog()` —
    * the same compliance ledger deletion evidence rides — answers
    * "what (ε, δ) has this release table consumed"
    * ([[epsilonSpentTicks]] / [[deltaSpentTicks]]). Idempotent under
    * txn replay like any commit: a replayed release spends its ε
    * once.
    *
    * COMPOSITION ACCOUNTING (r15 verdict missing #7): releases
    * compose SEQUENTIALLY by default — spent ε (and δ) add. A
    * release that touches only one member of a DISJOINT row
    * partition of the table (a region, a tenant, a day shard) may
    * declare that member as `scope`: releases on DIFFERENT scopes
    * compose in PARALLEL (the combined mechanism sees each row once,
    * so the spend is the MAX across scopes, McSherry's parallel
    * composition), while releases on the SAME scope still add.
    * Unscoped releases read every row and add on top of the scoped
    * maximum. Disjointness is the CALLER's attestation — the engine
    * records it and accounts accordingly; mislabeling overlapping
    * scopes voids the guarantee, the same trust boundary as
    * declaring the sensitivity bounds.
    *
    * VACUUM SAFETY: the running per-scope state
    * (`privacy.budget_state`) and the composed totals ride on the
    * release manifest and fold FORWARD onto every later commit
    * (VersionedTable's carry-forward set), so the newest manifest —
    * which vacuum always retains — always carries the full budget
    * history, structurally.
    */
  def releaseDp(table: graft.store.VersionedTable, release: DataFrame,
      mechanism: String, epsilonTicks: Long,
      txnId: Option[String] = None, deltaTicks: Long = 0L,
      scope: Option[String] = None): Long = {
    require(epsilonTicks > 0, "epsilon must be positive")
    require(deltaTicks >= 0, "delta must be non-negative")
    scope.foreach(sc => require(
      sc.nonEmpty && sc != "*" && !sc.exists(";=:".contains(_)),
      s"scope '$sc' must be non-empty, not '*', and free of ';=:'"))
    val st = budgetState(table)
    val key = scope.getOrElse("*")
    val (e0, d0) = st.getOrElse(key, (0L, 0L))
    val st2 = st.updated(key,
      (Math.addExact(e0, epsilonTicks), Math.addExact(d0, deltaTicks)))
    require(st2.size <= MaxBudgetScopes + 1,
      s"privacy ledger holds ${st2.size - 1} scopes (max " +
        s"$MaxBudgetScopes) — scopes are coarse disjoint partitions " +
        "(regions, tenants), not per-row labels")
    val (teps, tdelta) = composedSpend(st2)
    table.commitAudited(release, Map(
      "privacy.mechanism" -> mechanism,
      "privacy.epsilon_ticks" -> epsilonTicks.toString,
      "privacy.epsilon_spent_total_ticks" -> teps.toString,
      "privacy.delta_spent_total_ticks" -> tdelta.toString,
      "privacy.budget_state" -> encodeBudgetState(st2)) ++
      (if (deltaTicks > 0)
        Map("privacy.delta_ticks" -> deltaTicks.toString)
      else Map.empty) ++
      scope.map("privacy.scope" -> _), txnId)
  }

  /** The most scopes a budget ledger may carry — scopes are coarse
    * disjoint partitions (regions, tenants, day shards); the state
    * string rides on every manifest, so it must stay small.
    */
  val MaxBudgetScopes: Int = 256

  /** [[releaseDp]] behind the BUDGET GATE: refuses (throws, loudly —
    * the house convention for silent-miss paths) when the ledger's
    * spent ε plus this release would exceed `capTicks`. The gate is
    * the point of keeping the ledger: sequential composition means a
    * table's cumulative ε is its real privacy guarantee, and a
    * pipeline that keeps releasing past the cap has no guarantee at
    * all. Check-then-commit races with a concurrent releaser are the
    * manifest protocol's single-writer caveat, same as every commit.
    */
  def releaseDpGated(table: graft.store.VersionedTable,
      release: DataFrame, mechanism: String, epsilonTicks: Long,
      capTicks: Long, txnId: Option[String] = None,
      deltaTicks: Long = 0L, scope: Option[String] = None,
      deltaCapTicks: Long = Long.MaxValue): Long = {
    require(capTicks > 0, "epsilon cap must be positive")
    // a replayed txn is already on the ledger — spend nothing, gate
    // nothing, return idempotently (releaseDp short-circuits too)
    if (!txnId.exists(table.txnCommitted)) {
      // gate on the COMPOSED prospective totals: a scoped release
      // under the running scope maximum costs nothing at the gate
      // (parallel composition), a same-scope or unscoped one adds
      val st = budgetState(table)
      val key = scope.getOrElse("*")
      val (e0, d0) = st.getOrElse(key, (0L, 0L))
      val (teps, tdelta) = composedSpend(st.updated(key,
        (Math.addExact(e0, epsilonTicks),
          Math.addExact(d0, deltaTicks))))
      require(teps <= capTicks,
        s"privacy budget exhausted: composed spend would be " +
          s"${teps / 1e6} of ${capTicks / 1e6} epsilon; release of " +
          s"${epsilonTicks / 1e6}${scope.fold("")(sc => s" (scope $sc)")} " +
          "refused")
      require(tdelta <= deltaCapTicks,
        s"privacy delta budget exhausted: composed spend would be " +
          s"${tdelta / 1e6} of ${deltaCapTicks / 1e6}")
    }
    releaseDp(table, release, mechanism, epsilonTicks, txnId,
      deltaTicks, scope)
  }

  /** Total ε (in ticks) spent by every DP release committed to
    * `table` under the composition rules of [[releaseDp]] — the
    * budget a data-governance gate compares against its cap before
    * allowing another release. Driver-side manifest reads via
    * `auditLog()`, O(versions).
    */
  def epsilonSpentTicks(table: graft.store.VersionedTable): Long =
    composedSpend(budgetState(table))._1

  /** Total δ (in ticks) spent, same composition rules. 0 for the
    * pure-ε mechanisms (Laplace, exponential).
    */
  def deltaSpentTicks(table: graft.store.VersionedTable): Long =
    composedSpend(budgetState(table))._2

  /** The per-scope running (ε, δ) sums, newest state on the ledger
    * ("*" = the unscoped/sequential bucket). Falls back for ledgers
    * predating the state key: the newest composed total, else the
    * per-release sum — both fold into "*" (everything sequential,
    * the conservative direction).
    */
  private[graft] def budgetState(
      table: graft.store.VersionedTable): Map[String, (Long, Long)] = {
    val rows = table.auditLog()
      .filter(col("key").isin("privacy.budget_state",
        "privacy.epsilon_spent_total_ticks", "privacy.epsilon_ticks"))
      .select(col("version"), col("key"), col("value"))
      .collect()
    val state = rows.filter(_.getString(1) == "privacy.budget_state")
      .sortBy(_.getLong(0)).lastOption
    state match {
      case Some(r) => decodeBudgetState(r.getString(2))
      case None =>
        val tots = rows
          .filter(_.getString(1) == "privacy.epsilon_spent_total_ticks")
          .map(_.getString(2).toLong)
        if (tots.nonEmpty) Map("*" -> ((tots.max, 0L)))
        else {
          val per = rows.filter(_.getString(1) == "privacy.epsilon_ticks")
            .map(_.getString(2).toLong)
          if (per.isEmpty) Map.empty else Map("*" -> ((per.sum, 0L)))
        }
    }
  }

  /** Composed (ε, δ) under sequential + parallel composition: the
    * unscoped bucket adds on top of the MAX across disjoint scopes
    * (each row of a scoped release is seen by at most one scope's
    * mechanisms, plus every unscoped one).
    */
  private[graft] def composedSpend(
      st: Map[String, (Long, Long)]): (Long, Long) = {
    val (ge, gd) = st.getOrElse("*", (0L, 0L))
    val scoped = st.view.filterKeys(_ != "*").values.toSeq
    (Math.addExact(ge, if (scoped.isEmpty) 0L else scoped.map(_._1).max),
      Math.addExact(gd, if (scoped.isEmpty) 0L else scoped.map(_._2).max))
  }

  private def encodeBudgetState(st: Map[String, (Long, Long)]): String =
    st.toSeq.sortBy(_._1)
      .map { case (sc, (e, d)) => s"$sc=$e:$d" }.mkString(";")

  private def decodeBudgetState(s: String): Map[String, (Long, Long)] =
    s.split(';').filter(_.nonEmpty).map { part =>
      val Array(sc, ed) = part.split('=')
      val Array(e, d) = ed.split(':')
      sc -> ((e.toLong, d.toLong))
    }.toMap

  /** GENERALIZATION release — the anonymization trio's third
    * strategy (suppress drops rows, [[dpCounts]] adds noise,
    * generalization COARSENS): widen a numeric quasi-identifier's
    * band until every (static quasi cols, band) group reaches k,
    * then release at that width. The width ladder is deterministic —
    * baseWidth · 2^j for j = 0..maxDoublings, smallest passing j
    * wins (the classic single-attribute full-domain generalization);
    * if even the coarsest width leaves small groups, the residual
    * suppresses ([[kSuppress]] at the chosen width — a no-op
    * whenever the width passes outright, so the release ALWAYS
    * satisfies k-anonymity by construction). The raw numeric value
    * never ships — only the band and the width that was needed.
    *
    * Scale shape (r14 verdict #8 — replaces the rows × (j+1) ladder
    * explode): the ladder is derivable from the BASE-WIDTH band
    * histogram alone, because floor(floor(v/w)/2^j) = floor(v/(w·2^j))
    * — halving a band index is exactly doubling the width. So ONE
    * pass over the corpus builds the base histogram
    * (group-count-sized, partial aggs), the (j+1)-level ladder
    * explodes the HISTOGRAM (tiny), and a (j+1)-row driver read picks
    * the width; then the suppression semi-join. No iteration over the
    * corpus, no row multiplication.
    */
  def generalize(df: DataFrame, staticQuasi: Seq[String],
      numCol: String, k: Long, baseWidth: Double,
      maxDoublings: Int, sensitive: Option[Column] = None,
      l: Long = 1L): DataFrame = {
    require(baseWidth > 0 && maxDoublings >= 0 && k >= 1,
      "generalize needs baseWidth > 0, maxDoublings >= 0, k >= 1")
    // 1L << 63 wraps negative (ADVICE r14): fail loudly, the file's
    // convention — nobody doubles a band width 62 times on purpose
    require(maxDoublings <= 62,
      s"maxDoublings=$maxDoublings overflows the 2^j width ladder " +
        "(max 62)")
    val widths = (0 to maxDoublings).map(j => baseWidth * (1L << j))
    val statics = staticQuasi.map(col)
    val mins = df
      .select(statics :+
        floor(col(numCol) / baseWidth).cast("long").as("_b"): _*)
      .groupBy(statics :+ col("_b"): _*)
      .agg(count(lit(1)).as("_n"))
      // ladder rollup over the histogram: band at width w·2^j is
      // floor(base band / 2^j) — float-exact (2^j is an exact double,
      // |_b| ≪ 2^53)
      .withColumn("_j", explode(lit((0 to maxDoublings).toArray)))
      .withColumn("_bj",
        floor(col("_b") / pow(lit(2.0), col("_j"))).cast("long"))
      .groupBy((col("_j") +: statics) :+ col("_bj"): _*)
      .agg(sum(col("_n")).as("_n"))
      .groupBy(col("_j")).agg(min(col("_n")).as("_mn"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val j = (0 to maxDoublings).find(j => mins.get(j).exists(_ >= k))
      .getOrElse(maxDoublings)
    val w = widths(j)
    val banded = df
      .withColumn("band", floor(col(numCol) / w).cast("long"))
      .withColumn("width", lit(w))
    kSuppress(banded, staticQuasi :+ "band", k, sensitive, l)
      .drop(numCol)
  }

  /** Q175 — privacy census over `customer`: quasi-identifiers
    * (nation, market segment, spend band = floor(acctbal / 2000)),
    * sensitive attribute = the spend band's FINER sibling
    * (floor(acctbal / 500)): per group, size, sensitive diversity,
    * and the k=8 / l=3 risk flags.
    */
  def q175KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
      .withColumn("spend_band",
        floor($"c_acctbal" / 2000.0).cast("long"))
    kAnonymityCensus(cust,
        Seq("c_nationkey", "c_mktsegment", "spend_band"),
        floor($"c_acctbal" / 500.0).cast("long"), k = 8L, l = 3L)
      .orderBy($"c_nationkey", $"c_mktsegment", $"spend_band")
  }

  /** DuckDB oracle for [[q175KAnonymity]]. The sensitive expression
    * wraps in coalesce(…::VARCHAR, chr(2)) because the ENGINE counts
    * a NULL sensitive value as one distinct value (its own group in
    * the two-level agg) while SQL count(DISTINCT) ignores NULLs — on
    * a nullable sensitive column the bare form would under-count
    * l_div by one (r14 ADVICE; the TPC-H fixture is non-null, so the
    * values are unchanged there).
    */
  def kAnonymityOracleSql(k: Long = 8L, l: Long = 3L): String = {
    val sens =
      "coalesce((floor(c_acctbal / 500.0)::BIGINT)::VARCHAR, chr(2))"
    s"""SELECT c_nationkey, c_mktsegment,
       |  floor(c_acctbal / 2000.0)::BIGINT AS spend_band,
       |  count(*)::BIGINT AS group_n,
       |  count(DISTINCT $sens) AS l_div,
       |  count(*) < $k AS k_risk,
       |  count(DISTINCT $sens) < $l AS l_risk
       |FROM customer
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin
  }

  /** Q176 — the suppression release at the q175 quasi-identifiers and
    * k=8: the customers that survive, with their group size (proof
    * every released row sits in a group of ≥ k).
    */
  def q176KSuppress(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
      .withColumn("spend_band",
        floor($"c_acctbal" / 2000.0).cast("long"))
    kSuppress(cust, Seq("c_nationkey", "c_mktsegment", "spend_band"),
        k = 8L)
      .select($"c_custkey", $"c_nationkey", $"c_mktsegment", $"spend_band")
      .orderBy($"c_custkey")
  }

  /** Q177 — DP count release over `customer` by (nation, segment) at
    * ε = 0.5 (scale b = 2), seed 177: every group released with
    * calibrated integer Laplace noise, clamped at 0.
    */
  def q177DpCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dpCounts(Tables.load(spark, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"),
        epsilonTicks = 500000L, seed = 177L)
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  /** DuckDB oracle for [[q177DpCounts]] — the same inverse-CDF
    * Laplace draw from the same fingerprint-derived uniform.
    */
  def dpCountsOracleSql(epsilonTicks: Long = 500000L,
      seed: Long = 177L): String = {
    val b = 1e6 / epsilonTicks
    val key = "concat_ws(chr(1), coalesce(c_nationkey::VARCHAR, chr(2)), " +
      s"coalesce(c_mktsegment::VARCHAR, chr(2)), '$seed')"
    s"""WITH g AS (
       |  SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n,
       |    $key AS gk
       |  FROM customer GROUP BY 1, 2),
       | u AS (SELECT c_nationkey, c_mktsegment, n,
       |    ((((${TextAnalysis.fingerprintSql("gk")}) * 2654435761)
       |        % 2147483648 + 0.5)
       |      / 2147483648.0) - 0.5 AS c
       |  FROM g)
       |SELECT c_nationkey, c_mktsegment,
       |  greatest(0, n + round(-$b * sign(c) * ln(1.0 - 2.0 * abs(c)),
       |    0)::BIGINT) AS released_n
       |FROM u
       |ORDER BY c_nationkey, c_mktsegment""".stripMargin
  }

  /** Q178 — the generalization release over `customer`: static quasi
    * column `c_mktsegment`, the account balance generalized on the
    * 500 · 2^j ladder (j ≤ 5) to the smallest width where every
    * (segment, band) group reaches k = 25; residual suppression
    * guarantees the release.
    */
  def q178Generalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    generalize(Tables.load(spark, dir, "customer"),
        Seq("c_mktsegment"), "c_acctbal",
        k = 25L, baseWidth = 500.0, maxDoublings = 5)
      .select($"c_custkey", $"c_mktsegment", $"band", $"width")
      .orderBy($"c_custkey")
  }

  /** DuckDB oracle for [[q178Generalize]] — the same ladder, pick,
    * and residual suppression.
    */
  def generalizeOracleSql(k: Long = 25L, baseWidth: Double = 500.0,
      maxDoublings: Int = 5): String = {
    val widths = (0 to maxDoublings)
      .map(j => s"($j, ${baseWidth * (1L << j)})").mkString(", ")
    s"""WITH W(j, w) AS (VALUES $widths),
       | g AS (SELECT j, w, c_mktsegment,
       |     floor(c_acctbal / w)::BIGINT AS band, count(*) AS n
       |   FROM customer CROSS JOIN W GROUP BY 1, 2, 3, 4),
       | m AS (SELECT j, min(n) AS mn FROM g GROUP BY 1),
       | pick AS (SELECT coalesce(
       |     (SELECT min(j) FROM m WHERE mn >= $k), $maxDoublings) AS j),
       | pw AS (SELECT w FROM W JOIN pick USING (j)),
       | rel AS (SELECT c_custkey, c_mktsegment,
       |     floor(c_acctbal / pw.w)::BIGINT AS band, pw.w AS width,
       |     count(*) OVER (PARTITION BY c_mktsegment,
       |       floor(c_acctbal / pw.w)::BIGINT) AS gn
       |   FROM customer, pw)
       |SELECT c_custkey, c_mktsegment, band, width
       |FROM rel WHERE gn >= $k
       |ORDER BY c_custkey""".stripMargin
  }

  /** DuckDB oracle for [[q176KSuppress]]. */
  def kSuppressOracleSql(k: Long = 8L): String =
    s"""SELECT c_custkey, c_nationkey, c_mktsegment, spend_band
       |FROM (
       |  SELECT c_custkey, c_nationkey, c_mktsegment,
       |    floor(c_acctbal / 2000.0)::BIGINT AS spend_band,
       |    count(*) OVER (PARTITION BY c_nationkey, c_mktsegment,
       |      floor(c_acctbal / 2000.0)::BIGINT) AS gn
       |  FROM customer)
       |WHERE gn >= $k
       |ORDER BY c_custkey""".stripMargin

  /** Q179 — the k+l suppression release (r14 verdict missing #4): the
    * q175 quasi set at k=8 AND l-diversity l=3 on the finer spend
    * band. The q175 census itself reports l-risky groups that plain
    * q176 releases; this is the release that refuses them.
    */
  def q179KlSuppress(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
      .withColumn("spend_band",
        floor($"c_acctbal" / 2000.0).cast("long"))
    kSuppress(cust, Seq("c_nationkey", "c_mktsegment", "spend_band"),
        k = 8L,
        sensitive = Some(floor($"c_acctbal" / 500.0).cast("long")),
        l = 3L)
      .select($"c_custkey", $"c_nationkey", $"c_mktsegment",
        $"spend_band")
      .orderBy($"c_custkey")
  }

  /** DuckDB oracle for [[q179KlSuppress]] — group stats in a CTE
    * (count + NULL-as-a-value distinct, mirroring the census), joined
    * back; the fixture's quasi columns are non-null so the equi-join
    * matches the engine's null-safe semi-join.
    */
  def klSuppressOracleSql(k: Long = 8L, l: Long = 3L): String =
    s"""WITH c AS (
       |  SELECT c_custkey, c_nationkey, c_mktsegment,
       |    floor(c_acctbal / 2000.0)::BIGINT AS spend_band,
       |    coalesce((floor(c_acctbal / 500.0)::BIGINT)::VARCHAR,
       |      chr(2)) AS sens
       |  FROM customer),
       | g AS (
       |  SELECT c_nationkey, c_mktsegment, spend_band,
       |    count(*) AS gn, count(DISTINCT sens) AS ld
       |  FROM c GROUP BY 1, 2, 3)
       |SELECT c_custkey, c_nationkey, c_mktsegment, spend_band
       |FROM c JOIN g USING (c_nationkey, c_mktsegment, spend_band)
       |WHERE gn >= $k AND ld >= $l
       |ORDER BY c_custkey""".stripMargin

  /** Q181 — DP SUM release over `customer` by market segment:
    * account balance in integer cents, clamped per row to
    * [0, 500000] (negative balances contribute 0, balances above
    * $$5000 contribute the cap — bounding the sensitivity at 500000
    * ticks), ε = 1.0, seed 181.
    */
  def q181DpSum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dpSum(Tables.load(spark, dir, "customer"), Seq("c_mktsegment"),
        round($"c_acctbal" * 100, 0).cast("long"),
        loTicks = 0L, hiTicks = 500000L,
        epsilonTicks = 1000000L, seed = 181L)
      .orderBy($"c_mktsegment")
  }

  /** DuckDB oracle for [[q181DpSum]] — same clamp, same exact long
    * sum, same noise dag.
    */
  def dpSumOracleSql(loTicks: Long = 0L, hiTicks: Long = 500000L,
      epsilonTicks: Long = 1000000L, seed: Long = 181L): String = {
    val b = (hiTicks - loTicks) * 1e6 / epsilonTicks
    val key = "concat_ws(chr(1), coalesce(c_mktsegment::VARCHAR, " +
      s"chr(2)), '$seed:sum')"
    s"""WITH g AS (
       |  SELECT c_mktsegment,
       |    sum(greatest(least(round(c_acctbal * 100, 0)::BIGINT,
       |      $hiTicks), $loTicks))::BIGINT AS s,
       |    $key AS gk
       |  FROM customer GROUP BY 1),
       | u AS (SELECT c_mktsegment, s,
       |    ((((${TextAnalysis.fingerprintSql("gk")}) * 2654435761)
       |        % 2147483648 + 0.5)
       |      / 2147483648.0) - 0.5 AS c
       |  FROM g)
       |SELECT c_mktsegment,
       |  s + round(-$b * sign(c) * ln(1.0 - 2.0 * abs(c)), 0)::BIGINT
       |    AS released_sum
       |FROM u
       |ORDER BY c_mktsegment""".stripMargin
  }

  /** Q192 — GAUSSIAN-MECHANISM sum release over `customer` by
    * (segment, nation): cents spend sums, contributions clamped to
    * [0, 500000], (ε, δ) = (0.5, 1e-3), seed 192 — the release whose
    * δ actually lands on the ledger (see [[releaseDp]]).
    */
  def q192DpSumGaussian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dpSumGaussian(Tables.load(spark, dir, "customer"),
        Seq("c_mktsegment", "c_nationkey"),
        round($"c_acctbal" * 100, 0).cast("long"),
        loTicks = 0L, hiTicks = 500000L,
        epsilonTicks = 500000L, deltaTicks = 1000L, seed = 192L)
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  /** DuckDB oracle for [[q192DpSumGaussian]] — same clamp, same exact
    * long sum, same Box–Muller dag; σ inlined as the driver-computed
    * double (shortest-round-trip literal parses back bit-identical).
    */
  def dpSumGaussianOracleSql(loTicks: Long = 0L,
      hiTicks: Long = 500000L, epsilonTicks: Long = 500000L,
      deltaTicks: Long = 1000L, seed: Long = 192L): String = {
    val sigma = gaussianSigma(loTicks, hiTicks, epsilonTicks, deltaTicks)
    val key =
      "concat_ws(chr(1), coalesce(c_mktsegment::VARCHAR, chr(2)), " +
        s"coalesce(c_nationkey::VARCHAR, chr(2)), '$seed:gs')"
    def unif(mult: String): String =
      s"(((f * $mult) % 2147483648 + 0.5) / 2147483648.0)"
    s"""WITH g AS (
       |  SELECT c_mktsegment, c_nationkey,
       |    sum(greatest(least(round(c_acctbal * 100, 0)::BIGINT,
       |      $hiTicks), $loTicks))::BIGINT AS s,
       |    $key AS gk
       |  FROM customer GROUP BY 1, 2),
       | fpd AS (SELECT c_mktsegment, c_nationkey, s,
       |    (${TextAnalysis.fingerprintSql("gk")}) AS f
       |  FROM g),
       | u AS (SELECT c_mktsegment, c_nationkey, s,
       |    ${unif("2654435761")} AS u1, ${unif("2246822519")} AS u2
       |  FROM fpd)
       |SELECT c_mktsegment, c_nationkey,
       |  s + round($sigma * (sqrt(-2.0 * ln(u1))
       |      * cos(${2.0 * math.Pi} * u2)), 0)::BIGINT AS released_sum
       |FROM u
       |ORDER BY c_mktsegment, c_nationkey""".stripMargin
  }

  /** Q182 — DP MEAN release over `customer` by nation: mean account
    * balance in cents, contributions clamped to [0, 1000000], total
    * ε = 2.0 split evenly between the sum and the count, seed 182.
    */
  def q182DpMean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dpMean(Tables.load(spark, dir, "customer"), Seq("c_nationkey"),
        round($"c_acctbal" * 100, 0).cast("long"),
        loTicks = 0L, hiTicks = 1000000L,
        epsilonTicks = 2000000L, seed = 182L)
      .orderBy($"c_nationkey")
  }

  /** Q183 — DP top-k selection over `customer`: the 10 largest
    * (nation, segment) groups by the exponential mechanism at total
    * ε = 2.0 (ε/k = 0.2 per selection), seed 183 — group identities
    * and ranks ship, counts never do.
    */
  def q183DpTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dpTopK(Tables.load(spark, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 10,
        epsilonTicks = 2000000L, seed = 183L)
      .orderBy($"rank")
  }

  /** DuckDB oracle for [[q183DpTopK]] — the same Gumbel-perturbed
    * scores, same total order (score desc, quasi asc), top k.
    */
  def dpTopKOracleSql(k: Int = 10, epsilonTicks: Long = 2000000L,
      seed: Long = 183L): String = {
    val coef = epsilonTicks / 1e6 / k / 2.0
    val key = "concat_ws(chr(1), coalesce(c_nationkey::VARCHAR, " +
      s"chr(2)), coalesce(c_mktsegment::VARCHAR, chr(2)), '$seed:topk')"
    s"""WITH g AS (
       |  SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n,
       |    $key AS gk
       |  FROM customer GROUP BY 1, 2),
       | s AS (SELECT c_nationkey, c_mktsegment,
       |    CAST($coef AS DOUBLE) * n
       |      - ln(-ln((((${TextAnalysis.fingerprintSql("gk")})
       |        * 2654435761) % 2147483648 + 0.5)
       |      / 2147483648.0)) AS score
       |  FROM g)
       |SELECT c_nationkey, c_mktsegment,
       |  row_number() OVER (ORDER BY score DESC, c_nationkey,
       |    c_mktsegment) AS rank
       |FROM s
       |ORDER BY score DESC, c_nationkey, c_mktsegment
       |LIMIT $k""".stripMargin
  }

  /** Q184 — the anonymization QUALITY census of the q180 Mondrian
    * release: per released partition, size, normalized certainty
    * penalty (ticks), and discernibility cost — the evidence a
    * release pipeline tunes k against.
    */
  def q184ReleaseQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
    val gr = cust.agg(
      (max($"c_acctbal") - min($"c_acctbal")).cast("double").as("g1"),
      (max($"c_nationkey") - min($"c_nationkey")).cast("double")
        .as("g2")).head()
    val ranges = Map(
      "c_acctbal" -> (if (gr.isNullAt(0)) 0.0 else gr.getDouble(0)),
      "c_nationkey" -> (if (gr.isNullAt(1)) 0.0 else gr.getDouble(1)))
    releaseQuality(Mondrian.q180Mondrian(spark, dir),
        Seq("c_acctbal", "c_nationkey"), ranges)
      .orderBy($"c_acctbal_lo", $"c_nationkey_lo")
  }

  /** DuckDB oracle for [[q184ReleaseQuality]] — the q180 Mondrian
    * oracle as a CTE, metrics recomputed over its released ranges
    * with global domain widths from the original table.
    */
  def releaseQualityOracleSql(): String =
    s"""WITH rel AS (${Mondrian.mondrianOracleSql()}),
       | gr AS (SELECT max(c_acctbal) - min(c_acctbal) AS g1,
       |   (max(c_nationkey) - min(c_nationkey))::DOUBLE AS g2
       |   FROM customer)
       |SELECT c_acctbal_lo, c_acctbal_hi, c_nationkey_lo,
       |  c_nationkey_hi, count(*)::BIGINT AS n,
       |  round(((c_acctbal_hi - c_acctbal_lo) / g.g1
       |      + (c_nationkey_hi - c_nationkey_lo) / g.g2) / 2.0 * 1e6,
       |    0)::BIGINT AS ncp_ticks,
       |  (count(*) * count(*))::BIGINT AS dm
       |FROM rel, gr g
       |GROUP BY 1, 2, 3, 4, g.g1, g.g2
       |ORDER BY 1, 3""".stripMargin

  /** Q187 — quasi-identifier discovery over `customer`: candidates
    * (market segment, nation, coarse spend band, FINE spend band),
    * all combinations up to arity 2, k = 8 — which combinations
    * would re-identify if the extract shipped. The fine band
    * (floor(acctbal/100), ~110 values) is the deliberately planted
    * hazard: a precise-looking numeric column races toward
    * singletons when paired with anything else, the way
    * (ZIP, birthdate) does in Sweeney's original measurement —
    * exactly the column a scan must catch BEFORE the q175-style
    * census is even configured.
    */
  def q187QuasiScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
      .withColumn("spend_band",
        floor($"c_acctbal" / 2000.0).cast("long"))
      .withColumn("fine_band",
        floor($"c_acctbal" / 100.0).cast("long"))
    quasiScan(cust,
        Seq("c_mktsegment", "c_nationkey", "spend_band",
          "fine_band"), maxArity = 2, k = 8L)
      .orderBy($"combo")
  }

  /** DuckDB oracle for [[q187QuasiScan]] — one plain GROUP BY per
    * combination, UNION ALL'd (the oracle pays the per-combo passes
    * the engine's single grouping-sets plan avoids).
    */
  def quasiScanOracleSql(k: Long = 8L): String = {
    val candidates = Seq("c_mktsegment", "c_nationkey", "spend_band",
      "fine_band")
    val combos = (1 to 2).flatMap(a => candidates.combinations(a))
    val parts = combos.map { c =>
      s"""SELECT '${c.mkString("+")}' AS combo, ${c.size} AS arity,
         |  count(*)::BIGINT AS n_groups,
         |  sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT
         |    AS singleton_groups,
         |  sum(CASE WHEN n < $k THEN n ELSE 0 END)::BIGINT
         |    AS rows_at_risk
         |FROM (SELECT count(*)::BIGINT AS n FROM c
         |  GROUP BY ${c.mkString(", ")}) t""".stripMargin
    }
    s"""WITH c AS (SELECT c_mktsegment, c_nationkey,
       |    floor(c_acctbal / 2000.0)::BIGINT AS spend_band,
       |    floor(c_acctbal / 100.0)::BIGINT AS fine_band
       |  FROM customer)
       |SELECT * FROM (
       |${parts.mkString("\nUNION ALL\n")}) u
       |ORDER BY combo""".stripMargin
  }

  /** Q189 — DP median release over `customer`: per (segment, nation)
    * group, the 500-band spend median by the exponential mechanism at
    * ε = 1.0, seed 189. The utility/noise balance is MEASURED at both
    * sfs: at sf0.1 (~120-row groups) 18 of 125 groups release a
    * neighbor of the utility-argmax band (max 4 bands off); at
    * sf0.01 (~12-row groups) 77 of 125 deviate — smaller groups buy
    * less accuracy at the same ε, which is the mechanism's honest
    * trade.
    */
  def q189DpQuantile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dpQuantile(Tables.load(spark, dir, "customer"),
        Seq("c_mktsegment", "c_nationkey"),
        floor($"c_acctbal" / 500.0).cast("long"),
        qTicks = 500000L, epsilonTicks = 1000000L, seed = 189L)
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  /** DuckDB oracle for [[q189DpQuantile]] — same histogram, same
    * running counts, same Gumbel-perturbed utility, same tiebreak.
    */
  def dpQuantileOracleSql(qTicks: Long = 500000L,
      epsilonTicks: Long = 1000000L, seed: Long = 189L): String = {
    val coef = epsilonTicks / 1e6 / 2.0
    val qFrac = qTicks / 1e6
    val key = "concat_ws(chr(1), coalesce(c_mktsegment::VARCHAR, " +
      "chr(2)), coalesce(c_nationkey::VARCHAR, chr(2)), " +
      s"coalesce(v::VARCHAR, chr(2)), '$seed:qtl')"
    s"""WITH c AS (SELECT c_mktsegment, c_nationkey,
       |    floor(c_acctbal / 500.0)::BIGINT AS v
       |  FROM customer WHERE c_acctbal IS NOT NULL),
       | h AS (SELECT c_mktsegment, c_nationkey, v,
       |    count(*)::BIGINT AS n FROM c GROUP BY 1, 2, 3),
       | s AS (SELECT c_mktsegment, c_nationkey, v,
       |    sum(n) OVER (PARTITION BY c_mktsegment, c_nationkey
       |      ORDER BY v) AS cum,
       |    sum(n) OVER (PARTITION BY c_mktsegment, c_nationkey)
       |      AS tot,
       |    $key AS gk
       |  FROM h),
       | sc AS (SELECT c_mktsegment, c_nationkey, v,
       |    CAST($coef AS DOUBLE)
       |      * (-abs(cum::DOUBLE - CAST($qFrac AS DOUBLE)
       |        * tot::DOUBLE))
       |      - ln(-ln((((${TextAnalysis.fingerprintSql("gk")})
       |          * 2654435761) % 2147483648 + 0.5)
       |        / 2147483648.0)) AS score
       |  FROM s),
       | r AS (SELECT c_mktsegment, c_nationkey, v, row_number()
       |    OVER (PARTITION BY c_mktsegment, c_nationkey
       |      ORDER BY score DESC, v) AS rn
       |  FROM sc)
       |SELECT c_mktsegment, c_nationkey, v AS released_q
       |FROM r WHERE rn = 1
       |ORDER BY c_mktsegment, c_nationkey""".stripMargin
  }

  /** Q185 — t-closeness census over `customer`: quasi (market
    * segment, nation), sensitive = the floor(acctbal/2000) spend
    * band, t = 0.06: per group, size, EMD from the global spend
    * distribution in ticks, and the risk flag. The sensitive
    * attribute is INDEPENDENT of the quasi columns here — that is
    * the regime t-closeness audits (a quasi-derived sensitive, like
    * a finer band of a quasi band, makes every group trivially
    * far-from-global); the flags are non-vacuous BOTH directions at
    * BOTH sfs (101/125 risky at sf0.01's ~12-row groups, 4/125 at
    * sf0.1's ~120-row groups — empirical EMD shrinks as groups grow).
    */
  def q185TCloseness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tClosenessCensus(Tables.load(spark, dir, "customer"),
        Seq("c_mktsegment", "c_nationkey"),
        floor($"c_acctbal" / 2000.0).cast("long"), tTicks = 60000L)
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  /** Q186 — the t-suppression release at the q185 parameters: the
    * customers whose group's sensitive distribution stays within
    * t = 0.06 EMD of the global one.
    */
  def q186TSuppress(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tSuppress(Tables.load(spark, dir, "customer"),
        Seq("c_mktsegment", "c_nationkey"),
        floor($"c_acctbal" / 2000.0).cast("long"), tTicks = 60000L)
      .select($"c_custkey", $"c_mktsegment", $"c_nationkey")
      .orderBy($"c_custkey")
  }

  /** Shared DuckDB CTE chain computing per-group EMD for the q185
    * quasi/sensitive shape — the census and suppression oracles both
    * build on it.
    */
  private def tClosenessCtes: String =
    s"""c AS (
       |  SELECT c_custkey, c_mktsegment, c_nationkey,
       |    floor(c_acctbal / 2000.0)::BIGINT AS sens
       |  FROM customer WHERE c_acctbal IS NOT NULL),
       | h AS (SELECT c_mktsegment, c_nationkey, sens,
       |    count(*)::BIGINT AS cnt FROM c GROUP BY 1, 2, 3),
       | g AS (SELECT sens, count(*)::BIGINT AS gcnt FROM c GROUP BY 1),
       | tot AS (SELECT count(*)::BIGINT AS N FROM c),
       | grp AS (SELECT c_mktsegment, c_nationkey,
       |    sum(cnt)::BIGINT AS ng FROM h GROUP BY 1, 2),
       | dense AS (SELECT grp.c_mktsegment, grp.c_nationkey, grp.ng,
       |    g.sens, g.gcnt, coalesce(h.cnt, 0) AS cnt
       |  FROM grp CROSS JOIN g
       |  LEFT JOIN h ON h.c_mktsegment = grp.c_mktsegment
       |    AND h.c_nationkey = grp.c_nationkey AND h.sens = g.sens),
       | cum AS (SELECT c_mktsegment, c_nationkey, ng,
       |    sum(cnt) OVER (PARTITION BY c_mktsegment, c_nationkey
       |      ORDER BY sens) AS cumg,
       |    sum(gcnt) OVER (PARTITION BY c_mktsegment, c_nationkey
       |      ORDER BY sens) AS cuma,
       |    tot.N AS N
       |  FROM dense, tot),
       | terms AS (SELECT c_mktsegment, c_nationkey, ng,
       |    round(1e6 * abs(cumg::DOUBLE / ng - cuma::DOUBLE / N),
       |      0)::BIGINT AS tt
       |  FROM cum),
       | e AS (SELECT c_mktsegment, c_nationkey, max(ng) AS group_n,
       |    sum(tt)::BIGINT AS s, count(*)::BIGINT AS d
       |  FROM terms GROUP BY 1, 2),
       | emd AS (SELECT c_mktsegment, c_nationkey, group_n,
       |    CASE WHEN d > 1
       |      THEN round(s::DOUBLE / (d - 1), 0)::BIGINT
       |      ELSE 0 END AS emd_ticks
       |  FROM e)""".stripMargin

  /** DuckDB oracle for [[q185TCloseness]]. */
  def tClosenessOracleSql(tTicks: Long = 60000L): String =
    s"""WITH $tClosenessCtes
       |SELECT c_mktsegment, c_nationkey, group_n, emd_ticks,
       |  emd_ticks > $tTicks AS t_risk
       |FROM emd
       |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** DuckDB oracle for [[q186TSuppress]]. The release joins the FULL
    * table — NOT the NULL-filtered `c` CTE — because the engine's
    * semi-join gates on the quasi key alone: a NULL-sensitive row of
    * a safe group is released (it contributed no distance evidence,
    * but it belongs to the group); only the DISTANCE computation
    * excludes NULL values. (r15 review finding; the non-null fixture
    * made both forms agree.)
    */
  def tSuppressOracleSql(tTicks: Long = 60000L): String =
    s"""WITH $tClosenessCtes
       |SELECT t.c_custkey, t.c_mktsegment, t.c_nationkey
       |FROM customer t JOIN emd ON t.c_mktsegment = emd.c_mktsegment
       |  AND t.c_nationkey = emd.c_nationkey
       |WHERE emd.emd_ticks <= $tTicks
       |ORDER BY t.c_custkey""".stripMargin

  /** DuckDB oracle for [[q182DpMean]] — two independent clamp/sum, the ONE
    * `:mean` fingerprint remixed by the two multipliers, the
    * noised-long division released as double.
    */
  def dpMeanOracleSql(loTicks: Long = 0L, hiTicks: Long = 1000000L,
      epsilonTicks: Long = 2000000L, seed: Long = 182L): String = {
    val epsSum = epsilonTicks / 2
    val epsCnt = epsilonTicks - epsSum
    val bSum = (hiTicks - loTicks) * 1e6 / epsSum
    val bCnt = 1e6 / epsCnt.toDouble
    val key =
      "concat_ws(chr(1), coalesce(c_nationkey::VARCHAR, chr(2)), " +
        s"'$seed:mean')"
    def draw(mult: String, b: Double) =
      s"""round(-$b * sign((((f * $mult) % 2147483648 + 0.5)
         |      / 2147483648.0) - 0.5)
         |    * ln(1.0 - 2.0 * abs((((f * $mult) % 2147483648 + 0.5)
         |      / 2147483648.0) - 0.5)), 0)::BIGINT""".stripMargin
    s"""WITH g AS (
       |  SELECT c_nationkey,
       |    sum(greatest(least(round(c_acctbal * 100, 0)::BIGINT,
       |      $hiTicks), $loTicks))::BIGINT AS s,
       |    count(*)::BIGINT AS n,
       |    $key AS gk
       |  FROM customer GROUP BY 1),
       | fpd AS (SELECT c_nationkey, s, n,
       |    (${TextAnalysis.fingerprintSql("gk")}) AS f
       |  FROM g)
       |SELECT c_nationkey,
       |  (s + ${draw("2654435761", bSum)})
       |    / greatest(1, n + ${draw("2246822519", bCnt)}) AS released_mean
       |FROM fpd
       |ORDER BY c_nationkey""".stripMargin
  }
}
