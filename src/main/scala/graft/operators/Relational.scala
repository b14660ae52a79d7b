package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The declared relational query inventory (SURVEY.md §2.12 Q1–Q13),
  * expressed Spark-first with the DataFrame API so Catalyst owns
  * pushdown, pruning, join strategy and AQE re-planning.
  *
  * Column aliases here are the contract with the DuckDB oracle SQL in
  * [[graft.SparkEntry.oracleSql]] — keep them in sync.
  *
  * Reference provenance (all /root/reference): scans `main.py:98`,
  * projections `main.py:128-129`, group-by agg `core/utils.py:199-215`,
  * latest-per-key online-store semantics
  * `core/feature_store_manager.py:101,165-168`, enrich join + cold-start
  * defaults `core/inference.py:89-126`, existence probe
  * `core/feature_store_manager.py:155-172`, training sort
  * `core/feature_store_manager.py:141`, timestamp wire format
  * `core/utils.py:226-228`.
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Q1 — scan + projection + cast (S1/S3/P1/F4). Projection reaches the
    * parquet scan as ReadSchema (only 4 of 11 lineitem columns read).
    */
  def q1ScanProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_quantity".cast("double").as("qty"),
        $"l_extendedprice", $"l_linenumber")
      .orderBy($"l_orderkey", $"l_linenumber")
      .select($"l_orderkey", $"qty", $"l_extendedprice")
  }

  /** Q2 — hash group-by multi-agg: the `engineer_features` shape
    * (reference `core/utils.py:199-215`) over `events`. `max_by` replaces
    * pandas file-order `last` — deterministic under shuffle (SURVEY §2.4
    * A1 trap). Catalyst plans partial (map-side) + final aggregation, so
    * the shuffle carries one row per (partition, user_id), not raw rows.
    */
  def q2AggFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .groupBy($"user_id")
      .agg(
        max($"ts").as("last_ts"),
        avg($"value").as("avg_value"),
        max_by($"value", $"ts").as("latest_value"),
        count(lit(1)).as("n"))
      .orderBy($"user_id")
  }

  /** Q3 — latest-per-key window dedup: the online-store "latest view"
    * (W2; reference online store semantics
    * `core/feature_store_manager.py:101`). Tie-break on event_id for
    * determinism. One shuffle on user_id; at scale this is the
    * compaction pass of the online view.
    */
  def q3LatestPerKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .orderBy($"user_id")
  }

  /** Q4 — left-outer enrich + coalesce cold-start defaults (J1 + P4;
    * reference `core/inference.py:89-126`: existing customer → stored
    * averages, new customer → avg=value, hist=0). The aggregated
    * feature side is one row per USER — smaller than the event stream
    * but user-domain-sized, so the join is UNHINTED: AQE broadcasts
    * it while small and falls back to a shuffle when the user base
    * outgrows executor memory (the SCALE.md enrichment note).
    */
  def q4EnrichJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = t(spark, dir, "events")
    val features = e.groupBy($"user_id")
      .agg(avg($"value").as("f_avg_value"), count(lit(1)).as("f_n"))
    e.join(features, Seq("user_id"), "left_outer")
      .select(
        $"event_id", $"user_id", $"value",
        coalesce($"f_avg_value", $"value").as("avg_value"),
        coalesce($"f_n", lit(0L)).as("hist_n"))
      .orderBy($"event_id")
  }

  /** Q5 — existence probe as semi-join (J2/P2; reference
    * `customer_features_exist`, `core/feature_store_manager.py:155-172`).
    * Catalyst plans EXISTS → left-semi broadcast-hash on the filtered
    * customer side.
    */
  def q5Exists(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = t(spark, dir, "orders")
    val building = t(spark, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    o.join(broadcast(building), o("o_custkey") === building("c_custkey"), "left_semi")
      .agg(count(lit(1)).as("n_exists"))
  }

  /** Q5b — the matching NOT EXISTS via anti-join. */
  def q5NotExists(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = t(spark, dir, "orders")
    val building = t(spark, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    o.join(broadcast(building), o("o_custkey") === building("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_not_exists"))
  }

  /** Q6 — multi-table equi-join chain + agg (extended surface). The dim
    * chain region→nation→customer is reduced first (filter ASIA prunes
    * 4/5 of regions before the fact join) and broadcast into `orders`,
    * so the only shuffle is the final small group-by on n_name. This is
    * the plan shape that survives 100×: fact table never shuffles for
    * the join.
    */
  def q6JoinChain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val asia = t(spark, dir, "region").filter($"r_name" === "ASIA")
    val dims = t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(asia), $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey", $"n_name")
    t(spark, dir, "orders")
      .join(broadcast(dims), $"o_custkey" === $"c_custkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("cnt"), sum($"o_totalprice").as("total"))
      .orderBy($"n_name")
  }

  /** Q7 — distinct + count (A2; reference `main.py:121`). Plans as
    * partial distinct per partition, then exchange — not a global
    * collect.
    */
  def q7DistinctCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .agg(countDistinct($"user_id").as("n_users"))
  }

  /** Q8 — top-k: Catalyst plans TakeOrderedAndProject (per-partition
    * heap + driver merge of k rows), not a global sort. Tie-break on
    * o_orderkey.
    */
  def q8TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
  }

  /** Q9 — timestamp → ISO-8601 wire format (F2; reference
    * `core/utils.py:226-228`, Python `%f` = microseconds → SSSSSS).
    */
  def q9TsFormat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .select($"event_id",
        date_format($"ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("iso"))
      .orderBy($"event_id")
      .limit(100)
  }

  /** Q10 — frame-spec analytics: lag + running average per key
    * (extended surface, natural purchase-history features). `run_avg`
    * is CENT-EXACT: `value` carries 2 decimals, so the running sum is
    * taken over `round(value·100)` as exact integers and divided once
    * at the end. A float `avg() OVER` accumulates in engine-specific
    * order (last-ulp drift, and rounding can't save a value that
    * lands exactly on a .5 boundary — r1's hash miss); integer sums
    * are order-independent, so both engines produce bit-identical
    * doubles.
    */
  def q10WindowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .select($"event_id", $"user_id", $"value",
        lag($"value", 1).over(w).as("prev_value"),
        (sum(round($"value" * 100).cast("long")).over(run).cast("double") /
          (count(lit(1)).over(run) * lit(100.0))).as("run_avg"))
      .orderBy($"user_id", $"event_id")
  }

  /** Q11 — set op: customers with no orders (EXCEPT = distinct set
    * difference; plans as left-anti after Catalyst's
    * ReplaceExceptWithAntiJoin).
    */
  def q11Except(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer").select($"c_custkey")
      .except(t(spark, dir, "orders").select($"o_custkey".as("c_custkey")))
      .orderBy($"c_custkey")
  }

  /** Q11b — UNION ALL row-count check. */
  def q11UnionCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer").select($"c_custkey".as("k"))
      .unionAll(t(spark, dir, "orders").select($"o_custkey".as("k")))
      .agg(count(lit(1)).as("n"))
  }

  /** Q12 — ROLLUP grouping sets over lineitem (TPC-H Q1-shaped). The
    * shipdate predicate pushes into the parquet scan as a row-group
    * filter; Expand + partial agg keeps the shuffle at
    * |groups|·|grouping sets| rows.
    */
  def q12Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02 00:00:00")))
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").as("q"),
        avg($"l_extendedprice").as("p"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag".asc_nulls_last, $"l_linestatus".asc_nulls_last)
  }

  /** Q108 — explicit GROUPING SETS (arbitrary set list, not the
    * rollup/cube lattices): per-(flag,status), per-flag, per-status,
    * and grand total in ONE pass — Catalyst expands the sets into a
    * single Expand + partial/final agg, so the input is scanned once
    * no matter how many sets (the hand-written alternative is one
    * scan per set unioned). The four NULL patterns are mutually
    * distinguishable here because both keys are non-null in the data,
    * so no grouping_id is needed for a deterministic ordering.
    */
  def q108GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupingSets(
        Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_returnflag"),
          Seq($"l_linestatus"), Seq()),
        $"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").as("q"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag".asc_nulls_last, $"l_linestatus".asc_nulls_last)
  }

  /** Q109 — the array higher-order-function surface as a user query:
    * per embedding, dimension count, L2 norm (fold of squares),
    * max/min element, positive count and positive mass — all
    * `transform`/`filter`/`aggregate`/`array_max` built-ins, fully
    * codegen, no UDF. Double folds are sequential left-to-right over
    * the (ordered) array on both engines; the driver compares floats
    * at 1e-9 relative tolerance, so summation-algorithm ulps are
    * irrelevant.
    */
  def q109ArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = $"embedding".cast("array<double>")
    t(spark, dir, "embeddings")
      .select($"vec_id",
        size($"embedding").as("n_dims"),
        round(sqrt(aggregate(transform(e, x => x * x), lit(0.0),
          (acc, x) => acc + x)), 6).as("l2"),
        round(array_max(e), 6).as("mx"),
        round(array_min(e), 6).as("mn"),
        size(filter(e, _ > 0.0)).as("n_pos"),
        round(aggregate(filter(e, _ > 0.0), lit(0.0),
          (acc, x) => acc + x), 6).as("pos_sum"))
      .orderBy($"vec_id")
  }

  /** Q13 — string scalars + agg over documents. Sums are pinned to
    * BIGINT on both sides: DuckDB's sum(INT) widens to HUGEINT
    * (int128), which the driver's hash canonicalization distinguishes
    * from Spark's int64.
    */
  def q13DocStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n"),
        sum($"n_chars").cast("long").as("chars"),
        max(length($"text")).cast("long").as("maxlen"))
      .orderBy($"lang")
  }

  /** Q13b — JSON extraction from events.props (verified JSON-shaped:
    * `{"k": N}`).
    */
  def q13JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .select($"event_id", get_json_object($"props", "$.k").as("k"))
      .orderBy($"event_id")
      .limit(1000)
  }

  /** Q31 — term document frequency: the vocabulary/df table every
    * corpus pipeline derives (stopword mining, df-cuts for the
    * shingle join, TF-IDF weights). Distinct-tokens-per-doc explode →
    * count distinct docs per token; one shuffle on token.
    */
  def q31TermDocFreq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select($"doc_id",
        explode(array_distinct(split($"text", " ", -1))).as("tok"))
      .groupBy($"tok")
      .agg(countDistinct($"doc_id").as("df"))
      .orderBy($"df".desc, $"tok")
      .limit(50)
  }

  /** Q32 — statistical aggregates per group: exact interpolated
    * percentiles (one pass, no sort of the full data past the
    * per-group collection), sample stddev, Pearson correlation.
    */
  def q32Stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .groupBy($"event_type")
      .agg(
        percentile($"value", lit(0.5)).as("p50"),
        percentile($"value", lit(0.9)).as("p90"),
        stddev_samp($"value").as("sd"),
        corr($"value", $"user_id".cast("double")).as("c"))
      .orderBy($"event_type")
  }

  /** Q33 — part-catalog stats: pushed-down size predicate + brand
    * rollup (`part` table coverage; filter reaches the parquet scan).
    */
  def q33PartStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "part")
      .filter($"p_size" <= 20)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"),
        avg($"p_retailprice").as("avg_price"),
        max($"p_size").as("max_size"))
      .orderBy($"p_brand")
  }

  /** Q34 — supplier balances per nation: broadcast dim join
    * (`supplier` table coverage; same dims-broadcast shape as Q6).
    */
  def q34SupplierNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        sum($"s_acctbal").as("total_bal"),
        max($"s_acctbal").as("max_bal"))
      .orderBy($"n_name")
  }

  /** Q35 — INTERSECT set op (completes the §2.7 family with q11's
    * EXCEPT/UNION): customers that do have orders. Plans as left-semi
    * after ReplaceIntersectWithSemiJoin.
    */
  def q35Intersect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer").select($"c_custkey")
      .intersect(t(spark, dir, "orders").select($"o_custkey".as("c_custkey")))
      .orderBy($"c_custkey")
  }

  /** Q37 — date arithmetic breadth (F-family): year/month extraction
    * and day-difference aggregation over order dates.
    */
  def q37DateMath(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .groupBy(year($"o_orderdate").as("y"), month($"o_orderdate").as("m"))
      .agg(count(lit(1)).as("n"),
        sum(datediff($"o_orderdate", to_date(lit("1995-01-01"))))
          .cast("long").as("total_days"))
      .orderBy($"y", $"m")
  }

  /** Q38 — string scalar breadth (F-family): case, substring, trim,
    * edit distance, concat.
    */
  def q38StringFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer")
      .select($"c_custkey",
        upper($"c_name").as("uname"),
        substring($"c_name", 1, 8).as("pre"),
        length(trim($"c_name")).as("l"),
        levenshtein($"c_mktsegment", lit("BUILDING")).as("lev"),
        concat($"c_mktsegment", lit("#"), $"c_nationkey").as("tag"))
      .orderBy($"c_custkey")
  }

  /** Q36 — pivot: event counts per user × event_type as columns (the
    * wide-feature shape feature stores export). Fixed pivot value
    * list → no extra discovery pass, stable schema.
    */
  def q36Pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .groupBy($"user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"user_id")
  }

  /** Q80 — per-user sorted distinct event-type set, emitted as a CSV
    * string (the portable serialization of a set-valued aggregate:
    * `collect_set` is unordered by contract, so `array_sort` +
    * `array_join` makes the value deterministic and engine-neutral).
    * One partial+final agg; set sizes are bounded by the type
    * vocabulary, so state never grows with event volume.
    */
  def q80TypeSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .groupBy($"user_id")
      .agg(
        array_join(array_sort(collect_set($"event_type")), ",")
          .as("types_csv"),
        countDistinct($"event_type").as("n_types"))
      .orderBy($"user_id")
  }

  /** Full-outer reconciliation — the missing-join-side audit every
    * pipeline needs when merging two independently produced per-key
    * aggregates (e.g. yesterday's features vs today's): FULL OUTER
    * join, coalesce defaults, and a side flag saying which input(s)
    * covered the key. Both inputs here are sliced so each has keys
    * the other lacks (early-window purchases vs late-window clicks).
    *
    * Sums are rounded to 6 dp — per-key double accumulation order is
    * not a portable contract (the q10 lesson); the row counts are
    * exact integers. One shuffle per side on the join key; at scale
    * both sides are pre-aggregated (|keys| rows), so the outer join
    * is keys-sized, never event-sized.
    */
  def outerReconcile(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    import a.sparkSession.implicits._
    a.join(b, Seq(key), "full_outer")
  }

  /** Q72 — reconcile early-January purchase totals with late-January
    * click totals per user; flag which side covers each user.
    */
  def q72OuterReconcile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = t(spark, dir, "events")
    val early = e.filter($"event_type" === "purchase" &&
        $"ts" < to_timestamp(lit("2024-01-05 00:00:00")))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_purchase"),
        round(sum($"value"), 6).as("purchase_total"))
    val late = e.filter($"event_type" === "click" &&
        $"ts" >= to_timestamp(lit("2024-01-25 00:00:00")))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_click"),
        round(sum($"value"), 6).as("click_total"))
    outerReconcile(early, late, "user_id")
      .select($"user_id",
        coalesce($"n_purchase", lit(0L)).as("n_purchase"),
        coalesce($"purchase_total", lit(0.0)).as("purchase_total"),
        coalesce($"n_click", lit(0L)).as("n_click"),
        coalesce($"click_total", lit(0.0)).as("click_total"),
        when($"n_purchase".isNotNull && $"n_click".isNotNull, "both")
          .when($"n_purchase".isNotNull, "purchase_only")
          .otherwise("click_only").as("coverage"))
      .orderBy($"user_id")
  }
}
