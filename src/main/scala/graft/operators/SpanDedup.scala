package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Parallel, Pin, Tables}

/** Exact duplicated-SPAN excision — substring-level deduplication in
  * the style public LM data pipelines describe as "exact substring
  * dedup" (remove every span that appears verbatim elsewhere in the
  * corpus, rather than dropping or keeping whole documents): any
  * word-level n-gram occurring ≥ `minCount` times corpus-wide marks
  * its n tokens as duplicated; a document is rewritten with every
  * marked token excised. Unlike the doc-level families
  * ([[Dedup]]/[[NearDup]]/[[MinHashDedup]]) and the duplicated-n-gram
  * RATE diagnostic ([[Contamination.duplicatedNgrams]]), this operator
  * produces the cleaned corpus itself — boilerplate headers, license
  * blocks, and templated passages vanish from otherwise-unique
  * documents.
  *
  * Semantics (word-token adaptation of the suffix-array formulation):
  * with 0-based token positions and window starts i ∈ [0, len−n], a
  * window is DUPLICATED when its n-gram occurs ≥ `minCount` times
  * across the whole corpus — occurrences, not distinct-per-doc, so a
  * doc repeating its own n-gram counts. Token t is excised iff some
  * duplicated window covers it (∃ dup i with i ≤ t ≤ i+n−1). Output
  * per doc: token count, excised count, and the kept text (remaining
  * tokens joined by a single space; "" when everything was excised).
  *
  * Scale shape: positional occurrences are a typed per-partition loop
  * (tokenize once, hash tokens once, fold n-gram hashes — 8-byte
  * postings, no shingle strings on the wire). The global occurrence
  * count is ONE partial+final agg shuffled on the hash; duplicated
  * positions come from the postings⋈counts equi-join on that same key
  * (exchange reuse), and the per-doc rewrite folds each doc's dup
  * positions (sorted, ≤ len of that doc — bounded by the document
  * unit, never the corpus) back against the text in a typed loop.
  * Nothing is all-pairs, the corpus is scanned twice (postings +
  * rewrite), and driver state is zero.
  *
  * Collision contract: same as q18/q51/q88 — 64-bit n-gram hashes
  * stand in for strings; distinct-shingle collision odds ~|grams|²/2⁶⁴
  * are irrelevant below trillions of distinct n-grams.
  *
  * Reference scope: the reference pipeline
  * (`core/feature_store_manager.py`) has no text curation at all;
  * this extends the LLM-curation family (SURVEY.md §2.13).
  */
object SpanDedup {

  /** Positional (NON-distinct) n-gram hash occurrences: one row per
    * window start — (doc_id, pos 0-based, sh). Docs with < n tokens
    * contribute nothing.
    */
  def ngramPositions(docs: DataFrame, n: Int): DataFrame = {
    import docs.sparkSession.implicits._
    Parallel.fan(docs).select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        // zero-alloc tokenize+hash (r16): no String[] / token Strings
        val th = NearDup.tokenHashes(text)
        val m = th.length - n + 1
        if (m <= 0) Iterator.empty
        else (0 until m).iterator
          .map(i => (id, i, NearDup.shingleHash(th, i, n)))
      })
      .toDF("doc_id", "pos", "sh")
  }

  /** Window starts whose n-gram occurs ≥ `minCount` times corpus-wide:
    * (doc_id, pos). The agg and the probe join share the `sh` key, so
    * the postings exchange is reused.
    */
  def duplicatedPositions(docs: DataFrame, n: Int,
      minCount: Long = 2L): DataFrame = {
    import docs.sparkSession.implicits._
    // the positional postings feed BOTH the occurrence-count agg and
    // the probe join back onto themselves — pin (Pin.reuse) so the
    // tokenize+hash pass runs once, not twice (the NearDup pattern)
    val occ = ngramPositions(docs, n).transform(Pin.reuse)
    val dupHashes = occ.groupBy($"sh")
      .agg(count(lit(1)).as("occ_n"))
      .filter($"occ_n" >= minCount)
      .select($"sh")
    occ.join(dupHashes, "sh").select($"doc_id", $"pos")
  }

  /** The cleaned corpus: (doc_id, n_tokens, n_removed, kept_text),
    * every token covered by a duplicated window excised. Docs shorter
    * than n tokens pass through verbatim (no windows ⇒ nothing dup).
    */
  def excise(docs: DataFrame, n: Int = 8, minCount: Long = 2L): DataFrame = {
    import docs.sparkSession.implicits._
    val dupPos = duplicatedPositions(docs, n, minCount)
      .groupBy($"doc_id")
      .agg(sort_array(collect_list($"pos")).as("dup_pos"))
    rewrite(docs.join(dupPos, Seq("doc_id"), "left"), n)
  }

  /** Serving/incremental shape: excise an arriving batch against a
    * FROZEN corpus n-gram index ([[dupNgramIndex]]) — a batch window
    * matching ANY corpus occurrence is duplicated (corpus + batch
    * together put it at ≥ 2), plus windows occurring ≥ `minCount`
    * times within the batch itself. Equals [[excise]] over
    * corpus ∪ batch restricted to the batch docs whenever batch
    * windows don't overlap corpus text they themselves introduced.
    * `minCount = Long.MaxValue` disables the within-batch leg
    * (pure index-probe semantics — the decontamination-rewrite
    * shape, see [[q104ExciseContaminated]]) and skips its shuffle.
    */
  def exciseAgainst(corpusIndex: DataFrame, batch: DataFrame,
      n: Int = 8, minCount: Long = 2L): DataFrame = {
    import batch.sparkSession.implicits._
    val probeOnly = minCount == Long.MaxValue
    // up to three consumers (corpus probe, within-batch count + probe)
    val occ0 = ngramPositions(batch, n)
    val occ = if (probeOnly) occ0 else occ0.transform(Pin.reuse)
    val inCorpus = occ.join(corpusIndex, "sh").select($"doc_id", $"pos")
    val dup =
      if (probeOnly) inCorpus
      else {
        val inBatch = occ.groupBy($"sh")
          .agg(count(lit(1)).as("occ_n"))
          .filter($"occ_n" >= minCount)
          .select($"sh")
          .join(occ, "sh").select($"doc_id", $"pos")
        inCorpus.union(inBatch).distinct()
      }
    val dupPos = dup
      .groupBy($"doc_id")
      .agg(sort_array(collect_list($"pos")).as("dup_pos"))
    rewrite(batch.join(dupPos, Seq("doc_id"), "left"), n)
  }

  /** Distinct n-gram hashes of the corpus — the frozen artifact
    * [[exciseAgainst]] gates against (persist like any index).
    */
  def dupNgramIndex(corpus: DataFrame, n: Int = 8): DataFrame =
    ngramPositions(corpus, n).select(col("sh")).distinct()

  /** Fold sorted dup window-starts back onto the text: mark
    * [p, p+n−1] per dup start, count and excise covered tokens.
    * `joined` = docs left-joined with `dup_pos: array<int>` (null ⇒
    * clean doc).
    */
  private def rewrite(joined: DataFrame, n: Int): DataFrame = {
    import joined.sparkSession.implicits._
    joined
      .select(col("doc_id"), col("text"),
        coalesce(col("dup_pos"), array().cast("array<int>")).as("dup_pos"))
      .as[(Long, String, Array[Int])]
      .mapPartitions(_.map { case (id, text, dup) =>
        val toks = text.split(" ", -1)
        val covered = new Array[Boolean](toks.length)
        var i = 0
        while (i < dup.length) {
          var j = dup(i)
          val end = math.min(j + n, toks.length)
          while (j < end) { covered(j) = true; j += 1 }
          i += 1
        }
        var removed = 0L
        val sb = new java.lang.StringBuilder
        var first = true
        i = 0
        while (i < toks.length) {
          if (covered(i)) removed += 1L
          else {
            if (!first) sb.append(' ')
            sb.append(toks(i))
            first = false
          }
          i += 1
        }
        (id, toks.length.toLong, removed, sb.toString)
      })
      .toDF("doc_id", "n_tokens", "n_removed", "kept_text")
  }

  /** Q102 — exact duplicated-span excision over `documents` (8-grams,
    * corpus-wide occurrence ≥ 2).
    */
  def q102ExciseSpans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    excise(Tables.load(spark, dir, "documents")).orderBy($"doc_id")
  }

  /** DuckDB oracle builder shared by q102/q104 — the single source of
    * truth for the coverage/rewrite output contract. `dupCtes` must
    * define a CTE `dup(doc_id, pos)` of 1-based duplicated window
    * starts (appended after the shared `t` CTE); `docWhere` filters
    * the rewritten doc set ("" = whole corpus). Coverage is a per-doc
    * windowed max of dup-start flags over the trailing n−1
    * positions; kept text is an ordered `string_agg` of uncovered
    * tokens (NULLs skipped; '' when everything was excised, matching
    * Spark's "").
    */
  def oracleSql(dupCtes: String, docWhere: String = "",
      n: Int = 8): String = {
    val where = if (docWhere.isEmpty) "" else s" WHERE $docWhere"
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |$dupCtes,
       | tok AS (SELECT doc_id, j, toks[j] AS tk
       |   FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS j
       |         FROM t$where)),
       | flag AS (SELECT k.doc_id, k.j, k.tk,
       |     CASE WHEN d.pos IS NOT NULL THEN 1 ELSE 0 END AS ds
       |   FROM tok k LEFT JOIN dup d ON d.doc_id = k.doc_id AND d.pos = k.j),
       | cov AS (SELECT doc_id, j, tk,
       |     max(ds) OVER (PARTITION BY doc_id ORDER BY j
       |       ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW) AS c
       |   FROM flag)
       |SELECT doc_id, count(*)::BIGINT AS n_tokens,
       |  sum(c)::BIGINT AS n_removed,
       |  coalesce(string_agg(CASE WHEN c = 0 THEN tk END, ' ' ORDER BY j), '')
       |    AS kept_text
       |FROM cov GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** The positional n-gram `occ` CTE fragment for a given n and doc
    * filter — 1-based window starts 1..len−n+1, docs shorter than n
    * excluded. Shared by the fixed q102/q104 oracles AND the
    * parameterized fuzz-band builders, so the n-arithmetic lives once.
    */
  private def occCteSql(n: Int, docWhere: String): String = {
    val where = if (docWhere.isEmpty) "" else s" AND $docWhere"
    s""" occ AS (SELECT doc_id, pos, array_to_string(toks[pos:pos+${n - 1}], ' ') AS s
       |   FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - ${n - 2})) AS pos
       |         FROM t WHERE len(toks) >= $n$where))""".stripMargin
  }

  /** Parameterized q102-shape oracle: n-gram corpus-wide occurrence ≥
    * `minCount` marks a window dup (the [[excise]] contract for any
    * n/minCount — the differential fuzz band's builder).
    */
  def exciseOracleSqlN(n: Int, minCount: Long): String = oracleSql(
    s"""${occCteSql(n, "")},
       | dup AS (SELECT doc_id, pos FROM occ
       |   JOIN (SELECT s FROM occ GROUP BY s HAVING count(*) >= $minCount) d USING (s))""".stripMargin,
    n = n)

  /** q102 oracle: corpus-wide occurrence ≥ 2 marks a window dup. */
  def exciseOracleSql: String = exciseOracleSqlN(n = 8, minCount = 2L)

  /** Parameterized q104-shape oracle for any n: membership in the
    * benchmark tenth's distinct n-gram set marks a window dup; only
    * training docs are rewritten.
    */
  def decontaminateOracleSqlN(n: Int): String = oracleSql(
    s"""${occCteSql(n, "doc_id % 10 <> 0")},
       | bench AS (SELECT DISTINCT array_to_string(toks[pos:pos+${n - 1}], ' ') AS s
       |   FROM (SELECT toks, unnest(range(1, len(toks) - ${n - 2})) AS pos
       |         FROM t WHERE len(toks) >= $n AND doc_id % 10 = 0)),
       | dup AS (SELECT doc_id, pos FROM occ JOIN bench USING (s))""".stripMargin,
    docWhere = "doc_id % 10 <> 0", n = n)

  /** q104 oracle: the decontamination rewrite at the fixed n = 8. */
  def decontaminateOracleSql: String = decontaminateOracleSqlN(8)

  /** Within-doc de-repetition: a window whose n-gram already occurred
    * at an EARLIER position in the same document is duplicated — the
    * first occurrence survives, every later repeat excises. The
    * generated-text / boilerplate cleanup op, complementing [[excise]]
    * (which removes ALL occurrences corpus-wide): here repetition is
    * judged per document only, and something always remains.
    *
    * Scale shape: first-occurrence is one partial+final `min(pos)`
    * agg keyed (doc_id, sh); the probe join reuses the exchange, and
    * everything downstream is per-doc as in [[excise]]. No
    * corpus-global state at all — each doc is independent, so the
    * operator is embarrassingly parallel at any scale.
    */
  def exciseRepeats(docs: DataFrame, n: Int = 3): DataFrame = {
    import docs.sparkSession.implicits._
    // two consumers (min-pos agg, probe) — tokenize once
    val occ = ngramPositions(docs, n).transform(Pin.reuse)
    val first = occ.groupBy($"doc_id", $"sh").agg(min($"pos").as("mp"))
    val dupPos = occ.join(first, Seq("doc_id", "sh"))
      .filter($"pos" > $"mp")
      .groupBy($"doc_id")
      .agg(sort_array(collect_list($"pos")).as("dup_pos"))
    rewrite(docs.join(dupPos, Seq("doc_id"), "left"), n)
  }

  /** Parameterized q106-shape oracle: later same-doc repeats of an
    * n-gram mark windows.
    */
  def derepOracleSqlN(n: Int): String = oracleSql(
    s"""${occCteSql(n, "")},
       | dup AS (SELECT doc_id, pos FROM (
       |     SELECT doc_id, pos, min(pos) OVER (PARTITION BY doc_id, s) AS mp
       |     FROM occ)
       |   WHERE pos > mp)""".stripMargin,
    n = n)

  /** q106 oracle: within-doc de-repetition at the fixed n = 3. */
  def derepOracleSql: String = derepOracleSqlN(3)

  /** Q106 — within-doc 3-gram de-repetition over `documents`. */
  def q106ExciseRepeats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    exciseRepeats(Tables.load(spark, dir, "documents")).orderBy($"doc_id")
  }

  /** Corpus novelty profile — per document (in doc_id ingest order):
    * its distinct n-gram count, how many of those n-grams appear
    * FIRST in this document (no earlier doc contains them), and the
    * novelty fraction. The stream-novelty / Heaps-law diagnostic a
    * curation pipeline watches to decide when more of a source stops
    * adding information (novelty decaying toward 0 = the source is
    * exhausted or self-repeating).
    *
    * Scale shape: distinct per-doc n-gram hashes (the
    * [[NearDup.shingleHashSets]] typed loop), one `min(doc_id)` agg
    * keyed on the hash, probe join reusing that exchange, per-doc
    * final agg. Same inverted-index class as q88.
    */
  def noveltyProfile(docs: DataFrame, n: Int = 3): DataFrame = {
    import docs.sparkSession.implicits._
    val sets = NearDup.shingleHashSets(docs, n)
    val postings = sets.select($"doc_id", explode($"shs").as("sh"))
      .transform(Pin.reuse)
    val firstDoc = postings.groupBy($"sh")
      .agg(min($"doc_id").as("first_doc"))
    postings.join(firstDoc, "sh")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L))
          .as("n_novel"))
      .select($"doc_id", $"n_grams", $"n_novel",
        round($"n_novel".cast("double") / $"n_grams", 6)
          .as("novelty_frac"))
  }

  /** Parameterized q107-shape oracle: distinct string n-grams,
    * min-doc first-occurrence.
    */
  def noveltyOracleSqlN(n: Int): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       | sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
       |     range(1, len(toks) - ${n - 2}),
       |     i -> array_to_string(toks[i:i+${n - 1}], ' ')))) AS s
       |   FROM t WHERE len(toks) >= $n),
       | fd AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s)
       |SELECT doc_id, count(*)::BIGINT AS n_grams,
       |  sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
       |  round(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)::DOUBLE
       |    / count(*), 6) AS novelty_frac
       |FROM sh JOIN fd USING (s)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q107 oracle: the novelty profile at the fixed n = 3. */
  def noveltyOracleSql: String = noveltyOracleSqlN(3)

  /** Q107 — 3-gram novelty profile over `documents` in id order. */
  def q107NoveltyProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    noveltyProfile(Tables.load(spark, dir, "documents")).orderBy($"doc_id")
  }

  /** Q104 — decontamination as a REWRITE: training docs (doc_id % 10
    * ≠ 0) lose every span whose 8-gram appears anywhere in the
    * held-out benchmark tenth (doc_id % 10 = 0, the q51 stand-in
    * split) — the excision counterpart of q51's flag-only
    * contamination report. Pure index-probe semantics: spans
    * duplicated only WITHIN the training split are kept (that's
    * q102's job), so the two legs stay independently testable.
    */
  def q104ExciseContaminated(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val benchIdx = dupNgramIndex(docs.filter($"doc_id" % 10 === 0))
    exciseAgainst(benchIdx, docs.filter($"doc_id" % 10 =!= 0),
      n = 8, minCount = Long.MaxValue)
      .orderBy($"doc_id")
  }
}
