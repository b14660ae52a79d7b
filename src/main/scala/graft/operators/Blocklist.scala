package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Parallel, Tables}

/** MULTI-PATTERN BLOCKLIST SCAN — one Aho–Corasick pass that finds
  * every occurrence of every catalog pattern in one traversal of the
  * text, O(|text| + matches) per document REGARDLESS of how many
  * patterns the catalog holds. This is the scale path the curation
  * family's per-term predicates can't take: a production blocklist
  * (unsafe phrases, licensing strings, site boilerplate markers) runs
  * to 10⁴–10⁵ entries, and evaluating them as per-pattern
  * `contains`/regex legs is O(|patterns| · |text|) — at 100 TB that
  * multiplies the whole corpus scan by the catalog size, where the
  * automaton walks each byte exactly once no matter the catalog.
  *
  * The automaton (Aho & Corasick 1975, the textbook construction) is
  * built DRIVER-side from the catalog — the same bounded-driver-state
  * contract as Curation's source catalogs and the takedown key lists —
  * and broadcast: its size is O(Σ pattern lengths) (per-state sorted
  * transition arrays + binary search, NOT a dense 2^16-wide goto
  * table, so a 100k-entry catalog broadcasts in single-digit MB). The
  * scan itself is a typed per-partition loop over the corpus
  * projection (doc_id, text): zero shuffles — counts ride the scan,
  * and only the per-doc nonzero (pattern, hits) rows leave it.
  *
  * Match semantics: SUBSTRING occurrences, counting every end
  * position — overlapping occurrences all count, and a pattern that
  * is a substring of another pattern's occurrence still counts
  * (he/she/hers all fire in "ushers"), the standard Aho–Corasick
  * output. The differential spec pins this against a brute-force
  * end-position count.
  *
  * Reference scope: absent from the reference (no text scanning);
  * extends the curation/secrets family of SURVEY.md §2.13 (q44
  * policy filter, q157 secrets scan) with the catalog-scale member.
  */
object Blocklist {

  /** Immutable Aho–Corasick automaton. Per-state transitions are
    * (sorted char array, next-state array) pairs resolved by binary
    * search — O(log σ_s) per step with σ_s the state's out-degree,
    * and O(Σ|patterns|) total size, the broadcast-friendly layout.
    * `out(s)` lists every pattern id whose occurrence ends at state
    * `s`, with fail-chain outputs pre-merged at build time so the
    * scan never walks fail links for output collection.
    */
  /** Per-char SIMPLE case fold (upper-then-lower, the standard
    * simple-folding approximation: handles final sigma etc.). Chosen
    * over FULL Unicode case folding deliberately: full folding can
    * change string LENGTH (ß → ss), which would break
    * [[AcAutomaton.maskCovered]]'s position arithmetic and the
    * length-preserving redaction contract; simple folding is
    * 1:1 per char, so match positions and lengths survive folding.
    */
  @inline private[operators] def foldChar(c: Char): Char =
    Character.toLowerCase(Character.toUpperCase(c))

  final class AcAutomaton private[Blocklist] (
      val patterns: Array[String],
      chars: Array[Array[Char]],
      next: Array[Array[Int]],
      fail: Array[Int],
      out: Array[Array[Int]],
      val caseFold: Boolean = false) extends Serializable {

    /** Trie size — at most one state per catalog character plus the
      * root, the O(Σ pattern lengths) broadcast-size bound
      * (spec-pinned at a 10k-pattern catalog).
      */
    def nStates: Int = fail.length

    @inline private def goTo(s: Int, c: Char): Int = {
      val cs = chars(s)
      var lo = 0
      var hi = cs.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mc = cs(mid)
        if (mc == c) return next(s)(mid)
        else if (mc < c) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    /** One scan step: follow fail links until a transition on `c`
      * exists (root falls through to itself) — amortized O(1) per
      * character over a whole text. Under `caseFold` the input char
      * folds before the walk (the trie was built over folded pattern
      * chars), so `BadPhrase` matches a catalog entry `badphrase`.
      */
    def step(s: Int, c0: Char): Int = {
      val c = if (caseFold) foldChar(c0) else c0
      var cur = s
      var t = goTo(cur, c)
      while (t < 0 && cur != 0) {
        cur = fail(cur)
        t = goTo(cur, c)
      }
      if (t < 0) 0 else t
    }

    /** Per-pattern end-position occurrence counts in `text`,
      * accumulated into `acc` (length = patterns.length; caller
      * zeroes between documents).
      */
    def countInto(text: String, acc: Array[Long]): Unit = {
      var s = 0
      var i = 0
      val n = text.length
      while (i < n) {
        s = step(s, text.charAt(i))
        val os = out(s)
        var j = 0
        while (j < os.length) { acc(os(j)) += 1L; j += 1 }
        i += 1
      }
    }

    /** Length-preserving scrub: every character covered by at least
      * one occurrence of any pattern becomes `mask`; overlapping and
      * nested occurrences merge naturally (a char is covered or not).
      * Returns (masked text, covered char count, count of MAXIMAL
      * covered runs). One automaton pass emitting a difference array
      * over match intervals, one sweep to rebuild — O(text + matches)
      * like the count scan.
      */
    def maskCovered(text: String, mask: Char): (String, Long, Long) = {
      val n = text.length
      val delta = new Array[Int](n + 1)
      var s = 0
      var i = 0
      while (i < n) {
        s = step(s, text.charAt(i))
        val os = out(s)
        var j = 0
        while (j < os.length) {
          delta(i - patterns(os(j)).length + 1) += 1
          delta(i + 1) -= 1
          j += 1
        }
        i += 1
      }
      val sb = new java.lang.StringBuilder(n)
      var cov = 0
      var nMasked = 0L
      var nSpans = 0L
      var prev = false
      i = 0
      while (i < n) {
        cov += delta(i)
        val c = cov > 0
        if (c) {
          sb.append(mask)
          nMasked += 1
          if (!prev) nSpans += 1
        } else sb.append(text.charAt(i))
        prev = c
        i += 1
      }
      (sb.toString, nMasked, nSpans)
    }
  }

  /** Build the automaton from a pattern catalog: trie insertion, BFS
    * fail links, fail-chain output merging, then compression to the
    * sorted-array layout. Patterns must be non-empty and distinct
    * (duplicate catalog entries are a catalog bug — counted twice
    * they would double every tally downstream).
    *
    * With `caseFold` the trie is built over simple-case-folded
    * pattern chars and the scan folds each input char before its
    * step ([[foldChar]] — length-preserving by construction, so
    * match positions/lengths and the redaction cover are exact).
    * Distinctness is then required UNDER THE FOLD: `Foo` and `foo`
    * are the same folded entry and would double-count.
    */
  def buildAutomaton(patterns: Seq[String],
      caseFold: Boolean = false): AcAutomaton = {
    require(patterns.nonEmpty, "blocklist catalog is empty")
    require(patterns.forall(p => p != null && p.nonEmpty),
      "blocklist catalog has an empty pattern")
    require(patterns.distinct.size == patterns.size,
      "blocklist catalog has duplicate patterns")
    if (caseFold)
      require(patterns.map(_.map(foldChar)).distinct.size == patterns.size,
        "blocklist catalog has patterns identical under case folding")
    val pats = patterns.toArray
    val kids = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Char, Int])
    val ownOut = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    pats.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { c0 =>
        val c = if (caseFold) foldChar(c0) else c0
        s = kids(s).getOrElse(c, {
          kids += scala.collection.mutable.TreeMap.empty[Char, Int]
          ownOut += Nil
          val ns = kids.size - 1
          kids(s) += (c -> ns)
          ns
        })
      }
      ownOut(s) ::= pid
    }
    val nStates = kids.size
    val fail = new Array[Int](nStates)
    val out = new Array[List[Int]](nStates)
    out(0) = ownOut(0)
    val queue = scala.collection.mutable.Queue.empty[Int]
    kids(0).foreach { case (_, s) =>
      fail(s) = 0
      out(s) = ownOut(s)
      queue += s
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      kids(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !kids(f).contains(c)) f = fail(f)
        fail(v) = kids(f).get(c).filter(_ != v).getOrElse(0)
        // merge the fail target's (already-final) outputs: out is
        // finalized in BFS order, and fail(v) is strictly shallower
        out(v) = ownOut(v) ::: out(fail(v))
        queue += v
      }
    }
    new AcAutomaton(
      pats,
      kids.map(_.keysIterator.toArray).toArray,
      kids.map(_.valuesIterator.toArray).toArray,
      fail,
      out.map(o => if (o == null) Array.empty[Int] else o.reverse.toArray),
      caseFold)
  }

  /** Per-document per-pattern hit counts: (doc_id, pattern_id, hits),
    * nonzero rows only. One broadcast of the automaton, one typed
    * per-partition pass over the (doc_id, text) projection, zero
    * shuffles.
    */
  def scanCounts(docs: DataFrame, patterns: Seq[String],
      caseFold: Boolean = false): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    val bc = ss.sparkContext.broadcast(buildAutomaton(patterns, caseFold))
    val nPats = patterns.size
    Parallel.fan(docs).select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        val ac = bc.value
        val acc = new Array[Long](nPats)
        it.flatMap { case (id, text) =>
          java.util.Arrays.fill(acc, 0L)
          if (text != null) ac.countInto(text, acc)
          val rows = List.newBuilder[(Long, Int, Long)]
          var p = 0
          while (p < nPats) {
            if (acc(p) != 0L) rows += ((id, p, acc(p)))
            p += 1
          }
          rows.result()
        }
      }
      .toDF("doc_id", "pattern_id", "hits")
  }

  /** Catalog-wide census: one row PER PATTERN (zero-hit patterns
    * included — a blocklist entry that never fires is the signal a
    * catalog review wants), (pattern_id, pattern, n_docs, n_hits).
    * The scan side is [[scanCounts]]'s shuffle-free pass; the census
    * agg is |patterns|-keyed — catalog-sized, trivially small.
    */
  def census(docs: DataFrame, patterns: Seq[String],
      caseFold: Boolean = false): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    val counts = scanCounts(docs, patterns, caseFold)
      .groupBy($"pattern_id")
      .agg(count(lit(1)).as("n_docs"), sum($"hits").as("n_hits"))
    val cat = patterns.zipWithIndex
      .map { case (p, i) => (i, p) }.toDF("pattern_id", "pattern")
    cat.join(counts, Seq("pattern_id"), "left")
      .select($"pattern_id", $"pattern",
        coalesce($"n_docs", lit(0L)).as("n_docs"),
        coalesce($"n_hits", lit(0L)).as("n_hits"))
      .orderBy($"pattern_id")
  }

  /** Admission gate: the docs with ZERO blocklist hits — the curation
    * composition (q44's policy filter at catalog scale). Anti-join
    * against the matched-doc id set, which is ≤ |matched docs| rows
    * (usually ≪ corpus; AQE broadcasts it while it fits).
    */
  def gate(docs: DataFrame, patterns: Seq[String],
      caseFold: Boolean = false): DataFrame = {
    import docs.sparkSession.implicits._
    docs.join(
      scanCounts(docs, patterns, caseFold).select($"doc_id").distinct(),
      Seq("doc_id"), "left_anti")
  }

  /** Scrub instead of drop: the redaction composition — (doc_id,
    * masked, n_masked, n_spans) with every covered character replaced
    * by `mask` (length-preserving, the license-header / boilerplate-
    * marker / unsafe-span treatment when the REST of the document is
    * worth keeping). Same shuffle-free one-pass shape as
    * [[scanCounts]]; NULL text passes through as NULL with zero
    * counts (the no-throw scan contract).
    */
  def redact(docs: DataFrame, patterns: Seq[String],
      mask: Char = '*', caseFold: Boolean = false): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    val bc = ss.sparkContext.broadcast(buildAutomaton(patterns, caseFold))
    Parallel.fan(docs).select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        val ac = bc.value
        it.map { case (id, text) =>
          if (text == null) (id, null: String, 0L, 0L)
          else {
            val (m, nm, ns) = ac.maskCovered(text, mask)
            (id, m, nm, ns)
          }
        }
      }
      .toDF("doc_id", "masked", "n_masked", "n_spans")
  }

  /** Q171 — blocklist redaction over `documents` at the q169 fixture
    * catalog: the scrubbed corpus with per-doc masked-char and
    * merged-span counts.
    */
  def q171BlocklistRedact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    redact(Tables.load(spark, dir, "documents"), q169Patterns)
      .orderBy($"doc_id")
  }

  /** DuckDB oracle for [[q171BlocklistRedact]] — positional
    * reconstruction: enumerate every match START via a per-(doc,
    * pattern) series scan, expand matches to their covered character
    * positions, rebuild the string per position (`*` where covered),
    * count covered chars and coverage-run starts (lag window). Exact
    * for ANY catalog — unlike the q169 replace-count identity this
    * ledger is positional, so overlap/nesting semantics are mirrored
    * directly rather than assumed away.
    *
    * Position-unit caveat: the oracle indexes CODE POINTS (DuckDB
    * `length`/`substr`) while the engine indexes UTF-16 units (Java
    * strings) — identical for every BMP character, so for this
    * corpus; only astral-plane text (emoji etc.) would shift
    * positions between the two ledgers.
    */
  def redactOracleSql: String = {
    val vals = q169Patterns
      .map(p => s"('${p.replace("'", "''")}')").mkString(", ")
    s"""WITH pats(pattern) AS (VALUES $vals),
       |$maskingCtesSql""".stripMargin
  }

  /** The positional-masking CTE chain shared by the q171 and q172
    * oracles: expects a preceding `pats(pattern)` CTE (literal VALUES
    * or derived) and ends in the (doc_id, masked, n_masked, n_spans)
    * select.
    */
  def maskingCtesSql: String =
    s"""$maskingCoreCtesSql
       |SELECT d.doc_id, coalesce(a.masked, '') AS masked,
       |  coalesce(a.n_masked, 0)::BIGINT AS n_masked,
       |  coalesce(a.n_spans, 0)::BIGINT AS n_spans
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** The masking chain WITHOUT the final select — ends at
    * `agg(doc_id, masked, n_masked, n_spans)` so composing oracles
    * (q173's rescrub chain) can keep deriving. Expects `pats`.
    */
  def maskingCoreCtesSql: String =
    s""" idx AS (
       |   SELECT doc_id, text,
       |     unnest(generate_series(1, length(text))) AS i
       |   FROM documents),
       | chars AS (
       |   SELECT doc_id, i, substr(text, i, 1) AS ch FROM idx),
       | hits AS (
       |   SELECT doc_id, i FROM (
       |     SELECT d.doc_id,
       |       unnest(flatten(list_transform(
       |         list_filter(
       |           generate_series(1, length(d.text) - length(p.pattern) + 1),
       |           s -> substr(d.text, s, length(p.pattern)) = p.pattern),
       |         s -> generate_series(s, s + length(p.pattern) - 1)))) AS i
       |     FROM documents d
       |     JOIN pats p ON length(p.pattern) <= length(d.text))),
       | cov AS (SELECT DISTINCT doc_id, i FROM hits),
       | flags AS (
       |   SELECT ch.doc_id, ch.i, ch.ch, cov.i IS NOT NULL AS c
       |   FROM chars ch
       |   LEFT JOIN cov ON cov.doc_id = ch.doc_id AND cov.i = ch.i),
       | spans AS (
       |   SELECT doc_id, i, ch, c,
       |     CASE WHEN c AND NOT coalesce(
       |       lag(c) OVER (PARTITION BY doc_id ORDER BY i), false)
       |     THEN 1 ELSE 0 END AS st
       |   FROM flags),
       | agg AS (
       |   SELECT doc_id,
       |     string_agg(CASE WHEN c THEN '*' ELSE ch END, '' ORDER BY i)
       |       AS masked,
       |     sum(CASE WHEN c THEN 1 ELSE 0 END) AS n_masked,
       |     sum(st) AS n_spans
       |   FROM spans GROUP BY doc_id)""".stripMargin

  /** DERIVED-catalog redaction — the corpus mines its own blocklist:
    * the `maxPatterns` token-aligned `n`-gram phrases with the
    * highest cross-document frequency (df = docs containing the
    * phrase at a token boundary, ties by phrase ascending, df ≥
    * `minDf` — one doc's idiosyncrasy is not boilerplate) become the
    * catalog, and every occurrence is cover-masked. This is
    * boilerplate-PHRASE scrubbing (the q141 line treatment at
    * sub-line granularity): the document survives, the template text
    * inside it does not.
    *
    * The catalog collects to the driver (`maxPatterns` strings — the
    * bounded-catalog contract the automaton build needs). The mining
    * is TWO-PASS on the q88/q147 wire contract: pass 1 df-counts
    * 8-byte gram HASHES (nothing vocabulary-wide shuffles strings),
    * a bounded scalar read takes the K-th-largest hash df, and pass 2
    * recovers the candidate STRINGS (grams whose hash df reaches that
    * boundary — a broadcast-set filter on the scan, candidate-sized
    * output), recomputes their exact string dfs, and orders
    * (df DESC, gram ASC) to the final K. A hash df only ever
    * over-counts its gram's true df (collisions merge), so the
    * candidate set can only over-admit — the string-df recount and
    * final cut restore exactness up to the corpus-wide 64-bit
    * collision contract.
    *
    * Masking is SUBSTRING-semantics (the [[redact]] contract): the
    * catalog is mined token-aligned, but once a phrase is blocklisted
    * every occurrence masks, aligned or not.
    */
  def autoRedact(docs: DataFrame, n: Int = 4, minDf: Long = 2L,
      maxPatterns: Int = 5): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    def gramsOf(id: Long, text: String): Iterator[(Long, String)] =
      if (text == null) Iterator.empty
      else {
        val toks = text.split(" ", -1)
        (0 to toks.length - n).iterator
          .map(i => (id, toks.slice(i, i + n).mkString(" ")))
      }
    val typed = docs.select($"doc_id", $"text").as[(Long, String)]
    // pass 1: df over 8-byte gram hashes — the only corpus-wide
    // shuffle, hash-width rows
    val hashDf = typed
      .flatMap { case (id, text) =>
        gramsOf(id, text).map { case (d, g) => (d, NearDup.tokenHash64(g)) }
      }
      .toDF("doc_id", "gh").distinct()
      .groupBy($"gh").agg(count(lit(1)).as("df"))
      .filter($"df" >= minDf)
    // boundary df: the K-th largest hash df (one bounded scalar)
    val dfKRow = hashDf.orderBy($"df".desc).limit(maxPatterns)
      .agg(min($"df")).head()
    if (dfKRow.isNullAt(0))
      return docs.select($"doc_id", $"text".as("masked"),
        lit(0L).as("n_masked"), lit(0L).as("n_spans"))
    val dfK = dfKRow.getLong(0)
    // candidate hashes: everything at or above the boundary,
    // boundary ties included — catalog-sized, broadcasts as a set
    val cand = hashDf.filter($"df" >= dfK)
      .select($"gh").as[Long].collect().toSet
    val candBc = ss.sparkContext.broadcast(cand)
    // pass 2: recover candidate strings, recount exact string dfs
    val catalog = typed
      .flatMap { case (id, text) =>
        gramsOf(id, text)
          .filter { case (_, g) => candBc.value.contains(NearDup.tokenHash64(g)) }
      }
      .toDF("doc_id", "gram").distinct()
      .groupBy($"gram").agg(count(lit(1)).as("df"))
      .filter($"df" >= minDf)
      .orderBy($"df".desc, $"gram")
      .limit(maxPatterns)
      .select($"gram").as[String].collect().toSeq
    if (catalog.isEmpty)
      docs.select($"doc_id", $"text".as("masked"),
        lit(0L).as("n_masked"), lit(0L).as("n_spans"))
    else redact(docs, catalog)
  }

  /** Q172 — auto-mined boilerplate-phrase redaction over `documents`
    * at the defaults (top-5 4-gram phrases with df ≥ 2).
    */
  def q172AutoRedact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    autoRedact(Tables.load(spark, dir, "documents")).orderBy($"doc_id")
  }

  /** DuckDB oracle for [[q172AutoRedact]]: the same token-aligned
    * 4-gram df mining (distinct per doc, df ≥ 2, top-5 by df DESC
    * then phrase ASC — a total order, grams are unique) derived as
    * the `pats` CTE, then the shared positional masking chain.
    */
  def autoRedactOracleSql(n: Int = 4, minDf: Long = 2L,
      maxPatterns: Int = 5): String = {
    val joinExpr = (0 until n)
      .map(k => s"ts[i + $k]").mkString(" || ' ' || ")
    s"""WITH toks AS (
       |   SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       | gidx AS (
       |   SELECT doc_id, ts,
       |     unnest(generate_series(1, len(ts) - ${n - 1})) AS i
       |   FROM toks),
       | grams AS (
       |   SELECT DISTINCT doc_id, $joinExpr AS gram FROM gidx),
       | dfreq AS (
       |   SELECT gram, count(*) AS df FROM grams GROUP BY gram),
       | pats AS (
       |   SELECT gram AS pattern FROM dfreq WHERE df >= $minDf
       |   ORDER BY df DESC, gram LIMIT $maxPatterns),
       |$maskingCtesSql""".stripMargin
  }

  /** CONSERVATIVE (wildcard-tolerant) cover for rescrub over
    * already-masked text: an occurrence of `pat` FIRES at `i` when
    * every position either equals the (optionally folded) pattern
    * char or is ALREADY COVERED (a masked char could have been
    * anything in the unretained original, so it matches everything)
    * AND at least one matching position is still VISIBLE — a fire
    * must carry evidence; without the visible-anchor rule any masked
    * run would "match" every pattern that fits inside it, and a hard
    * takedown would remove every doc carrying an old mask.
    *
    * Iterated to a per-document FIXPOINT: a fire's newly-covered
    * chars can enable further evidential fires (pattern B mismatched
    * the original at a char pattern A just masked), so one pass is
    * not idempotent — the loop re-scans until no new char covers.
    * Masked coverage only grows and is bounded by |text|, so the
    * fixpoint exists; in practice it lands in 1–2 iterations.
    *
    * GUARANTEE (the conservative contract): the fixpoint cover is a
    * SUPERSET of the fresh full-catalog build's cover — any true
    * delta occurrence in the original either straddles the old cover
    * (its visible chars match, its hidden chars are wildcards → it
    * fires) or lies entirely inside it (already masked). The price
    * is possible OVER-masking: a wildcard window whose hidden
    * original chars did NOT spell the pattern also fires. Never
    * under-masks; may over-mask — the compliance-safe direction.
    *
    * ASSUMPTION (r14 ADVICE): prior coverage is inferred FROM THE
    * MASK CHARACTER ITSELF — there is no span metadata — so a mask
    * char occurring NATURALLY in stored text (markdown emphasis
    * `*bold*`, shell globs) counts as a wildcard too: it can anchor
    * fires the original text never contained, which over-masks, and
    * in hard-delta mode can take down a document that never matched
    * any pattern. A corpus whose text can contain the mask char
    * natively must either redact with a char that cannot occur
    * (U+FFFD is the conventional choice) or accept the inflated
    * cover; [[redactConservative]] enforces the same rule it always
    * enforced for patterns (no pattern may contain the mask char)
    * but CANNOT validate the corpus side cheaply — the trade is
    * documented rather than silently made.
    *
    * Returns (final text, newly-masked char count, maximal runs of
    * newly-masked chars, per-pattern evidential fire counts).
    * O(iterations · |pats| · |text|) per doc — affordable because
    * rescrub deltas are SMALL (a growth event adds entries; it does
    * not re-ship the catalog).
    */
  private[operators] def conservativeCover(text: String,
      pats: Array[String], mask: Char, caseFold: Boolean)
      : (String, Long, Long, Array[Long]) = {
    val n = text.length
    val covered = new Array[Boolean](n)
    var i = 0
    while (i < n) { covered(i) = text.charAt(i) == mask; i += 1 }
    val newlyCovered = new Array[Boolean](n)
    val hits = new Array[Long](pats.length)
    var changed = true
    while (changed) {
      changed = false
      var p = 0
      while (p < pats.length) {
        val pat = pats(p)
        var s = 0
        val last = n - pat.length
        while (s <= last) {
          var j = 0
          var ok = true
          var visible = false
          while (ok && j < pat.length) {
            if (!covered(s + j)) {
              val c = text.charAt(s + j)
              val f = if (caseFold) foldChar(c) else c
              val q =
                if (caseFold) foldChar(pat.charAt(j)) else pat.charAt(j)
              if (f != q) ok = false else visible = true
            }
            j += 1
          }
          if (ok && visible) {
            hits(p) += 1L
            var k = s
            while (k < s + pat.length) {
              if (!covered(k)) {
                covered(k) = true
                newlyCovered(k) = true
                changed = true
              }
              k += 1
            }
          }
          s += 1
        }
        p += 1
      }
    }
    val sb = new java.lang.StringBuilder(n)
    var nMasked = 0L
    var nSpans = 0L
    var prev = false
    i = 0
    while (i < n) {
      sb.append(if (covered(i)) mask else text.charAt(i))
      if (newlyCovered(i)) {
        nMasked += 1
        if (!prev) nSpans += 1
      }
      prev = newlyCovered(i)
      i += 1
    }
    (sb.toString, nMasked, nSpans, hits)
  }

  /** CONSERVATIVE redaction over already-masked text — the DataFrame
    * face of [[conservativeCover]]: (doc_id, masked, n_masked,
    * n_spans) where n_masked/n_spans count NEWLY masked chars/runs
    * (zero ⟺ the delta changes nothing about this doc — the
    * convergence test rescrub's conservative mode uses). NULL text
    * passes through NULL. Assumes the corpus contains no NATURAL
    * occurrences of `mask` (see [[conservativeCover]] — a native
    * '*' counts as prior coverage and can fire patterns the text
    * never contained); pick an impossible mask char (U+FFFD) when
    * that assumption cannot hold.
    */
  def redactConservative(docs: DataFrame, patterns: Seq[String],
      mask: Char = '*', caseFold: Boolean = false): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    require(patterns.nonEmpty, "blocklist catalog is empty")
    require(patterns.forall(p => p != null && p.nonEmpty),
      "blocklist catalog has an empty pattern")
    require(patterns.forall(!_.contains(mask)),
      s"a pattern containing the mask char '$mask' cannot be scanned " +
        "conservatively")
    val pats = patterns.toArray
    Parallel.fan(docs).select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          if (text == null) (id, null: String, 0L, 0L)
          else {
            val (m, nm, ns, _) =
              conservativeCover(text, pats, mask, caseFold)
            (id, m, nm, ns)
          }
        }
      }
      .toDF("doc_id", "masked", "n_masked", "n_spans")
  }

  /** One standing text-index family [[rescrub]] repairs: `extract`
    * rebuilds the tier's rows from a (doc_id, text, …) document
    * frame (e.g. `Retrieval.docTermStats` for BM25 postings,
    * `Retrieval.positionalPostings`, `SpanDedup` grams,
    * `NearDup.winnowedFingerprints`).
    */
  final case class RescrubTier(name: String,
      table: graft.store.VersionedTable,
      extract: DataFrame => DataFrame,
      idCol: String = "doc_id")

  /** What one [[rescrub]] did: docs taken down by the hard delta,
    * docs rewritten by the soft delta, and the corpus version after
    * the fenced commits.
    */
  final case class RescrubReport(nHardDeleted: Int, nSoftTouched: Int,
      corpusVersion: Long)

  /** RETROACTIVE BLOCKLIST APPLICATION (r13 VERDICT #3) — the
    * catalog-growth event: [[gate]] admits and [[redact]] scrubs at
    * INGEST time against the catalog of that moment, so when the
    * catalog grows (the normal compliance event) already-landed docs
    * were admitted/scrubbed under the old catalog and nothing
    * re-scans them. `rescrub` closes that: ONE pass of the combined
    * DELTA automaton over the landed corpus (O(corpus·text +
    * delta-hits), independent of the full catalog's size — the whole
    * point of scanning the delta, not the grown catalog), then
    *
    *  1. docs hit by the HARD delta (newly banned) leave via the
    *     corpus `deleteKeys` copy-on-write path;
    *  2. docs hit by the SOFT delta rewrite via
    *     [[graft.store.VersionedTable.updateRows]] — delta
    *     occurrences cover-masked IN PLACE, untouched docs' files
    *     carried verbatim;
    *  3. every standing text index repairs for EXACTLY the touched
    *     docs: purge (hard + soft ids) then re-extract of the
    *     rewritten docs — a doc's text changing invalidates its
    *     postings/fingerprints, so purge alone is not repair.
    *
    * Tier ORDER is [[graft.store.CorpusForget.forgetDocs]]'s
    * crash-safety argument: the touched sets and rewritten frame are
    * computed from the PRE-COMMIT snapshot, index tiers repair FIRST
    * (purge value-idempotent, re-extract append txn-fenced), the
    * corpus commits LAST. A crash anywhere replays to convergence:
    * before the corpus commits the recomputed sets are identical;
    * after them the delta no longer matches anything (masked text
    * cannot re-match — patterns may not contain the mask char,
    * guarded below) so every step no-ops. Rescrub of a rescrubbed
    * corpus is a VALUE-level no-op.
    *
    * Equivalence contract (spec-pinned): rescrubbed corpus +
    * repaired indexes ≡ a fresh gate(hard)→redact(soft)→extract
    * build under the GROWN catalog, provided no delta occurrence in
    * the ORIGINAL text straddles a span the old catalog already
    * masked (the landed corpus only holds masked text, so a
    * straddling occurrence is not visible to ANY rescanner — the
    * monotone-cover caveat, documented rather than hidden; covers
    * being disjoint is the norm for phrase catalogs).
    *
    * Bounded-blast-radius contract: the touched-doc sets collect to
    * the driver (the `deleteKeys` key-list contract). A delta that
    * matches most of the corpus is a REBUILD decision (fresh
    * gate/redact/extract), not a repair.
    */
  def rescrub(corpus: graft.store.VersionedTable,
      deltaHard: Seq[String] = Seq.empty,
      deltaSoft: Seq[String] = Seq.empty,
      tiers: Seq[RescrubTier] = Seq.empty,
      mask: Char = '*', caseFold: Boolean = false,
      conservative: Boolean = false,
      txnId: Option[String] = None): RescrubReport = {
    require(deltaHard.nonEmpty || deltaSoft.nonEmpty,
      "rescrub with an empty catalog delta")
    require(deltaHard.intersect(deltaSoft).isEmpty,
      "a delta pattern cannot be both hard (takedown) and soft (mask)")
    require((deltaHard ++ deltaSoft).forall(!_.contains(mask)),
      s"a delta pattern containing the mask char '$mask' would " +
        "re-match already-masked text and break replay idempotence")
    // the snapshot needs no pin (r17): a VersionedTable read freezes
    // its FILE LIST in the manifest, so every later consumer re-reads
    // the same immutable bytes — the store itself is the
    // materialization, and the old Pin.reuse paid a table-sized
    // localCheckpoint/persist copy of the whole corpus for nothing
    val snap = corpus.read()
    // ---- touched-doc detection ----
    // exact mode: ONE corpus pass of the combined delta automaton,
    // ids split by pattern_id (hard wins — a doc leaving the corpus
    // never also rewrites). Conservative mode: the wildcard-tolerant
    // fixpoint cover, which treats already-masked chars as matching
    // anything — closes the monotone-cover caveat by construction
    // (never under-masks; may over-mask), at O(|delta| · text).
    val (hardIds, softIds): (Seq[Any], Seq[Any]) =
      if (!conservative) {
        val combined = deltaHard ++ deltaSoft
        val nHard = deltaHard.size
        // ONE bounded collect (r17): the touched set is the
        // deleteKeys key-list contract (driver-bounded by design), so
        // the hard/soft split happens on the driver — the old shape
        // pinned the hit frame and ran TWO filtered collect actions
        // against it (three jobs where one pass suffices)
        val hits = scanCounts(snap, combined, caseFold)
          .select(col("doc_id"), col("pattern_id")).distinct()
          .collect()
        val h: Seq[Any] =
          if (deltaHard.isEmpty) Seq.empty
          else hits.iterator.filter(_.getInt(1) < nHard)
            .map(_.get(0)).toSeq.distinct
        val hSet = h.toSet
        val s: Seq[Any] =
          if (deltaSoft.isEmpty) Seq.empty
          else hits.iterator.filter(_.getInt(1) >= nHard)
            .map(_.get(0)).toSeq.distinct
            .filterNot(hSet)
        (h, s)
      } else {
        // a doc is hard-touched when any hard pattern fires with a
        // visible anchor; soft-touched when the soft cover would
        // newly mask ≥ 1 char (n_masked > 0 ⟺ the delta changes the
        // doc — also the convergence test: a rescrubbed corpus
        // reports 0 everywhere)
        val h: Seq[Any] =
          if (deltaHard.isEmpty) Seq.empty
          else redactConservative(snap, deltaHard, mask, caseFold)
            .filter(col("n_masked") > 0)
            .select(col("doc_id")).collect().map(_.get(0)).toSeq
        val rem =
          if (h.isEmpty) snap else snap.filter(!col("doc_id").isin(h: _*))
        val s: Seq[Any] =
          if (deltaSoft.isEmpty) Seq.empty
          else redactConservative(rem, deltaSoft, mask, caseFold)
            .filter(col("n_masked") > 0)
            .select(col("doc_id")).collect().map(_.get(0)).toSeq
        (h, s)
      }
    if (hardIds.isEmpty && softIds.isEmpty)
      return RescrubReport(0, 0, corpus.currentVersion.getOrElse(
        throw new IllegalStateException("rescrub: empty corpus store")))
    // the rewritten frame, computed from the PRE-COMMIT snapshot —
    // feeds both the tier re-extracts and the corpus update, so the
    // two sides see byte-identical text
    val updated =
      if (softIds.isEmpty) None
      else {
        val softDocs = snap.filter(col("doc_id").isin(softIds: _*))
        val scrub =
          if (conservative)
            redactConservative(softDocs, deltaSoft, mask, caseFold)
          else redact(softDocs, deltaSoft, mask, caseFold)
        val m = scrub.select(col("doc_id"), col("masked").as("text"))
        Some(graft.core.Pin.reuse(
          softDocs.drop("text").join(m, Seq("doc_id"))
            .select(snap.columns.map(col).toIndexedSeq: _*)))
      }
    // ---- tiers first ----
    // each tier's purge + re-extract append are fenced as a PAIR on
    // the append's txn: a replay that re-ran the purge after the
    // append landed would delete the re-extracted rows while the
    // fenced append skips — the purge alone is only value-idempotent
    // when no append follows it
    val touched = hardIds ++ softIds
    tiers.foreach { t =>
      val idxTxn = txnId.map(id => s"$id-idx-${t.name}")
      val pairDone = updated.nonEmpty && idxTxn.exists(t.table.txnCommitted)
      if (!pairDone) {
        if (t.table.currentVersion.nonEmpty)
          t.table.deleteKeys(t.idCol, touched): Unit
        updated.foreach(u => t.table.commit(t.extract(u), idxTxn): Unit)
      }
    }
    // ---- fenced corpus commits last ----
    if (hardIds.nonEmpty)
      corpus.deleteKeys("doc_id", hardIds, txnId.map(_ + "-hard")): Unit
    val v = updated match {
      case None => corpus.currentVersion.get
      case Some(u) =>
        // the transform ignores its input and substitutes the
        // precomputed masked frame: the matched rows ARE the softIds
        // docs by construction, schema preserved
        corpus.updateRows("doc_id", softIds, _ => u,
          txnId.map(_ + "-soft"))
    }
    RescrubReport(hardIds.size, softIds.size, v)
  }

  /** Q173 — RESCRUB END-TO-END, the catalog-growth axis of the
    * q153/q170 fresh-build contract: `documents` lands soft-scrubbed
    * under the OLD catalog (`customer` masked) into a versioned
    * corpus store with a standing BM25 postings table; the catalog
    * then GROWS (`scan slow` hard — newly banned; `fast table`
    * soft — newly masked); [[rescrub]] takes down the newly-banned
    * docs, rewrites the newly-masked ones copy-on-write, repairs the
    * postings for exactly the touched docs, and the query serves
    * top-5 BM25 from the REPAIRED standing table over the surviving
    * corpus. The oracle computes the fresh build under the FULL
    * catalog directly — hash-for-hash equality proves the whole
    * chain (the fixture catalogs are pairwise non-overlapping in
    * text, so the monotone-cover caveat never bites).
    */
  def q173RescrubRepair(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    val softOld = Seq("customer")
    val hardDelta = Seq("scan slow")
    val softDelta = Seq("fast table")
    val landed = redact(docs, softOld)
      .select($"doc_id", $"masked".as("text"))
    val root = graft.core.Scratch.dir(spark, "graft-rescrub")
    val corpus = new graft.store.VersionedTable(spark, s"$root/corpus",
      statsCols = Seq("doc_id"))
    corpus.commit(landed)
    val bm25 = new graft.store.VersionedTable(spark, s"$root/bm25",
      statsCols = Seq("doc_id"))
    bm25.commit(Retrieval.docTermStats(corpus.read()))
    rescrub(corpus, hardDelta, softDelta,
      Seq(RescrubTier("bm25", bm25, Retrieval.docTermStats)),
      txnId = Some("q173-grow")): Unit
    val queries = Retrieval.prefixQueries(corpus.read())
    IndexMaintenance.snapshotAndDrop(
      Retrieval.bm25TopKFromIndex(bm25.read(), queries, k = 5)
        .orderBy($"query_id", $"rank"), root)
  }

  /** DuckDB oracle for [[q173RescrubRepair]]: the fresh build under
    * the GROWN catalog — gate out `scan slow` docs, cover-mask
    * `customer` ∪ `fast table` positionally, run the q103 BM25 chain
    * over the scrubbed corpus.
    */
  def rescrubOracleSql: String =
    s"""WITH pats(pattern) AS (VALUES ('customer'), ('fast table')),
       | base AS (SELECT doc_id, text FROM documents
       |   WHERE NOT contains(text, 'scan slow')),
       |${maskingCoreCtesSql.replace("FROM documents", "FROM base")},
       | scrub AS (SELECT b.doc_id, coalesce(a.masked, '') AS text
       |   FROM base b LEFT JOIN agg a USING (doc_id)),
       | ${Retrieval.bm25CtesSql().replace("FROM documents", "FROM scrub")}
       |SELECT query_id,
       |  row_number() OVER (PARTITION BY query_id
       |    ORDER BY ticks DESC, doc_id) AS rank,
       |  doc_id, round(ticks / 1000000.0, 6) AS score
       |FROM sc
       |QUALIFY rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** The q169 fixture catalog: corpus-vocabulary phrases, every entry
    * BORDERLESS (no proper prefix equals a suffix), so occurrences of
    * one pattern cannot overlap themselves and DuckDB's
    * non-overlapping replace-count equals the automaton's overlapping
    * end-position count (bordered patterns like "aa" are pinned by
    * the differential spec instead, where the oracle counts end
    * positions directly). "table" nests inside "fast table" —
    * exercising the fail-chain output merge on the fixture, not just
    * in specs.
    */
  val q169Patterns: Seq[String] = Seq(
    "fast table", "table", "scan slow", "customer", "window spark",
    "merge batch part", "no such phrase anywhere")

  /** Q169 — blocklist census over `documents` at the fixture catalog:
    * per pattern, how many docs it fires in and how many total
    * occurrences (zero rows retained).
    */
  def q169BlocklistCensus(spark: SparkSession, dir: String): DataFrame =
    census(Tables.load(spark, dir, "documents"), q169Patterns)

  /** DuckDB oracle for [[q169BlocklistCensus]]: catalog × documents
    * cross join; per-doc occurrence count via the replace-length
    * identity (exact for the borderless fixture catalog — see
    * [[q169Patterns]]).
    */
  def censusOracleSql: String = {
    val vals = q169Patterns.zipWithIndex
      .map { case (p, i) => s"($i, '${p.replace("'", "''")}')" }
      .mkString(", ")
    s"""WITH pats(pattern_id, pattern) AS (VALUES $vals)
       |SELECT p.pattern_id, p.pattern,
       |  count(*) FILTER (WHERE contains(d.text, p.pattern))::BIGINT
       |    AS n_docs,
       |  coalesce(sum((length(d.text) - length(replace(d.text, p.pattern, '')))
       |    // length(p.pattern)), 0)::BIGINT AS n_hits
       |FROM pats p CROSS JOIN documents d
       |GROUP BY 1, 2
       |ORDER BY p.pattern_id""".stripMargin
  }
}
