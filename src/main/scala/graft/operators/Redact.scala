package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** PII scrubbing — the redaction pass every public-data pipeline runs
  * before training: detect and mask emails, phone numbers, and IPv4
  * addresses. Pure per-row regex expressions (codegen'd
  * `regexp_count`/`regexp_replace`, no UDF, no shuffle) — the scan is
  * the only cost at any corpus size, and the pass composes with any
  * other per-row gate on the same scan.
  *
  * Patterns stay in the dialect-shared regex subset (character
  * classes, bounded repetition, word boundaries — no lookarounds), so
  * an external auditor can re-run them in any RE2-compatible engine.
  */
object Redact {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(emailRe))
  def phoneCount(text: Column): Column = regexp_count(text, lit(phoneRe))
  def ipv4Count(text: Column): Column  = regexp_count(text, lit(ipv4Re))

  /** Mask every match with a typed placeholder. IPs run after phones
    * so a dotted phone (`555.123.4567`) is claimed by the more
    * specific phone pattern first.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]"),
      ipv4Re, "[IP]")

  /** Per-document PII hit counts plus the redacted text. */
  def scan(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_emails", emailCount(t).cast("long"))
      .withColumn("n_phones", phoneCount(t).cast("long"))
      .withColumn("n_ipv4", ipv4Count(t).cast("long"))
      .withColumn("redacted", redact(t))
  }

  /** Q69 — per-language PII audit summary over `documents` (clean
    * corpus ⇒ all-zero counts; the oracle cross-checks that both
    * engines' regex dialects agree on every real document, and the
    * planted-fixture spec proves the detection itself).
    */
  def q69PiiScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scan(Tables.load(spark, dir, "documents"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_emails").as("emails"),
        sum($"n_phones").as("phones"),
        sum($"n_ipv4").as("ips"))
      .orderBy($"lang")
  }

  // ---- SECRETS / CREDENTIAL scanning (r12) --------------------------
  //
  // The scrubbing pass public code corpora run beyond PII regexes
  // (the detect-secrets / trufflehog class of tools): leaked payment
  // card numbers, API-key-shaped tokens, and high-entropy credential
  // blobs. Three detectors over whitespace tokens, each CHECKSUM- or
  // MEASURE-verified rather than regex-only, all in exact integer
  // arithmetic so both engines agree token-for-token:
  //
  //  - card: 13-19 digit token whose Luhn checksum (double every 2nd
  //    digit from the right, subtract 9 above 9, sum ≡ 0 mod 10)
  //    verifies — a digit run that LOOKS like a card but fails the
  //    checksum is NOT counted (the planted negative control);
  //  - key: a prefixed credential shape `^[a-z]{2,8}_[A-Za-z0-9]{24,}$`
  //    (the public provider-token convention: short lowercase vendor
  //    prefix, underscore, long alphanumeric body);
  //  - entropy: token of 20-48 chars over the base64-ish charset
  //    whose Shannon entropy is ≥ 3.5 bits/char. Entropy is computed
  //    in exact integer MICRO-BITS via a shared log2-tick table
  //    L(k) = round(1e6·log2 k) for k ≤ 48 (one Scala constant
  //    interpolated into BOTH engines): n·H µbits = Σ_c cnt_c·(L(n) −
  //    L(cnt_c)), compared as Σ ≥ 3 500 000·n — no float, no ln at
  //    query time, no rounding seam.
  //
  // Classes are EXCLUSIVE with precedence card > key > entropy (a
  // provider key is entropy-dense; counting it twice would double-
  // report). Per-row HOF projection over the scan — zero shuffles,
  // the whole pass rides the corpus read at any scale, and composes
  // with q69's PII masking on the same projection.

  /** Shared log2 tick table: element k (1-based) = round(1e6·log2 k),
    * k = 1..48. 48 caps the entropy-candidate token length (longer
    * tokens are out of detector scope — documented, and guarded so
    * ANSI `element_at` never sees an out-of-range index).
    */
  val log2Ticks: IndexedSeq[Long] =
    (1 to 48).map(k => math.round(1e6 * math.log(k) / math.log(2)))

  val entropyMinLen = 20
  val entropyMaxLen = 48
  /** Entropy floor in µbits/char (3.5 bits/char). */
  val entropyFloorMicroBits = 3500000L

  val cardRe    = "^[0-9]{13,19}$"
  val keyRe     = "^[a-z]{2,8}_[A-Za-z0-9]{24,}$"
  val charsetRe = "^[A-Za-z0-9+/=_-]+$"

  private def log2Arr: Column = array(log2Ticks.map(lit): _*)

  /** Luhn checksum of a digit-only token (sum over all digits with
    * every 2nd from the right doubled, 9 subtracted above 9).
    */
  private def luhnSum(t: Column): Column =
    aggregate(
      sequence(lit(1), length(t)),
      lit(0L),
      (acc, i) => {
        val d = (ascii(t.substr(i, lit(1))) - lit(48)).cast("long")
        val doubled = when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        acc + when((length(t) - i) % 2 === 1, doubled).otherwise(d)
      })

  def isCard(t: Column): Column =
    when(t.rlike(cardRe), luhnSum(t) % 10 === 0).otherwise(lit(false))

  def isKey(t: Column): Column = t.rlike(keyRe)

  /** Entropy-gated blob detector (exclusive of card/key by the CASE
    * in [[secretsScan]]): charset + length window + exact µbit
    * Shannon test. The `when` guards keep `sequence`/`element_at`
    * from ever evaluating on out-of-window tokens (ANSI).
    */
  def isEntropyBlob(t: Column): Column = {
    val n = length(t)
    val candidate = n.between(entropyMinLen, entropyMaxLen) &&
      t.rlike(charsetRe)
    val chars = transform(sequence(lit(1), n), i => t.substr(i, lit(1)))
    val microBits = aggregate(
      array_distinct(chars),
      lit(0L),
      (acc, c) => {
        val cnt = size(filter(chars, x => x === c))
        acc + cnt.cast("long") *
          (element_at(log2Arr, n) - element_at(log2Arr, cnt))
      })
    when(candidate, microBits >= lit(entropyFloorMicroBits) * n)
      .otherwise(lit(false))
  }

  /** Exclusive class code per token — 1 card, 2 key, 3 entropy blob,
    * 0 clean — evaluated ONCE per token (the `when` chain
    * short-circuits, so the Luhn fold runs only on card-shaped
    * tokens and each detector at most once). This is the single
    * classification pass [[secretsScan]] and [[redactSecrets]] both
    * ride: the r12 shape re-inlined the whole detector chain per
    * counter (isCard ×3, isKey ×2 — interpreted, HOFs are
    * CodegenFallback), tripling per-token work for nothing.
    */
  def classifyTokens(toks: Column): Column =
    transform(toks, t =>
      when(isCard(t), lit(1))
        .when(isKey(t), lit(2))
        .when(isEntropyBlob(t), lit(3))
        .otherwise(lit(0)))

  /** Per-document secret counts by class over space-split tokens of
    * `textCol` — exclusive classes, precedence card > key > entropy.
    * One classification pass; the three counters are `size(filter)`
    * over the small class-code array, not re-runs of the detectors.
    */
  def secretsScan(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("_cls", classifyTokens(split(col(textCol), " ")))
      .withColumn("n_cards",
        size(filter(col("_cls"), c => c === 1)).cast("long"))
      .withColumn("n_keys",
        size(filter(col("_cls"), c => c === 2)).cast("long"))
      .withColumn("n_entropy",
        size(filter(col("_cls"), c => c === 3)).cast("long"))
      .drop("_cls")

  // -- typed classifier (the q122 idiom) ----------------------------
  //
  // The Column classifier above keeps the scan composable (redaction,
  // streaming legs, ad-hoc projections), but HOFs are CodegenFallback:
  // every token walks an interpreted expression tree. The counting
  // query (q157) only needs three Longs per document, so it runs the
  // SAME classification as a typed per-partition loop over JVM
  // primitives — compiled, allocation-light, and differentially
  // spec-pinned against the Column form (SecretsScanSpec) so the two
  // implementations cannot drift.

  private val cardPat = java.util.regex.Pattern.compile(cardRe)
  private val keyPat = java.util.regex.Pattern.compile(keyRe)
  private val charsetPat = java.util.regex.Pattern.compile(charsetRe)

  /** Luhn checksum, Scala form of [[luhnSum]]: position i (1-based
    * from the left) doubled iff (len − i) is odd.
    */
  private def luhnSumScala(t: String): Long = {
    var sum = 0L
    var i = 0
    val n = t.length
    while (i < n) {
      val d = (t.charAt(i) - '0').toLong
      sum +=
        (if ((n - (i + 1)) % 2 == 1) { val dd = d * 2; if (dd > 9) dd - 9 else dd }
         else d)
      i += 1
    }
    sum
  }

  /** Scala form of [[isEntropyBlob]]: charset + length window + the
    * exact µbit Shannon test over the shared tick table.
    */
  private def isEntropyBlobScala(t: String): Boolean = {
    val n = t.length
    if (n < entropyMinLen || n > entropyMaxLen ||
      !charsetPat.matcher(t).matches()) return false
    // charset is ASCII by the regex gate — count into a dense array
    val counts = new Array[Int](128)
    var i = 0
    while (i < n) { counts(t.charAt(i)) += 1; i += 1 }
    var micro = 0L
    var c = 0
    while (c < 128) {
      val k = counts(c)
      if (k > 0) micro += k.toLong * (log2Ticks(n - 1) - log2Ticks(k - 1))
      c += 1
    }
    micro >= entropyFloorMicroBits * n
  }

  /** Scala mirror of the [[classifyTokens]] per-token CASE — 1 card,
    * 2 key, 3 entropy blob, 0 clean, same precedence (a Luhn-failing
    * card-shaped token falls through to the later detectors, exactly
    * like the Column CASE), same Luhn fold, same tick table.
    */
  def classifyToken(t: String): Int =
    if (cardPat.matcher(t).matches() && luhnSumScala(t) % 10 == 0) 1
    else if (keyPat.matcher(t).matches()) 2
    else if (isEntropyBlobScala(t)) 3
    else 0

  /** (n_cards, n_keys, n_entropy) of a document — the typed counting
    * pass over space-split tokens.
    */
  def secretsCounts(text: String): (Long, Long, Long) = {
    var c = 0L; var k = 0L; var e = 0L
    if (text != null) {
      val toks = text.split(" ", -1)
      var i = 0
      while (i < toks.length) {
        classifyToken(toks(i)) match {
          case 1 => c += 1
          case 2 => k += 1
          case 3 => e += 1
          case _ => ()
        }
        i += 1
      }
    }
    (c, k, e)
  }

  /** Mask every detected secret token with its class placeholder —
    * the action half of the scan (post-redaction rescan is all-zero;
    * spec-pinned). Shares [[classifyTokens]]: tokens and their class
    * codes zip positionally.
    */
  def redactSecrets(text: Column): Column = {
    val toks = split(text, " ")
    array_join(
      zip_with(toks, classifyTokens(toks), (t, c) =>
        when(c === 1, lit("[CARD]"))
          .when(c === 2, lit("[KEY]"))
          .when(c === 3, lit("[SECRET]"))
          .otherwise(t)),
      " ")
  }

  // -- q157 fixture: planted secrets derived from doc_id ------------

  private val P = 2147483647L
  private val entAlphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
  private val keyAlphabet =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"

  /** The planted-token scramble: two Lehmer steps with a SQUARING in
    * the middle (the q154 device — affine-only scrambles correlate
    * across ids). `k` separates plant classes. Shared with the q160
    * markdown plants.
    */
  private[operators] def scramble(id: Column, i: Column, k: Int): Column = {
    val s1 = (id * 1000003L + i * 8191L + lit(k.toLong)) % P
    val s2 = (s1 * s1) % P
    (s2 * 48271L) % P
  }

  /** The 15 payload digits of doc `id`'s planted card. */
  private def cardDigits(id: Column): Column =
    transform(sequence(lit(1), lit(15)),
      i => (scramble(id, i.cast("long"), 1) % 10).cast("int"))

  /** Luhn check digit for a 16-digit card whose first 15 digits are
    * `ds`: payload position i (1-based from the left) sits at
    * position 17−i from the right, doubled iff i is odd.
    */
  private def cardCheck(ds: Column): Column = {
    val s = aggregate(
      sequence(lit(1), lit(15)),
      lit(0L),
      (acc, i) => {
        val d = element_at(ds, i).cast("long")
        val doubled = when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        acc + when(i % 2 === 1, doubled).otherwise(d)
      })
    (lit(10L) - s % 10) % 10
  }

  /** A planted alphabet-indexed token of `len` chars for class `k`. */
  private def plantToken(id: Column, len: Int, k: Int,
      alphabet: String): Column =
    array_join(
      transform(sequence(lit(1), lit(len)), i =>
        lit(alphabet).substr(
          (scramble(id, i.cast("long"), k) % alphabet.length).cast("int")
            + 1, lit(1))),
      "")

  /** `documents.text` augmented with the planted secrets: a
    * Luhn-VALID card for every 7≡0 doc, a Luhn-INVALID near-card
    * (same digits, check+1) for every 7≡3 doc, a high-entropy blob
    * for every 11th, a zero-entropy `z`-run for every 13th, and a
    * prefixed key for every 17th — positives AND negative controls,
    * all derivable by both engines from `doc_id` alone.
    */
  def plantedText(id: Column, text: Column): Column = {
    val ds = cardDigits(id)
    val digitsStr = array_join(transform(ds, d => d.cast("string")), "")
    val validCard = concat(digitsStr, cardCheck(ds).cast("string"))
    val invalidCard =
      concat(digitsStr, ((cardCheck(ds) + 1) % 10).cast("string"))
    concat(
      coalesce(text, lit("")),
      when(id % 7 === 0, concat(lit(" "), validCard)).otherwise(lit("")),
      when(id % 7 === 3, concat(lit(" "), invalidCard)).otherwise(lit("")),
      when(id % 11 === 0,
        concat(lit(" "), plantToken(id, 24, 5, entAlphabet)))
        .otherwise(lit("")),
      when(id % 13 === 0, lit(" " + "z" * 24)).otherwise(lit("")),
      when(id % 17 === 0,
        concat(lit("  gk_"), plantToken(id, 24, 9, keyAlphabet)))
        .otherwise(lit("")))
  }

  /** Q157 — secrets scan over the planted corpus: per-doc class
    * counts for every doc with any hit. The oracle re-derives the
    * SAME planted text from `doc_id` and re-runs the SAME detectors
    * (shared regexes, shared Luhn fold, shared log2-tick table) — a
    * count mismatch means a detector, the checksum, or the entropy
    * arithmetic diverged between engines. The negative controls
    * (Luhn-invalid near-card, zero-entropy run) prove the detectors
    * discriminate rather than pattern-match.
    */
  def q157SecretsScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("text", plantedText($"doc_id", $"text"))
    // the typed counting pass (classifyToken) — compiled JVM loop over
    // primitives where the Column classifier walks an interpreted HOF
    // tree per token; differentially pinned ≡ secretsScan in the spec
    docs.select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)]
      .mapPartitions(_.flatMap { case (id, lang, text) =>
        val (c, k, e) = secretsCounts(text)
        if (c + k + e > 0) Iterator.single((id, lang, c, k, e))
        else Iterator.empty
      })
      .toDF("doc_id", "lang", "n_cards", "n_keys", "n_entropy")
      .orderBy($"doc_id")
  }

  /** DuckDB oracle for [[q157SecretsScan]] — same plants, same
    * detectors, token-level via unnest (row-wise SQL being DuckDB's
    * natural shape where Spark uses array HOFs; the ARITHMETIC is
    * textually shared: one scramble formula, one Luhn fold, one
    * interpolated log2-tick list).
    */
  def secretsOracleSql: String = {
    val lt = log2Ticks.mkString("[", ", ", "]")
    // the scramble for plant class k at position i, as SQL text
    // (qualifier disambiguates doc_id inside the aug join)
    def sc(k: Int, q: String = "doc_id") =
      s"((($q*1000003 + i*8191 + $k) % $P) * (($q*1000003 + i*8191 + $k) % $P) % $P) * 48271 % $P"
    s"""WITH ds AS (
       |  SELECT doc_id,
       |    list_transform(range(1, 16), i -> (${sc(1)} % 10)) AS d
       |  FROM documents),
       | card AS (
       |  SELECT doc_id,
       |    array_to_string(list_transform(d, x -> x::VARCHAR), '') AS body,
       |    (10 - list_sum(list_transform(range(1, 16), i ->
       |       CASE WHEN i % 2 = 1
       |         THEN CASE WHEN d[i::INT]*2 > 9 THEN d[i::INT]*2 - 9
       |              ELSE d[i::INT]*2 END
       |         ELSE d[i::INT] END)) % 10) % 10 AS chk
       |  FROM ds),
       | aug AS (
       |  SELECT d.doc_id, d.lang,
       |    coalesce(d.text, '')
       |    || CASE WHEN d.doc_id % 7 = 0
       |         THEN ' ' || c.body || c.chk::VARCHAR ELSE '' END
       |    || CASE WHEN d.doc_id % 7 = 3
       |         THEN ' ' || c.body || ((c.chk + 1) % 10)::VARCHAR
       |         ELSE '' END
       |    || CASE WHEN d.doc_id % 11 = 0
       |         THEN ' ' || array_to_string(list_transform(range(1, 25),
       |           i -> substr('$entAlphabet',
       |             (${sc(5, "d.doc_id")} % 36)::INT + 1, 1)), '')
       |         ELSE '' END
       |    || CASE WHEN d.doc_id % 13 = 0
       |         THEN ' ${"z" * 24}' ELSE '' END
       |    || CASE WHEN d.doc_id % 17 = 0
       |         THEN '  gk_' || array_to_string(list_transform(range(1, 25),
       |           i -> substr('$keyAlphabet',
       |             (${sc(9, "d.doc_id")} % 62)::INT + 1, 1)), '')
       |         ELSE '' END AS t2
       |  FROM documents d JOIN card c ON c.doc_id = d.doc_id),
       | tok AS (
       |  SELECT doc_id, lang, unnest(string_split(t2, ' ')) AS t
       |  FROM aug),
       | tokc AS (
       |  SELECT doc_id, lang, t,
       |    CASE WHEN length(t) BETWEEN $entropyMinLen AND $entropyMaxLen
       |           AND regexp_matches(t, '$charsetRe')
       |      THEN list_transform(range(1, length(t) + 1),
       |             i -> substr(t, i::INT, 1))
       |      ELSE NULL END AS cs
       |  FROM tok),
       | cls AS (
       |  SELECT doc_id, lang, t,
       |    CASE WHEN regexp_matches(t, '$cardRe')
       |      THEN list_sum(list_transform(range(1, length(t) + 1), i ->
       |        CASE WHEN (length(t) - i) % 2 = 1
       |          THEN CASE WHEN 2*(ascii(substr(t, i::INT, 1)) - 48) > 9
       |               THEN 2*(ascii(substr(t, i::INT, 1)) - 48) - 9
       |               ELSE 2*(ascii(substr(t, i::INT, 1)) - 48) END
       |          ELSE ascii(substr(t, i::INT, 1)) - 48 END)) % 10 = 0
       |      ELSE false END AS is_card,
       |    regexp_matches(t, '$keyRe') AS is_key,
       |    CASE WHEN cs IS NOT NULL
       |      THEN list_sum(list_transform(list_distinct(cs), c ->
       |             len(list_filter(cs, x -> x = c)) *
       |             ($lt[length(t)::INT] -
       |              $lt[len(list_filter(cs, x -> x = c))::INT])))
       |           >= $entropyFloorMicroBits::BIGINT * length(t)
       |      ELSE false END AS is_ent
       |  FROM tokc)
       |SELECT doc_id, lang,
       |  count(*) FILTER (WHERE is_card)::BIGINT AS n_cards,
       |  count(*) FILTER (WHERE NOT is_card AND is_key)::BIGINT AS n_keys,
       |  count(*) FILTER (WHERE NOT is_card AND NOT is_key AND is_ent)::BIGINT
       |    AS n_entropy
       |FROM cls GROUP BY doc_id, lang
       |HAVING count(*) FILTER (WHERE is_card OR is_key OR is_ent) > 0
       |ORDER BY doc_id""".stripMargin
  }
}
