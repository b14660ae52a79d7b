package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole [[graft.operators.UrlNorm.canonicalize]] rule chain as
  * ONE native expression: url →
  * struct(canonical_url, host, domain, n_params).
  *
  * Why (r17, VERDICT #3): the Column formulation is a 5-layer
  * regexp/HOF/CASE chain whose ~10-node-per-rule expression tree —
  * including two literal IN-sets of ~190 public suffixes — is
  * re-walked by every optimizer pass and re-emitted by codegen SOURCE
  * GENERATION on every execution (Spark caches compilation, not
  * generation; measured ~0.3 s driver time per execution on the
  * q111–q142 family that plans this chain). Folding the chain into a
  * single node makes the tree walk O(1) and the per-row evaluation a
  * single static-method call — whole-stage-codegen-friendly, no
  * regex Matcher allocation, no per-rule intermediate rows.
  *
  * Exact-equivalence contract with the Column chain (pinned by
  * `UrlCanonExprSpec` on the synthetic-URL grammar plus adversarial
  * inputs, and end-to-end by every q111–q142 oracle):
  *
  *  - `regexp_replace(url, "#.*$", "")` / `":80$"` / `":443$"` /
  *    `":[0-9]+$"` are emulated with Java-regex `$` semantics: a
  *    match must end at end-of-input or before a FINAL line
  *    terminator (backslash-n, backslash-r, U+0085, U+2028, U+2029, with backslash-r-backslash-n one terminator), and `.` / the char classes never match
  *    a terminator — so `"http://h#a\nb"` keeps its fragment exactly
  *    as the regex form does.
  *  - `lower()` is [[UTF8String.toLowerCase]] — the same call
  *    `Lower` makes under the default UTF8_BINARY collation.
  *  - `split(s, "&")`/`split(s, "\\.")` keep trailing empty strings
  *    (Spark split's limit −1), unlike bare `String.split`.
  *  - `array_sort` over strings is UTF8_BINARY ascending = code-point
  *    lexicographic (UTF-8 byte order), NOT `String.compareTo`'s
  *    UTF-16 code-unit order — the comparator below walks code
  *    points so supplementary characters sort identically.
  */
case class UrlCanonExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = UrlCanonExpr.structType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"graft_url_canon needs a string argument, got ${child.dataType}")

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_url_canon"

  override def nullSafeEval(s: Any): Any =
    UrlCanonExpr.canon(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.UrlCanonExpr.canon($s);")

  override protected def withNewChildInternal(
      newChild: Expression): UrlCanonExpr = copy(child = newChild)
}

object UrlCanonExpr {

  val structType: StructType = StructType(Seq(
    StructField("canonical_url", StringType, nullable = false),
    StructField("host", StringType, nullable = false),
    StructField("domain", StringType, nullable = false),
    StructField("n_params", LongType, nullable = false)))

  def column(s: Column): Column =
    ExpressionUtils.column(UrlCanonExpr(ExpressionUtils.expression(s)))

  // the shared public-suffix constants as hash sets (the Column form
  // held them as InSet constants — same membership, O(1) probe)
  private val ps2: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    graft.operators.UrlNorm.PublicSuffixes2.foreach(h.add)
    h
  }
  private val ps3: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    graft.operators.UrlNorm.PublicSuffixes3.foreach(h.add)
    h
  }

  private def isTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' ||
      c == '\u2029'

  /** Non-MULTILINE Java-regex `$` match positions of `s`, descending:
    * end-of-input; before a final lone terminator; before a final
    * `\r\n` (one terminator — the position between `\r` and `\n` is
    * NOT a `$` position).
    */
  private def dollarPositions(s: String): Array[Int] = {
    val n = s.length
    if (n >= 2 && s.charAt(n - 1) == '\n' && s.charAt(n - 2) == '\r')
      Array(n, n - 2)
    else if (n >= 1 && isTerm(s.charAt(n - 1))) Array(n, n - 1)
    else Array(n)
  }

  /** `s.replaceAll("#.*$", "")`: drop [first matching `#`, greedy `$`
    * position] — a `#` matches only when a `$` position is reachable
    * without `.` crossing a line terminator.
    */
  private def stripFragment(s: String): String = {
    var idx = s.indexOf('#')
    if (idx < 0) return s
    val dps = dollarPositions(s)
    val n = s.length
    while (idx >= 0) {
      var t = idx + 1 // first terminator index after the '#', else n
      while (t < n && !isTerm(s.charAt(t))) t += 1
      var di = 0 // dps descending: first valid is the greedy match
      while (di < dps.length) {
        val p = dps(di)
        if (p >= idx + 1 && p <= t)
          return s.substring(0, idx) + s.substring(p)
        di += 1
      }
      idx = s.indexOf('#', idx + 1)
    }
    s
  }

  /** `s.replaceAll(lit + "$", "")` for a literal with no terminator
    * chars — at most one match, anchored to a `$` position.
    */
  private def stripLiteralSuffix(s: String, lit: String): String = {
    val dps = dollarPositions(s)
    var di = 0
    while (di < dps.length) {
      val m = dps(di) - lit.length
      if (m >= 0 && s.regionMatches(m, lit, 0, lit.length))
        return s.substring(0, m) + s.substring(dps(di))
      di += 1
    }
    s
  }

  /** `s.replaceAll(":[0-9]+$", "")` — the leftmost `:` followed by
    * ≥ 1 digits reaching a `$` position (digits never being
    * terminators, the run is contiguous).
    */
  private def stripAnyPort(s: String): String = {
    val dps = dollarPositions(s)
    var di = 0
    while (di < dps.length) {
      val p = dps(di)
      // walk the digit run backwards from p; the match start is the
      // ':' before the LONGEST run (leftmost match position)
      var m = p
      while (m > 0 && s.charAt(m - 1) >= '0' && s.charAt(m - 1) <= '9')
        m -= 1
      if (m < p && m > 0 && s.charAt(m - 1) == ':')
        return s.substring(0, m - 1) + s.substring(p)
      di += 1
    }
    s
  }

  /** Spark `split(s, sep)` (limit −1: trailing empties kept), single
    * literal char separator.
    */
  private def splitKeep(s: String, sep: Char): Array[String] = {
    val out = new java.util.ArrayList[String]()
    var from = 0
    var i = s.indexOf(sep)
    while (i >= 0) {
      out.add(s.substring(from, i))
      from = i + 1
      i = s.indexOf(sep, from)
    }
    out.add(s.substring(from))
    out.toArray(new Array[String](out.size))
  }

  /** UTF8_BINARY string order = code-point lexicographic. */
  private val cpOrder: java.util.Comparator[String] =
    new java.util.Comparator[String] {
      override def compare(a: String, b: String): Int = {
        val la = a.length
        val lb = b.length
        var i = 0
        while (i < la && i < lb) {
          val ca = a.codePointAt(i)
          val cb = b.codePointAt(i)
          if (ca != cb) return Integer.compare(ca, cb)
          i += Character.charCount(ca)
        }
        Integer.compare(la - i, lb - i)
      }
    }

  private def lowerAsSpark(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  /** The full rule chain, one pass; see the class Scaladoc for the
    * per-rule equivalence notes.
    */
  def canon(u: UTF8String): InternalRow = {
    val nofrag = stripFragment(u.toString)
    val n = nofrag.length
    // scheme: ^[A-Za-z][A-Za-z0-9+.-]*:// — the name class excludes
    // ':' and '/', so the maximal run needs no backtracking
    var schemeEnd = -1
    if (n > 0) {
      val c0 = nofrag.charAt(0)
      if ((c0 >= 'A' && c0 <= 'Z') || (c0 >= 'a' && c0 <= 'z')) {
        var i = 1
        while (i < n && {
          val c = nofrag.charAt(i)
          (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
            (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'
        }) i += 1
        if (i + 3 <= n && nofrag.charAt(i) == ':' &&
          nofrag.charAt(i + 1) == '/' && nofrag.charAt(i + 2) == '/')
          schemeEnd = i
      }
    }
    val scheme =
      if (schemeEnd < 0) "" else lowerAsSpark(nofrag.substring(0, schemeEnd))
    var rawhost = ""
    var path0 = ""
    if (schemeEnd >= 0) {
      val hs = schemeEnd + 3
      var he = hs
      while (he < n && {
        val c = nofrag.charAt(he); c != '/' && c != '?' && c != '#'
      }) he += 1
      rawhost = lowerAsSpark(nofrag.substring(hs, he))
      var pe = he
      while (pe < n && {
        val c = nofrag.charAt(pe); c != '?' && c != '#'
      }) pe += 1
      path0 = nofrag.substring(he, pe)
    }
    // query params: first '?' anywhere (unanchored \?([^#]*)), capture
    // to the next '#'/end; split '&', drop empties and utm_*, sort
    val qi = nofrag.indexOf('?')
    val params: Array[String] =
      if (qi < 0) Array.empty
      else {
        var qe = nofrag.indexOf('#', qi + 1)
        if (qe < 0) qe = n
        val raw = splitKeep(nofrag.substring(qi + 1, qe), '&')
        val keep = new java.util.ArrayList[String]()
        var i = 0
        while (i < raw.length) {
          val p = raw(i)
          if (p.length > 0 && !p.startsWith("utm_")) keep.add(p)
          i += 1
        }
        val arr = keep.toArray(new Array[String](keep.size))
        java.util.Arrays.sort(arr, cpOrder)
        arr
      }
    val host = scheme match {
      case "http"  => stripLiteralSuffix(rawhost, ":80")
      case "https" => stripLiteralSuffix(rawhost, ":443")
      case _       => rawhost
    }
    val labels = splitKeep(stripAnyPort(host), '.')
    val nl = labels.length
    def sufK(k: Int): String = {
      val sb = new java.lang.StringBuilder()
      var i = nl - k
      while (i < nl) {
        if (i > nl - k) sb.append('.')
        sb.append(labels(i))
        i += 1
      }
      sb.toString
    }
    val pubLen =
      if (nl >= 3 && ps3.contains(sufK(3))) 3
      else if (nl >= 2 && ps2.contains(sufK(2))) 2
      else 1
    val regLen = math.min(pubLen + 1, nl)
    val domain = sufK(regLen)
    val sb = new java.lang.StringBuilder(scheme.length + host.length + 32)
    sb.append(scheme).append("://").append(host)
    if (path0.isEmpty) sb.append('/') else sb.append(path0)
    if (params.nonEmpty) {
      sb.append('?')
      var i = 0
      while (i < params.length) {
        if (i > 0) sb.append('&')
        sb.append(params(i))
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString),
      UTF8String.fromString(host),
      UTF8String.fromString(domain),
      params.length.toLong))
  }
}
