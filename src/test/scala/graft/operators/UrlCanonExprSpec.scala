package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-equivalence of the native [[org.apache.spark.sql.graft
  * .UrlCanonExpr]] path ([[UrlNorm.canonicalize]]) with the layered
  * Column chain it replaced ([[UrlNorm.canonicalizeViaColumns]]) —
  * every rule's regex/HOF semantics emulated exactly, proven on the
  * full synthetic grammar plus adversarial shapes the grammar never
  * produces (missing scheme, stray `?`/`#`, ports on odd schemes,
  * unicode hosts and params, trailing dots, line terminators against
  * the Java-regex `$` rules).
  */
class UrlCanonExprSpec extends SparkSpec {
  import spark.implicits._

  private def assertSame(urls: Seq[String]): Unit = {
    val df = urls.zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("doc_id", "url")
    val cols = Seq($"doc_id", $"canonical_url", $"host", $"domain",
      $"n_params")
    val native = UrlNorm.canonicalize(df).select(cols: _*)
      .collect().toSeq
    val viaCols = UrlNorm.canonicalizeViaColumns(df).select(cols: _*)
      .collect().toSeq
    native.zip(viaCols).zipWithIndex.foreach { case ((n, c), i) =>
      assert(n === c, s"mismatch for url ${urls(i)}")
    }
  }

  test("synthetic grammar: native == Column chain over 2000 ids") {
    val df = spark.range(0, 2000).select($"id".as("doc_id"),
      UrlNorm.syntheticUrl($"id").as("url"))
    val cols = Seq($"doc_id", $"canonical_url", $"host", $"domain",
      $"n_params")
    val native = UrlNorm.canonicalize(df).select(cols: _*).collect().toSeq
    val viaCols = UrlNorm.canonicalizeViaColumns(df)
      .select(cols: _*).collect().toSeq
    assert(native === viaCols)
  }

  test("adversarial shapes: native == Column chain") {
    assertSame(Seq(
      "",
      "no-scheme-at-all",
      "http://",
      "http:///path-only",
      "HtTp://MiXeD.CaSe.CoM:80",
      "https://h:443",
      "https://h:443x/p",
      "ftp://h:80/p",
      "http://h:080/p",
      "http://h:80:80/p",
      "http://host..double..dots../p",
      "http://trailing.dot./p",
      "http://.leading.dot/p",
      "http://a.b.c.d.e.f.co.uk/deep?b=2&a=1&utm_source=x&utm_=y&",
      "http://x.k12.ca.us",
      "http://deep.x.k12.ca.us",
      "http://k12.ca.us",
      "http://ca.us",
      "http://us",
      "http://co.uk",
      "http://x.co.uk:8080?z&y=&=x&a==b",
      "http://h/p?",
      "http://h/p?#",
      "http://h/p?&&&",
      "?orphan=1&utm_x=2",
      "#only-fragment",
      "http://h#f1#f2",
      "http://h/p#frag?not-a-query=1",
      "http://h/p?q=1#frag?more=2",
      "1http://h/p",
      "+http://h/p",
      "sch+me-1.x://Host.Co.JP:443/P?Utm_a=1&UTM_b=2&utm_c=3",
      "http://HÖST.Straße.example/päth?ä=1&Z=2&ß=3",
      "http://日本.example.co.jp/パス?京=1&あ=2"))
  }

  test("line terminators: Java-regex $ semantics match") {
    assertSame(Seq(
      "http://h/p#frag\n",
      "http://h/p#frag\r\n",
      "http://h/p#a\nb",
      "http://h/p#a\nb#c",
      "http://h/p#a\r",
      "http://h:80\n",
      "http://h:80\r\n",
      "http://h:80\rx",
      "https://h:443\n",
      "http://h:8080\n/p",
      "\nhttp://h/p#f",
      "http://h\n:80/p#f\n"))
  }

  test("param sort is code-point order (supplementary chars)") {
    // U+10348 (surrogate pair) must sort AFTER U+FB00 — UTF-8 byte
    // order, where String.compareTo would order them the other way
    assertSame(Seq(
      "http://h/p?\uD800\uDF48=1&\uFB00=2",
      "http://h/p?\uFB00=2&\uD800\uDF48=1"))
  }

  test("nulls pass through exactly as the Column chain did") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("http://a.com/p")))
      .toDF("doc_id", "url")
    val cols = Seq($"doc_id", $"canonical_url", $"host", $"domain",
      $"n_params")
    val native = UrlNorm.canonicalize(df).orderBy($"doc_id")
      .select(cols: _*).collect().toSeq
    val viaCols = UrlNorm.canonicalizeViaColumns(df).orderBy($"doc_id")
      .select(cols: _*).collect().toSeq
    assert(native === viaCols)
    assert(native(0).isNullAt(1) && native(0).isNullAt(2) &&
      native(0).isNullAt(3))
    assert(native(1).getString(1) === "http://a.com/p")
  }

  test("interpreted eval matches codegen path") {
    // nullSafeEval directly (the non-codegen fallback Spark may take)
    val r = org.apache.spark.sql.graft.UrlCanonExpr.canon(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "HTTP://Sub1.Example2.co.UK:80/articles/item-1?utm_source=feed&z=1&a=4#s"))
    assert(r.getUTF8String(0).toString ===
      "http://sub1.example2.co.uk/articles/item-1?a=4&z=1")
    assert(r.getUTF8String(1).toString === "sub1.example2.co.uk")
    assert(r.getUTF8String(2).toString === "example2.co.uk")
    assert(r.getLong(3) === 2L)
  }
}
