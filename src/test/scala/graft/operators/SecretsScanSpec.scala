package graft.operators

import graft.SparkSpec

/** Secrets/credential scanning (q157): checksum- and entropy-
  * verified detectors, exclusive classes, planted-corpus wiring.
  */
class SecretsScanSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference Luhn — the public checksum, written
    * independently of the Column fold it checks.
    */
  private def luhnOk(s: String): Boolean = {
    val sum = s.reverseIterator.zipWithIndex.map { case (ch, i) =>
      val d = ch - '0'
      if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
    }.sum
    sum % 10 == 0
  }

  private def scanOne(text: String): (Long, Long, Long) = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = Redact.secretsScan(df)
      .select("n_cards", "n_keys", "n_entropy").head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("card detector: Luhn-valid 13-19 digit tokens count; the " +
      "same digits with a broken check digit do not; non-card digit " +
      "runs and short numbers never count") {
    // build a valid card programmatically: 15 fixed digits + check
    val body = "123456789012345"
    val check = (0 to 9).map(_.toString).find(c => luhnOk(body + c)).get
    val bad = ((check.toInt - '0' + 1) % 10).toString
    assert(scanOne(s"pay ${body + check} now") === ((1L, 0L, 0L)))
    assert(scanOne(s"pay ${body + bad} now") === ((0L, 0L, 0L)))
    assert(scanOne("order 123456789012 total") === ((0L, 0L, 0L))) // 12 digits
    assert(scanOne("a 12345678901234567890 b") === ((0L, 0L, 0L))) // 20 digits
  }

  test("key detector: prefixed credential shape; prefix case and " +
      "body length are enforced") {
    assert(scanOne("token gk_" + "A1b2C3d4E5f6G7h8I9j0K1L2") ===
      ((0L, 1L, 0L)))
    // uppercase prefix is not the key shape — but the token is still
    // a high-entropy blob, so the scan degrades to the entropy class
    // rather than missing the credential entirely
    assert(scanOne("token GK_" + "A1b2C3d4E5f6G7h8I9j0K1L2") ===
      ((0L, 0L, 1L)))
    assert(scanOne("token gk_short") === ((0L, 0L, 0L)))
  }

  test("entropy detector: a high-entropy blob in the length window " +
      "counts; a zero-entropy run, an out-of-window token, and " +
      "off-charset text do not; a key-shaped token is NOT double-" +
      "counted as entropy") {
    assert(scanOne("x aB3dE6gH9jK2mN5pQ8sT1vW x") === ((0L, 0L, 1L)))
    assert(scanOne("x " + "z" * 24 + " x") === ((0L, 0L, 0L)))
    assert(scanOne("x aB3dE6gH9jK2mN5pQ8 x") === ((0L, 0L, 0L))) // 19 chars
    assert(scanOne("x " + "a1" * 30 + " x") === ((0L, 0L, 0L))) // 60 > max len
    assert(scanOne("x aB3dE6gH9jK2mN5pQ8sT1v! x") === ((0L, 0L, 0L)))
    // precedence: key wins over entropy, counted exactly once
    assert(scanOne("gk_aB3dE6gH9jK2mN5pQ8sT1vW4x") === ((0L, 1L, 0L)))
  }

  test("entropy arithmetic matches a driver-side Shannon reference " +
      "at the exact tick granularity") {
    def microBits(t: String): Long = {
      val n = t.length
      t.groupBy(identity).values.map { g =>
        val c = g.length
        c.toLong * (Redact.log2Ticks(n - 1) - Redact.log2Ticks(c - 1))
      }.sum
    }
    for (t <- Seq("aB3dE6gH9jK2mN5pQ8sT1vW", "z" * 24,
        "aabbccddeeffgghhiijjkkll", "Abc123Abc123Abc123Abc123")) {
      val want = microBits(t) >= Redact.entropyFloorMicroBits * t.length
      val got = Seq(Tuple1(t)).toDF("t")
        .select(Redact.isEntropyBlob($"t").as("e")).head().getBoolean(0)
      assert(got === want, t)
    }
  }

  test("redactSecrets masks each class with its placeholder, leaves " +
      "other tokens alone, and a rescan of the redacted text is " +
      "all-zero") {
    val body = "123456789012345"
    val check = (0 to 9).map(_.toString).find(c => luhnOk(body + c)).get
    val text = s"pay ${body + check} via gk_A1b2C3d4E5f6G7h8I9j0K1L2 " +
      "code aB3dE6gH9jK2mN5pQ8sT1vW ok"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val red = df.select(Redact.redactSecrets($"text").as("text")).head().getString(0)
    assert(red === "pay [CARD] via [KEY] code [SECRET] ok")
    val rescan = Redact.secretsScan(
      Seq((1L, red)).toDF("doc_id", "text"))
      .select("n_cards", "n_keys", "n_entropy").head()
    assert((rescan.getLong(0), rescan.getLong(1), rescan.getLong(2)) ===
      ((0L, 0L, 0L)))
  }

  test("typed classifier == Column classifier: classifyToken agrees " +
      "with secretsScan per document over the full planted corpus, " +
      "and on every crafted boundary token") {
    // unit boundary tokens, including the negative controls
    val body = "123456789012345"
    val check = (0 to 9).map(_.toString).find(c => luhnOk(body + c)).get
    val bad = ((check.toInt - '0' + 1) % 10).toString
    val tokens = Seq(
      body + check, body + bad, "123456789012", "1234567890123456789",
      "gk_" + "Ab9" * 8, "GK_" + "Ab9" * 8, "g_" + "Ab9" * 8,
      "abcdefghij0123456789klmn", "z" * 24, "z" * 19,
      "plain", "", "with-dash-" * 3)
    for (t <- tokens) {
      val col = Seq(Tuple1(Seq(t))).toDF("toks")
        .select(Redact.classifyTokens($"toks").getItem(0)).head().getInt(0)
      assert(Redact.classifyToken(t) === col, s"token '$t'")
    }
    // corpus-wide differential: typed counts == Column counts on the
    // planted fixture (the two implementations cannot drift unseen)
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select($"doc_id", Redact.plantedText($"doc_id", $"text").as("text"))
    val colCounts = Redact.secretsScan(docs)
      .select($"doc_id", $"n_cards", $"n_keys", $"n_entropy")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val typed = docs.as[(Long, String)].collect().sortBy(_._1).toSeq
      .map { case (id, text) =>
        val (c, k, e) = Redact.secretsCounts(text)
        (id, c, k, e)
      }
    assert(typed === colCounts)
  }

  test("q157 planted corpus: every planted class is found on its " +
      "doc-id lattice, the Luhn-invalid and zero-entropy plants " +
      "never count, and clean docs emit no row") {
    val out = Redact.q157SecretsScan(spark, sf)
      .select($"doc_id", $"n_cards", $"n_keys", $"n_entropy")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, c, k, e) => id -> ((c, k, e)) }.toMap
    val ids = graft.core.Tables.load(spark, sf, "documents")
      .select($"doc_id").as[Long].collect()
    assert(ids.nonEmpty)
    for (id <- ids) {
      val want = (
        if (id % 7 == 0) 1L else 0L,
        if (id % 17 == 0) 1L else 0L,
        if (id % 11 == 0) 1L else 0L)
      val got = out.getOrElse(id, (0L, 0L, 0L))
      assert(got === want, s"doc $id")
    }
    // the negative-control lattices overlap the output only through
    // their positive co-plants: a 7≡3 (invalid card) or %13 (z-run)
    // doc with no positive plant must be ABSENT
    for (id <- ids if id % 7 == 3 || id % 13 == 0)
      if (id % 7 != 0 && id % 11 != 0 && id % 17 != 0)
        assert(!out.contains(id), s"negative-control doc $id leaked")
  }
}
