package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{HtmlExtract, Retrieval, SpanDedup}

/** Differential-fuzz runner for the span/retrieval operator family
  * (q102–q107 shapes + BM25) — the operators whose oracles are
  * GENERATED from shared Scala builders rather than drawn from the
  * SQL grammar `tools/fuzz_differential.py` fuzzes. For each case the
  * runner executes the OPERATOR (the real DataFrame plan, pins and
  * all) over a seeded synthetic corpus and emits the parameterized
  * oracle SQL; `tools/fuzz_span_retrieval.py` then runs the SQL in
  * DuckDB over the same corpus and compares.
  *
  * Input: a plain one-case-per-line params file (no JSON parser in
  * the library):
  *
  *   corpus,<seed>,<nDocs>,<alphabet>,<minLen>,<maxLen>,<copyPct>
  *   <name>,excise,<n>,<minCount>
  *   <name>,decont,<n>
  *   <name>,derep,<n>
  *   <name>,novelty,<n>
  *   <name>,bm25,<k>,<k1>,<b>,<mod>,<nTerms>
  *   <name>,html,<minChars>,<minDensityPct>
  *   <name>,links
  *
  * The corpus is a small-alphabet token soup with planted cross-doc
  * span copies (`copyPct`% of docs copy a 3–14-token slice from an
  * earlier doc), so duplicated-span and BM25 paths see real structure
  * at every n. Written to `<outDir>/corpus/` for the DuckDB side.
  */
object FuzzOps {

  def synthCorpus(spark: SparkSession, seed: Long, nDocs: Int,
      alphabet: Int, minLen: Int, maxLen: Int, copyPct: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val texts = new Array[String](nDocs)
    var i = 0
    while (i < nDocs) {
      val len = minLen + rnd.nextInt(maxLen - minLen + 1)
      val toks = Array.fill(len)(s"w${rnd.nextInt(alphabet)}")
      if (i > 0 && rnd.nextInt(100) < copyPct) {
        val src = texts(rnd.nextInt(i)).split(" ", -1)
        if (src.length >= 4 && toks.length >= 4) {
          val sLen = math.min(math.min(src.length, toks.length),
            3 + rnd.nextInt(12))
          val sOff = rnd.nextInt(src.length - sLen + 1)
          val dOff = rnd.nextInt(toks.length - sLen + 1)
          var j = 0
          while (j < sLen) { toks(dOff + j) = src(sOff + j); j += 1 }
        }
      }
      texts(i) = toks.mkString(" ")
      i += 1
    }
    texts.zipWithIndex.map { case (t, id) => (id.toLong, t) }
      .toSeq.toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit = {
    val Array(paramsPath, outDir) = args
    val spark = graft.core.Sessions.local(appName = "graft-fuzz-ops")
    import spark.implicits._
    Files.createDirectories(Paths.get(outDir)): Unit
    val lines = scala.io.Source.fromFile(paramsPath).getLines()
      .map(_.trim).filter(_.nonEmpty).toSeq
    val corpusSpec = lines.head.split(",")
    require(corpusSpec(0) == "corpus", "first line must be the corpus spec")
    val Array(_, seed, nDocs, alphabet, minLen, maxLen, copyPct) = corpusSpec
    val docs = synthCorpus(spark, seed.toLong, nDocs.toInt, alphabet.toInt,
      minLen.toInt, maxLen.toInt, copyPct.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.coalesce(1).write.mode("overwrite").parquet(s"$outDir/corpus")

    val oracle = scala.collection.mutable.LinkedHashMap.empty[String, String]
    lines.tail.foreach { line =>
      val f = line.split(",")
      val name = f(0)
      val (df, sql) = f(1) match {
        case "excise" =>
          (SpanDedup.excise(docs, f(2).toInt, f(3).toLong).orderBy($"doc_id"),
            SpanDedup.exciseOracleSqlN(f(2).toInt, f(3).toLong))
        case "decont" =>
          val n = f(2).toInt
          val benchIdx =
            SpanDedup.dupNgramIndex(docs.filter($"doc_id" % 10 === 0), n)
          (SpanDedup.exciseAgainst(benchIdx,
              docs.filter($"doc_id" % 10 =!= 0), n, Long.MaxValue)
            .orderBy($"doc_id"),
            SpanDedup.decontaminateOracleSqlN(n))
        case "derep" =>
          (SpanDedup.exciseRepeats(docs, f(2).toInt).orderBy($"doc_id"),
            SpanDedup.derepOracleSqlN(f(2).toInt))
        case "novelty" =>
          (SpanDedup.noveltyProfile(docs, f(2).toInt).orderBy($"doc_id"),
            SpanDedup.noveltyOracleSqlN(f(2).toInt))
        case "bm25" =>
          val Array(_, _, k, k1, b, mod, nTerms) = f
          (Retrieval.bm25TopK(docs,
              Retrieval.prefixQueries(docs, mod.toLong, nTerms.toInt),
              k.toInt, k1.toDouble, b.toDouble)
            .orderBy($"query_id", $"rank"),
            Retrieval.bm25OracleSqlN(k.toInt, mod.toLong, nTerms.toInt,
              k1.toDouble, b.toDouble))
        case "html" =>
          val pages = docs.select($"doc_id",
            HtmlExtract.syntheticHtml($"doc_id", $"text").as("html"))
          (HtmlExtract.extract(pages, minChars = f(2).toInt,
              minDensityPct = f(3).toInt)
            .select($"doc_id", $"content", $"n_blocks_total",
              $"n_blocks_kept", $"content_chars")
            .orderBy($"doc_id"),
            HtmlExtract.oracleSql(f(2).toInt, f(3).toInt))
        case "links" =>
          val pages = docs.select($"doc_id",
            HtmlExtract.syntheticLinkedHtml($"doc_id", $"text").as("html"))
          (HtmlExtract.extractLinks(pages).orderBy($"doc_id", $"link_pos"),
            HtmlExtract.linksOracleSql)
        case other => sys.error(s"unknown op: $other")
      }
      try df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[fuzz-ops] $name failed: ${e.getMessage}")
      }
      oracle(name) = sql
      // same hygiene as Verify: the corpus pin must survive, per-case
      // pins must not accumulate
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): Unit
    }
    def q(s: String): String = graft.core.Json.str(s)
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      oracle.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
