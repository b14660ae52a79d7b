package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** End-to-end training-data pipeline over `documents` + `embeddings`
  * — the curation flow the LLM-data operators exist for, run as one
  * job with per-stage counts and timings:
  *
  *   1. curate: language allowlist ∧ quality gate ∧ near-dup keeper
  *      (exact pair graph → connected components → min-id keeper)
  *   2. decontaminate: drop docs sharing 8-grams with the held-out
  *      benchmark tenth; gate on repetition + corpus-LM NLL
  *   3. chunk: 20-token windows, stride 15, over surviving docs
  *   4. pack: next-fit 50-token training sequences in parallel groups
  *   5. embed side: per-label centroids + int8 codes + IVF index
  *      build + a probe batch served from pruned cells
  *
  * Usage: runMain graft.DataPipeline [sfDir]
  */
object DataPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Sessions.local(appName = "graft-data-pipeline")
    import spark.implicits._

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pipeline] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      r
    }

    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val total = docs.count()

    timed("canonical pre-dedup (prefix fingerprint)") {
      val flagged = TextNorm.canonicalDupGroups(docs,
        TextNorm.prefixFingerprint($"text", 20))
      val nonCanon = flagged.filter($"doc_id" =!= $"canon_id").count()
      println(s"[pipeline]   ${flagged.count()} docs in canonical groups, " +
        s"$nonCanon non-canonical variants droppable")
    }

    timed("corpus diagnostics (vocab head, drift, source overlap)") {
      val head = TextStats.vocabHead(docs, 5).collect()
      println(f"[pipeline]   top-5 terms cover ${head.last.getDouble(3) * 100}%.1f%% of tokens")
      val cut = (docs.agg(max($"doc_id")).head().getLong(0) + 1L) / 2L
      val drift = Profiling.tokenDrift(
        docs.filter($"doc_id" < cut), docs.filter($"doc_id" >= cut), 1)
        .head()
      println(s"[pipeline]   max drift token '${drift.getString(0)}' " +
        s"chi2 ${drift.getDouble(3)}")
      val hot = Contamination.sourceOverlap(docs)
        .orderBy($"shared".desc).limit(1).head()
      println(s"[pipeline]   hottest source pair ${hot.getString(0)}/" +
        s"${hot.getString(1)} shares ${hot.getLong(2)} 8-grams")
    }

    val curated = timed("curate (lang+quality+dedup)") {
      val c = Curation.curate(docs).cache()
      println(s"[pipeline]   docs $total -> ${c.count()} curated")
      c
    }

    val clean = timed("decontaminate + gate (8-gram, repetition, LM)") {
      val contaminated = Contamination.contaminated(docs)
        .select($"doc_id")
      val repetitive = TextStats.repetitionStats(docs)
        .filter($"top_bigram_frac" > 0.2 || $"distinct_ratio" < 0.3)
        .select($"doc_id")
      val offDistribution = LmScore.lmScore(docs)
        .filter($"nll" > 8.0).select($"doc_id")
      val c = curated
        .join(contaminated.union(repetitive).union(offDistribution)
          .distinct(), Seq("doc_id"), "left_anti")
        .cache()
      println(s"[pipeline]   ${curated.count()} curated -> ${c.count()} clean")
      c
    }

    timed("PII audit (email/phone/ip regex, per-row)") {
      val hits = Redact.scan(clean.join(docs.select($"doc_id", $"text"),
          "doc_id"))
        .agg(sum($"n_emails" + $"n_phones" + $"n_ipv4")).head().getLong(0)
      println(s"[pipeline]   $hits PII hits (clean corpus ⇒ 0)")
    }

    val selected = timed("importance weights + mixture + splits") {
      val w = LmScore.importanceWeights(
        docs.join(clean.select($"doc_id"), "doc_id"), col("lang") === "en")
      val targetLike = w.filter($"weight" > 0).count()
      val mixed = Curation.mixtureSample(
        docs.join(clean.select($"doc_id"), "doc_id"),
        "source", "doc_id", Map("src0" -> 50, "src1" -> 50))
      val split = Curation.assignSplits(mixed, "doc_id").cache()
      val byBucket = split.groupBy($"split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      println(s"[pipeline]   $targetLike target-like docs; splits $byBucket")
      split
    }

    timed("shuffle shards (deterministic training order)") {
      val sh = Curation.shuffleShards(
        selected.filter($"split" === "train"), "doc_id", 16)
      val n = sh.groupBy($"shard").count().count()
      println(s"[pipeline]   train docs across $n shards")
    }

    timed("tokenizer fit (30 BPE merges)") {
      val corpus = clean.select($"doc_id").join(docs, "doc_id")
      // demo the BOUNDED driver path (minCount cut before the collect):
      // the production contract is driver vocab ≤ totalTokens/minCount,
      // and the log shows how much the cut trimmed
      val vocabAll = Bpe.wordCounts(corpus).count()
      val vocabKept = Bpe.wordCounts(corpus).filter($"c" >= 2).count()
      val merges = Bpe.fit(corpus, nMerges = 30, minCount = 2L)
      val enc = Bpe.encode(docs.join(clean.select($"doc_id"), "doc_id"), merges)
      val r = enc.agg(sum($"n_pieces"), sum($"n_tokens")).head()
      println(s"[pipeline]   vocab $vocabAll rows, $vocabKept after minCount=2 cut; " +
        s"${merges.size} merges; ${r.getLong(0)} pieces over ${r.getLong(1)} words")
    }

    val chunks = timed("chunk (20/15 windows)") {
      val ch = TextStats.chunk(docs.join(clean.select($"doc_id"), "doc_id"))
        .cache()
      println(s"[pipeline]   ${ch.count()} chunks")
      ch
    }

    timed("pack (next-fit, 50-token)") {
      val packed = SequencePacking.pack(chunks)
      val bins = packed.select($"grp", $"bin").distinct().count()
      val fill = packed.agg(sum($"chunk_tokens")).head().getLong(0)
      println(f"[pipeline]   $bins bins, mean fill ${fill.toDouble / bins}%.1f tokens")
    }

    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    timed("semantic dedup (cell-restricted, SemDeDup)") {
      val kept = SemDedup.semDedup(emb, tau = 0.4).count()
      println(s"[pipeline]   ${emb.count()} vectors -> $kept after SemDeDup")
    }

    timed("label centroids") {
      println(s"[pipeline]   ${Curation.labelCentroids(emb).count()} (label, dim) rows")
    }

    timed("int8 quantization") {
      println(s"[pipeline]   ${Quantize.int8(emb).count()} vectors quantized")
    }

    timed("IVF index + probe batch") {
      val (indexed, model) = IvfIndex.buildPivots(emb)
      val hits = IvfIndex.topK(indexed, model,
        emb.filter($"vec_id".isin(0L, 1L, 2L)), k = 10)
      println(s"[pipeline]   ${hits.count()} ANN results for 3 probes")
    }

    timed("IVF-PQ stack (prune + ADC + rerank)") {
      val hits = IvfPq.topK(emb, Seq(0L, 1L, 2L), k = 10)
      println(s"[pipeline]   ${hits.count()} IVF-PQ results for 3 probes")
    }

    timed("k-NN graph (cell-restricted)") {
      val edges = IvfIndex.knnGraphInCells(emb, k = 5, nProbe = 4).count()
      println(s"[pipeline]   $edges directed 5-NN edges")
    }

    timed("cluster prototypes (balanced selection)") {
      val protos = KMeansTick.prototypes(emb)
      val perCl = protos.groupBy($"cluster").count().count()
      println(s"[pipeline]   ${protos.count()} prototypes across $perCl clusters")
    }

    spark.stop()
  }
}
