package graft.store

/** UNIFIED corpus-side right-to-be-forgotten (r13 VERDICT #1) — one
  * txn-fenced call that removes a document set from the corpus
  * history AND every standing derived tier, so no call site ever
  * hand-sequences `VersionedTable.deleteKeys` + per-index purges +
  * serving invalidation again (the q153/q170 compositions did, and a
  * crash between their steps left standing indexes serving deleted
  * docs with nothing that knew to resume).
  *
  * This is [[FeatureStore.forgetKeys]]'s contract ported to the
  * DOCUMENT corpus, where the derived tiers are the standing index
  * families (`IndexMaintenance`: BM25 postings, positional postings,
  * span n-gram postings, winnowing fingerprints, IVF assignments —
  * plus the media signature index keyed by its own id): each is a
  * per-row-keyed `VersionedTable` grown by the offset-fenced ingest
  * sink, so a forget is `deleteKeys` on each (file-stats pruned:
  * doc-clustered ingest keeps bands tight, work is O(touched files)),
  * optionally followed by a serving-layout republish and a
  * driver-cache flush (`Bm25SearchTier.invalidate` and friends).
  *
  * Tier ordering is the crash-safety argument, identical to
  * `FeatureStore.forgetKeys` (derived tiers FIRST, fenced history
  * commit LAST):
  *  - every tier step is VALUE-idempotent — deleting already-absent
  *    keys prunes to zero touched files and publishes nothing,
  *    republish overwrites with identical bytes, invalidate is a
  *    cache clear;
  *  - the corpus `deleteKeys` carries the `txnId` fence and runs
  *    last, so the txn commits ONLY once every derived tier has been
  *    purged;
  *  - a crash anywhere before that commit leaves the txn uncommitted:
  *    the replay re-runs every tier step (no-ops where the crash got
  *    that far) and then lands the fence — convergence, not
  *    double-delete;
  *  - once the fence is committed, a replay returns immediately.
  *
  * Like the feature-store side, keys are a DRIVER-side bounded list
  * (a legal takedown catalog), NULL-keyed rows are retained in every
  * tier (the deleteKeys predicate contract), and a key never
  * ingested anywhere is a no-op everywhere. The corpus commit
  * records the audit evidence (key counts and per-file/row removal
  * totals — never the keys themselves); per-tier evidence lands on
  * each tier table's own delete commit and is summarized in the
  * returned [[CorpusForget.ForgetReport]].
  */
object CorpusForget {

  /** One standing derived tier of the corpus.
    *
    * @param name       report key (e.g. "bm25", "positional", "ivf")
    * @param table      the tier's per-row-keyed standing index store
    * @param idCol      the tier's source-id column (`doc_id` for the
    *                   text index families; `vec_id`/`media_id` for
    *                   embedding/media tiers)
    * @param keysFor    maps forgotten DOC keys to this tier's keys —
    *                   identity for doc-keyed tiers; a doc→media/vec
    *                   expansion for tiers keyed by a derived id. An
    *                   empty result skips the tier (nothing of the
    *                   docs lives in it).
    * @param republish  pushes the purged index into its serving
    *                   layout (e.g. `SearchEndpoint.writeBm25Index`
    *                   from `table.read()`); value-idempotent by
    *                   contract
    * @param invalidate flushes driver-side serving caches
    *                   (`*SearchTier.invalidate`); idempotent
    */
  final case class DerivedTier(
      name: String,
      table: VersionedTable,
      idCol: String = "doc_id",
      keysFor: Seq[Any] => Seq[Any] = identity,
      republish: () => Unit = () => (),
      invalidate: () => Unit = () => ())

  /** What one [[forgetDocs]] call did. `replaySkipped` — the txn was
    * already committed, nothing ran. `tierAudits` — each tier that
    * PUBLISHED a delete commit, with that commit's audit evidence
    * (absent tiers were empty, unmapped, or held none of the keys).
    * `corpusAudit` — the fenced history commit's evidence (empty when
    * the keys touched no corpus file, in which case no commit
    * published).
    */
  final case class ForgetReport(
      replaySkipped: Boolean,
      tierAudits: Map[String, Map[String, String]],
      corpusVersion: Long,
      corpusAudit: Map[String, String])

  /** Forget `keys` from the corpus store and every derived tier, in
    * the crash-safe order documented on the object. Returns the
    * audit report. Idempotent under `txnId` replay.
    */
  def forgetDocs(corpus: VersionedTable, keyCol: String, keys: Seq[Any],
      tiers: Seq[DerivedTier] = Seq.empty,
      txnId: Option[String] = None): ForgetReport = {
    require(keys.nonEmpty, "forgetDocs with an empty key list")
    require(keys.forall(_ != null), "forgetDocs with a NULL key")
    if (txnId.exists(corpus.txnCommitted))
      return ForgetReport(replaySkipped = true, Map.empty,
        corpus.currentVersion.get, Map.empty)
    // ---- derived tiers first: purge → republish → invalidate -------
    val tierAudits = tiers.flatMap { t =>
      val tierKeys = t.keysFor(keys)
      require(tierKeys.forall(_ != null),
        s"forgetDocs: tier '${t.name}' keysFor produced a NULL key")
      if (tierKeys.isEmpty || t.table.currentVersion.isEmpty) None
      else {
        val before = t.table.currentVersion
        val v = t.table.deleteKeys(t.idCol, tierKeys)
        t.republish()
        t.invalidate()
        // only a tier that actually published carries evidence — a
        // stats-pruned miss returns the prior version with no commit
        if (before.contains(v)) None
        else Some(t.name -> t.table.auditOf(v))
      }
    }.toMap
    // ---- fenced history commit last --------------------------------
    val vBefore = corpus.currentVersion.getOrElse(
      throw new IllegalStateException(
        "forgetDocs: corpus store has no committed version"))
    val v = corpus.deleteKeys(keyCol, keys, txnId)
    val corpusAudit = if (v == vBefore) Map.empty[String, String]
      else corpus.auditOf(v)
    ForgetReport(replaySkipped = false, tierAudits, v, corpusAudit)
  }
}
