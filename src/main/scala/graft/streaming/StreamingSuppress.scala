package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING K-SUPPRESSION — the hold-until-k gate (r15, the release
  * leg beside [[StreamingCensus]]'s audit leg): an event stream that
  * feeds a shared extract must not forward a row while its
  * quasi-identifier group is still small enough to re-identify, but
  * a batch re-suppression per release defeats streaming. The gate
  * BUFFERS each group's rows while the group is under `k`; the
  * moment the group reaches `k` it flushes the buffer and passes
  * every later row straight through — so a row is emitted exactly
  * when its group has (ever) reached k, and the released set after
  * any prefix of the stream equals `Privacy.kSuppress` over that
  * prefix (batch ≡ stream, spec'd across micro-batch splits).
  * Releases are FINAL (Append mode): k-anonymity only grows as
  * groups grow, so nothing emitted ever needs retraction.
  *
  * State: per group, a count plus AT MOST k−1 buffered payloads —
  * once a group crosses k the buffer empties forever, so total state
  * is O(groups × k), the gate's inherent price (you cannot release
  * the first row of a group before its k-th arrives without breaking
  * the guarantee). Keys ride as encoded strings with the engine's
  * NULL sentinel, so NULL quasi combinations buffer and release as
  * their own group, exactly like the batch release's null-safe join.
  */
object StreamingSuppress {

  /** One observation: the encoded quasi combination and an opaque
    * payload (the row id or body the gate forwards).
    */
  final case class Obs(quasi: String, payload: String)

  /** Per-group state: rows seen, and the under-k buffer. */
  final case class GroupBuf(n: Long, buffered: Seq[String])

  /** One released row. */
  final case class Released(quasi: String, payload: String)

  /** Encode (possibly streaming) `df` into observations — the
    * [[StreamingCensus.observations]] key convention.
    */
  def observations(df: DataFrame, quasiCols: Seq[String],
      payload: Column): Dataset[Obs] = {
    require(quasiCols.nonEmpty, "suppression needs quasi-identifiers")
    import df.sparkSession.implicits._
    df.select(
      concat_ws("\u0001", quasiCols.map(c =>
        coalesce(col(c).cast("string"), lit("\u0002"))): _*)
        .as("quasi"),
      payload.cast("string").as("payload"))
      .as[Obs]
  }

  private def updateGroup(k: Long)(
      quasi: String, obs: Iterator[Obs],
      state: GroupState[GroupBuf]): Iterator[Released] = {
    val prior = state.getOption.getOrElse(GroupBuf(0L, Nil))
    val incoming = obs.map(_.payload).toSeq
    val n = prior.n + incoming.size
    if (n >= k) {
      // crossed (or already past) k: flush anything buffered, pass
      // the batch through, and never buffer again
      state.update(GroupBuf(n, Nil))
      (prior.buffered ++ incoming).iterator
        .map(Released(quasi, _))
    } else {
      state.update(GroupBuf(n, prior.buffered ++ incoming))
      Iterator.empty
    }
  }

  /** Wire the gate onto a (possibly streaming) Dataset[Obs]: Append
    * output, one row per released payload, emitted in the micro-batch
    * where its group's count first reaches `k` (or on arrival for
    * already-safe groups).
    */
  def apply(obs: Dataset[Obs], k: Long): Dataset[Released] = {
    import obs.sparkSession.implicits._
    require(k >= 1, "k must be >= 1")
    obs.groupByKey(_.quasi)
      .flatMapGroupsWithState[GroupBuf, Released](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        updateGroup(k))
  }
}
