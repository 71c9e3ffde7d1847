package graft.analytics

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC materialization — the incremental twin of
  * [[CdcQueries.qCdcApply]]: the batch query replays a CLOSED
  * changeset onto a snapshot in one pass; a change feed that never
  * closes (the Debezium/Firehose delivery shape the reference's
  * ingestion protocol implies, app/app.py:60-102) needs the same
  * "current state of every key" maintained continuously. Each key
  * keeps one `(last_seq, value, deleted)` triple in
  * `flatMapGroupsWithState` — upserts and deletes apply in sequence
  * order, and each micro-batch emits AT MOST ONE row per changed key
  * (intermediate versions inside a batch collapse — changelog
  * compaction, exactly what an upsert sink wants to receive).
  *
  * Ordering discipline: events carry a per-key monotone `seq` (the
  * log offset every CDC transport provides); an event with
  * `seq ≤ last_seq` is a replay or late straggler and is dropped, so
  * task retries and at-least-once sources cannot regress state.
  * Within a micro-batch the iterator sorts by seq (iterator order is
  * not deterministic across Spark task retries; the sort pins
  * replay-identical application).
  *
  * Scale shape: state is O(1) per live key and the shuffle is the
  * single key-hash exchange Structured Streaming already does for
  * stateful operators; emission is the compacted changelog, so
  * downstream writes are bounded by distinct-keys-per-batch, not by
  * event volume. Deletes keep a tombstone (`deleted = true`) rather
  * than clearing state, so a late pre-delete update cannot resurrect
  * the row; a production feed ages tombstones out with a watermark
  * timeout once the transport's reorder horizon passes.
  *
  * Semantics vs batch, pinned by StreamingCdcSpec: after any
  * partitioning of the feed into micro-batches, the latest emission
  * per key (tombstones filtered) equals the batch "last writer wins"
  * over the same events — and the state survives checkpoint restart. */
object StreamingCdc {

  /** One change event: key, per-key monotone sequence, op U(psert) or
    * D(elete), and the new value for upserts. */
  case class ChangeEvent(k: Long, seq: Long, op: String, value: Double)

  /** One emitted current-state row (compacted changelog entry). */
  case class CurrentRow(k: Long, seq: Long, value: Double, deleted: Boolean)

  /** Materialize a change feed into per-key current state. Works on a
    * static Dataset too (one "batch"), which is how the spec
    * cross-checks it against the batch reference. */
  def materialize(events: Dataset[ChangeEvent]): Dataset[CurrentRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.k)
      .flatMapGroupsWithState[(Long, Double, Boolean), CurrentRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[ChangeEvent],
         state: GroupState[(Long, Double, Boolean)]) =>
          var (seq, v, del) = state.getOption.getOrElse((Long.MinValue, 0.0, true))
          var changed = false
          it.toSeq.sortBy(_.seq).foreach { e =>
            if (e.seq > seq) {
              seq = e.seq
              del = e.op == "D"
              if (!del) v = e.value
              changed = true
            }
          }
          if (changed) {
            state.update((seq, v, del))
            Iterator.single(CurrentRow(k, seq, v, del))
          } else Iterator.empty
      }
  }
}
