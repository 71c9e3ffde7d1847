package graft.analytics

import org.apache.spark.sql.DataFrame

/** Streaming exact first-occurrence deduplication — the streaming twin
  * of [[DedupQueries.qDedupExact]]'s key-level contract, built on
  * Spark's `dropDuplicatesWithinWatermark`: the first row per key
  * passes through the micro-batch it arrives in; any duplicate
  * arriving while the key is inside the watermark horizon is dropped;
  * key state older than the watermark is garbage-collected.
  *
  * The horizon IS the contract, stated honestly: a duplicate arriving
  * AFTER its key's state aged out re-emits (bounded state cannot
  * remember an unbounded past — the same trade every production
  * streaming dedup makes; an exact-forever dedup is the batch
  * operator's job, or the persisted [[SignatureStore]] screen's).
  * StreamingDedupSpec pins all three behaviors: replay parity with
  * batch DISTINCT, cross-micro-batch dropping within the horizon, and
  * the post-horizon re-emission that documents the state bound.
  *
  * At scale this is one keyed state store exchange on the dedup key:
  * O(1) state per distinct key inside the horizon, nothing per
  * duplicate, and the watermark GC keeps total state proportional to
  * the key arrival rate × horizon — never the stream's history. */
object StreamingDedup {

  /** First occurrence per `keyCols` over a streaming frame with an
    * event-time column `ts`; duplicates within `horizon` of the
    * watermark are dropped, older key state is GC'd. */
  def dedup(events: DataFrame, horizon: String = "2 hours",
      keyCols: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
}
