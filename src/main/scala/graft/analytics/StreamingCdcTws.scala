package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** [[StreamingCdc]] on Spark 4's arbitrary-state API
  * (`transformWithState`) — same sequence-ordered last-writer-wins
  * semantics, plus the piece the old API couldn't express cleanly:
  * TOMBSTONE AGING. The processor splits per-key state into TWO
  * variables — `live` (kept until superseded) and `tomb` (garbage-
  * collected by an explicit EVENT-TIME timer at its write time +
  * `horizon`) — which is exactly the API's point: one processor
  * composes state variables with independent lifetimes plus timers.
  * When the watermark passes a tombstone's deadline the timer fires
  * and the tombstone clears SILENTLY: its seq guard disappears and
  * the key's slate is clean — the standard tombstone-GC contract
  * (Cassandra's gc_grace): pick the horizon longer than the
  * transport's reorder window and expiry is safe; a straggler older
  * than the horizon CAN then resurrect, the documented, bounded
  * trade every tombstone collector makes (the alternative —
  * tombstones forever — is the fMGWS variant's behavior and an
  * unbounded state leak under key churn). Event-time is the RIGHT
  * clock for this: the reorder horizon is a property of the event
  * stream, not of wall-clock processing (a replayed backfill must
  * age tombstones by stream time, not by how fast it replays).
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — the only backend the
  * arbitrary-state operator supports. (Processing-time TTLConfig is
  * deliberately NOT used: the aging contract is event-time, and the
  * per-state TTL clock is wall-clock only.)
  *
  * StreamingCdcTwsSpec pins: agreement with [[StreamingCdc]] on
  * replay logs inside the horizon, silent watermark-driven tombstone
  * GC, and post-expiry resurrection of a sub-tombstone-seq change. */
object StreamingCdcTws {
  import StreamingCdc.CurrentRow

  /** One change event with its stream timestamp (every CDC transport
    * stamps changes; the watermark and the GC horizon ride on it). */
  case class TimedChangeEvent(k: Long, seq: Long, op: String,
      value: Double, ts: Timestamp)

  /** Live slot: the applied seq and value. */
  case class Slot(seq: Long, value: Double)

  /** Tombstone slot: seq guard, last pre-delete value (audit parity
    * with the fMGWS emission), and the GC deadline its timer holds. */
  case class TombSlot(seq: Long, value: Double, deadline: Long)

  final class CdcProcessor(horizonMs: Long)
      extends StatefulProcessor[Long, TimedChangeEvent, CurrentRow] {
    @transient private var live: ValueState[Slot] = _
    @transient private var tomb: ValueState[TombSlot] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      live = getHandle.getValueState[Slot]("live",
        Encoders.product[Slot], TTLConfig.NONE)
      tomb = getHandle.getValueState[TombSlot]("tomb",
        Encoders.product[TombSlot], TTLConfig.NONE)
    }

    override def handleInputRows(k: Long, rows: Iterator[TimedChangeEvent],
        timers: TimerValues): Iterator[CurrentRow] = {
      var l = if (live.exists()) Option(live.get()) else None
      var t = if (tomb.exists()) Option(tomb.get()) else None
      val prevDeadline = t.map(_.deadline)
      var changed = false
      rows.toSeq.sortBy(_.seq).foreach { e =>
        val cur = math.max(l.map(_.seq).getOrElse(Long.MinValue),
          t.map(_.seq).getOrElse(Long.MinValue))
        if (e.seq > cur) {
          if (e.op == "D") {
            t = Some(TombSlot(e.seq,
              l.map(_.value).orElse(t.map(_.value)).getOrElse(0.0),
              e.ts.getTime + horizonMs))
            l = None
          } else {
            l = Some(Slot(e.seq, e.value))
            t = None
          }
          changed = true
        }
      }
      if (!changed) Iterator.empty
      else {
        l match {
          case Some(s) =>
            live.update(s)
            tomb.clear()
            prevDeadline.foreach(getHandle.deleteTimer)
          case None =>
            live.clear()
            t.foreach { ts =>
              tomb.update(ts)
              if (!prevDeadline.contains(ts.deadline)) {
                prevDeadline.foreach(getHandle.deleteTimer)
                getHandle.registerTimer(ts.deadline)
              }
            }
        }
        val out = l.map(s => CurrentRow(k, s.seq, s.value, deleted = false))
          .getOrElse {
            val s = t.get; CurrentRow(k, s.seq, s.value, deleted = true)
          }
        Iterator.single(out)
      }
    }

    override def handleExpiredTimer(k: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[CurrentRow] = {
      if (tomb.exists()) {
        val t = tomb.get()
        // a stale timer from before a deadline move: the live
        // deadline's own timer is still registered — ignore
        if (expired.getExpiryTimeInMs() >= t.deadline) tomb.clear()
      }
      Iterator.empty // GC is silent: expiry is not a data change
    }
  }

  /** Materialize a timestamped change feed with event-time tombstone
    * aging: tombstones clear when the watermark passes their write
    * time + `horizon`. `watermarkDelay` bounds event lateness exactly
    * as in every other watermarked operator here. */
  def materialize(events: Dataset[TimedChangeEvent],
      horizon: java.time.Duration,
      watermarkDelay: String = "10 seconds"): Dataset[CurrentRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay)
      .as[TimedChangeEvent]
      .groupByKey(_.k)
      .transformWithState(new CdcProcessor(horizon.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
