package graft.dns

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}


/** Per-client response-code monitoring over the DNS stream — the SIEM
  * question downstream consumers of these logs actually ask: a client
  * suddenly resolving many NXDOMAINs is the classic DGA-malware /
  * exfiltration beacon signal.
  *
  * Built on the arbitrary-state API's OTHER primitive, complementing
  * [[Sessions.SessionProcessor]] (ValueState + event-time timers):
  * a `MapState[rcode, count]` per client — one map entry per (active
  * client, distinct rcode; the rcode alphabet is ~10 values).
  *
  * State TTL: the API bounds idle-client state with a per-state TTL
  * (`TTLConfig(duration)` instead of `TTLConfig.NONE` in `init` —
  * a one-line swap). TTL forces `TimeMode.ProcessingTime`, and a
  * ProcessingTime-mode operator reports "another batch needed" on
  * every trigger (TTL eviction bookkeeping), so the query re-batches
  * continuously under the default trigger and `Trigger.AvailableNow`
  * NEVER terminates — fine under a production rate-limited trigger
  * (`Trigger.ProcessingTime(interval)`), hostile to drain-and-stop
  * harnesses. The operator therefore ships in `TimeMode.None` and a
  * deployment that wants TTL opts in with the interval trigger it
  * would run anyway.
  *
  * Emission contract (deterministic, testable): an alert row is
  * emitted for a client each micro-batch in which its NXDOMAIN
  * counter is at or above `threshold` after that batch's updates —
  * a monitoring signal, not a deduplicated incident stream (the
  * incident roll-up is a downstream concern).
  */
object Monitor {

  final case class RcodeAlert(
      srcaddr: String, nxdomain: Long, total: Long)

  final class RcodeProcessor(threshold: Long)
      extends StatefulProcessor[String, (String, String), RcodeAlert] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("rcode_counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, String)],
        timers: TimerValues): Iterator[RcodeAlert] = {
      rows.foreach { case (_, rcode) =>
        val cur = if (counts.containsKey(rcode)) counts.getValue(rcode) else 0L
        counts.updateValue(rcode, cur + 1L)
      }
      val nx =
        if (counts.containsKey("NXDOMAIN")) counts.getValue("NXDOMAIN") else 0L
      if (nx >= threshold) {
        var total = 0L
        counts.values().foreach(total += _)
        Iterator.single(RcodeAlert(key, nx, total))
      } else Iterator.empty
    }
  }

  /** NXDOMAIN burst alerts over clean decoded records
    * (`Pipeline.decodedRecords` filtered to `reason IS NULL`).
    * Requires the RocksDB state store provider, like every
    * transformWithState operator. */
  def nxdomainAlerts(cleanRecords: DataFrame,
      threshold: Long): Dataset[RcodeAlert] = {
    val spark = cleanRecords.sparkSession
    import spark.implicits._
    Decode.projectDnsFields(cleanRecords)
      .select(col("srcaddr"), col("rcode"))
      .as[(String, String)]
      .groupByKey(_._1)
      .transformWithState(new RcodeProcessor(threshold),
        TimeMode.None(), OutputMode.Append())
  }
}
