package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming OHLC bars — the incremental twin of
  * [[RelationalQueries.qTsOhlc]], and deliberately the THINNEST twin
  * in the streaming set: no custom state operator at all. The batch
  * query's single-aggregate shape (min_by/max_by on the
  * (ts, event_id) struct + min/max/count) is exactly what Spark's
  * windowed streaming aggregation maintains incrementally — the
  * endpoint structs are declarative aggregates, so their partials
  * live in the window state like any min/max, merge across
  * micro-batches, and absorb late-but-within-watermark events into
  * the correct bar. Append mode emits each bar exactly once, when
  * the watermark passes the window end.
  *
  * Semantics vs the batch query, pinned by StreamingOhlcSpec:
  * replaying any event sequence — one micro-batch, split, or with
  * in-watermark late arrivals — emits exactly the batch bars for
  * every closed window. At scale this is one keyed state store
  * partitioned by (event_type, window): O(1) state per open bar,
  * nothing per event. */
object StreamingOhlc {

  /** Hourly OHLC bars over a (possibly streaming) events frame with
    * columns (event_id, ts, event_type, value). `watermarkDelay`
    * bounds how late an event may arrive and still amend its bar. */
  def bars(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("event_type"), window(col("ts"), "1 hour").as("w"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id")))
          .as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id")))
          .as("close"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("w.start").as("h"), col("open"),
        col("high"), col("low"), col("close"), col("n_events"))
}
