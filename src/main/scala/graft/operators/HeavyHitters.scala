package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** SpaceSaving heavy-hitters sketch as a typed `Aggregator` — the
  * custom-UDAF surface (SURVEY.md §2.6) for "top talkers" style
  * questions the reference's SIEM consumers ask of DNS logs.
  *
  * Bounded memory: at most `capacity` counters per partition buffer
  * regardless of input cardinality; merge is counter-wise with the
  * SpaceSaving overestimate bound (count error ≤ min counter evicted).
  * For exact top-k the engine's groupBy path exists; this is the
  * single-pass sketch for when the key space doesn't fit.
  */
class SpaceSaving(capacity: Int)
  extends Aggregator[String, mutable.Map[String, Long], Seq[(String, Long)]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[String, Long],
      key: String): mutable.Map[String, Long] = {
    if (buf.contains(key)) buf(key) += 1L
    else if (buf.size < capacity) buf(key) = 1L
    else {
      // evict the minimum counter, inherit its count (overestimate)
      val (minK, minV) = buf.minBy(kv => (kv._2, kv._1))
      buf.remove(minK)
      buf(key) = minV + 1L
    }
    buf
  }

  /** Canonical SpaceSaving merge (Agarwal et al., "Mergeable
    * Summaries"): a key missing from one side may have been absorbed
    * into that side's minimum counter, so its count there is bounded
    * by — and charged as — that side's min. Summing with the min
    * offset keeps every estimate an OVERestimate; truncation to
    * capacity then only evicts counters ≤ the surviving minimum, so
    * the "missing key ≤ current min" invariant also survives. */
  override def merge(a: mutable.Map[String, Long],
      b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    val minA = if (a.size < capacity) 0L else a.values.min
    val minB = if (b.size < capacity) 0L else b.values.min
    val merged = mutable.Map.empty[String, Long]
    (a.keySet ++ b.keySet).foreach { k =>
      merged(k) = a.getOrElse(k, minA) + b.getOrElse(k, minB)
    }
    if (merged.size <= capacity) merged
    else mutable.Map(merged.toSeq
      .sortBy { case (k, v) => (-v, k) }.take(capacity): _*)
  }

  override def finish(buf: mutable.Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (k, v) => (-v, k) }

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object HeavyHitters {
  /** Typed column usable in `ds.select(...)` / `agg(...)`. */
  def spaceSaving(capacity: Int): TypedColumn[String, Seq[(String, Long)]] =
    new SpaceSaving(capacity).toColumn

  /** Convenience: top heavy hitters of a string Dataset. */
  def topK(ds: Dataset[String], capacity: Int, k: Int): Seq[(String, Long)] =
    ds.select(spaceSaving(capacity)).head().take(k)
}
