package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.BinaryType

/** Manual runtime-bloom semi-join reduction — the engine's big-join
  * lever for the case Catalyst's automatic injection does NOT cover:
  * the build side is too large for the injection threshold
  * (`runtime.bloomFilter.creationSideThreshold`, 10 MB default) but a
  * FIXED-size filter over it still pays for itself because the probe
  * side is explosively larger (a wedge relation probing its edge
  * relation: 41M wedges against 1.2M edges on the sf0.1 co-purchase
  * graph). The filter is built with Spark's own
  * `BloomFilterAggregate` (one distributed pass over the build keys),
  * collected to the driver as ONE binary blob of the CHOSEN size
  * (numBits/8 bytes — bounded by construction, independent of data
  * volume), and embedded as a foldable literal in a
  * `BloomFilterMightContain` predicate on the probe — exactly the
  * expression pair Catalyst's injected filters use, so the probe
  * evaluates inside codegen with zero per-row JVM boxing.
  *
  * No false negatives by construction: pruning a probe side that
  * feeds an INNER equi-join on the same keys never changes the join
  * result (OperatorsSpec pins result equality and the fp-bounded
  * pass-through rate). Size `numBits ≈ 8–10× expectedItems` for a
  * ~2% false-positive rate; both must stay within Spark's
  * `runtime.bloomFilter.maxNumItems` / `maxNumBits` session caps. */
object BloomPrune {

  /** Filter `probe` to rows whose `probeKeys` hash might appear among
    * `build`'s `buildKeys` (xxhash64 on both sides — the same hash
    * family Spark's injected runtime filters use). */
  def pruneByBloom(probe: DataFrame, build: DataFrame,
      expectedItems: Long, numBits: Long,
      buildKeys: Seq[Column], probeKeys: Seq[Column]): DataFrame = {
    require(expectedItems > 0 && numBits > 0,
      s"bloom sizing must be positive: items=$expectedItems bits=$numBits")
    val agg = new BloomFilterAggregate(
      ExprBridge.expression(xxhash64(buildKeys: _*)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bytes = build.agg(ExprBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
    val pred = new BloomFilterMightContain(
      Literal(bytes, BinaryType),
      ExprBridge.expression(xxhash64(probeKeys: _*)))
    probe.filter(ExprBridge.column(pred))
  }
}
