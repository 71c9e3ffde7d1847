package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (most-recent-match) join — an operator Spark lacks natively.
  *
  * Composed from existing ops per the preference order (no custom
  * strategy needed): union the two sides, single shuffle on the key,
  * sort within each key by (ts, side) and carry the latest right-side
  * payload forward with `last(..., ignoreNulls)` over a running frame.
  * Left rows then hold the most recent right row with
  * `right.ts <= left.ts` (right sorts before left on equal ts).
  *
  * Scale: exactly ONE shuffle (by key) regardless of input sizes — no
  * per-row range probe, no broadcast requirement, no join explosion;
  * skewed keys are bounded by per-key row counts, same as any window.
  * This is the plan a 1000-executor cluster wants for 100 TB streams.
  */
object AsOfJoin {

  /** Inner as-of join.
    *
    * @param left      probe side; all its columns survive
    * @param right     reference side
    * @param key       equi-key column name (same name both sides)
    * @param leftTs    left event-time column
    * @param rightTs   right event-time column
    * @param payload   right columns to carry (emitted as-is; names must
    *                  not collide with left's)
    */
  def asof(left: DataFrame, right: DataFrame, key: String, leftTs: String,
      rightTs: String, payload: Seq[String]): DataFrame =
    asof(left, right, key, leftTs, rightTs, payload, None)

  /** As-of join with a staleness TOLERANCE (round-9): a left row whose
    * most-recent match is older than `toleranceMicros` drops (inner
    * semantics) — the "don't join against a quote from last week"
    * contract every financial as-of carries. The most-recent match
    * within tolerance IS the most-recent match overall whenever one
    * qualifies, so the tolerance is a pure post-filter on the carried
    * right timestamp: the plan keeps the operator's single exchange,
    * no extra shuffle, no range probe. `None` = unbounded (the
    * 6-arg overload). */
  def asof(left: DataFrame, right: DataFrame, key: String, leftTs: String,
      rightTs: String, payload: Seq[String],
      toleranceMicros: Option[Long]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Payload rides in ONE struct that is non-null exactly for right
    // rows: `last(ignoreNulls)` then keys match-carrying on row
    // PRESENCE, not on any payload value. A right row whose payload
    // columns are all NULL still matches (and supersedes older right
    // rows), exactly like DuckDB's ASOF JOIN.
    // the right timestamp rides inside the payload struct so the
    // tolerance check can compare against the CARRIED match's age
    val payStruct = struct(payload.map(col) :+
      col(rightTs).as("__rts"): _*)
    val payType = StructType(payload.map(p =>
      StructField(p, right.schema(p).dataType)) :+
      StructField("__rts", right.schema(rightTs).dataType))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col("__ts"), col("__side")) ++
        leftCols.filterNot(_ == key).map(col) :+
        lit(null).cast(payType).as("__rpay"): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col("__ts"), col("__side")) ++
        leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payStruct.as("__rpay"): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(col("__rpay"), ignoreNulls = true).over(w).as("__rpay")
    val fresh = toleranceMicros
      .map(t => unix_micros(col(leftTs)) -
        unix_micros(col("__rpay").getField("__rts")) <= lit(t))
      .getOrElse(lit(true))
    l.unionByName(r)
      .select(Seq(col(key), col("__side")) ++
        leftCols.filterNot(_ == key).map(col) :+ carried: _*)
      .where(col("__side") === 1 && col("__rpay").isNotNull && fresh)
      .select(Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        payload.map(p => col("__rpay").getField(p).as(p)): _*)
  }
}
