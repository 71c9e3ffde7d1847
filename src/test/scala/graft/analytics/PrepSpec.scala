package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the training-data prep operators — the
  * properties a pipeline author relies on, beyond the cell-exact
  * oracle gate (which pins the values). */
class PrepSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("split: deterministic, total, and roughly 80/10/10") {
    val a = PrepQueries.qPrepSplit.run(spark, sf).collect()
    val b = PrepQueries.qPrepSplit.run(spark, sf).collect()
    assert(a.toSeq === b.toSeq, "split must be stable across runs")
    val n = a.length.toDouble
    val frac = a.groupBy(_.getString(1)).view.mapValues(_.length / n).toMap
    assert(frac.keySet === Set("train", "val", "test"))
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train=$frac")
    assert(frac("test") < 0.2 && frac("val") < 0.2, s"fracs=$frac")
  }

  test("chunk: overlap-stripped concatenation reconstructs every document") {
    // chunk k covers words [1+40k, 50+40k]; dropping each later chunk's
    // first 10 (overlap) words and concatenating must rebuild the text.
    val rebuilt = PrepQueries.qPrepChunk.run(spark, sf)
      .withColumn("tail_words",
        when(col("chunk_idx") === 0, split(col("chunk_text"), " "))
          .otherwise(slice(split(col("chunk_text"), " "), 11, 50)))
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ", flatten(array_sort(collect_list(
        struct(col("chunk_idx"), col("tail_words"))))
        .getField("tail_words"))).as("rebuilt"))
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    val mismatches = rebuilt.join(docs, "doc_id")
      .filter(col("rebuilt") =!= col("text")).count()
    assert(mismatches === 0)
  }

  test("redact: blocklisted terms gone, audit count matches the removals") {
    val r = PrepQueries.qPrepRedact.run(spark, sf)
    assert(r.filter(col("clean_text").rlike("\\b(customer|value)\\b"))
      .count() === 0, "no blocklisted term may survive")
    // n_redacted must equal the number of <TERM> tokens inserted
    val bad = r.filter(
      size(split(col("clean_text"), "<TERM>", -1)) - 1 =!= col("n_redacted"))
      .count()
    assert(bad === 0, "audit count must match insertions")
  }

  test("decontam: flags the planted benchmark duplicate, never the benchmark itself") {
    val d = PrepQueries.qPrepDecontam.run(spark, sf).collect()
    assert(d.nonEmpty, "the corpus contains a planted near-dup of a benchmark doc")
    assert(d.forall(_.getLong(0) >= 10), "benchmark docs must not flag themselves")
    assert(d.forall(_.getLong(1) >= 20))
  }
}
