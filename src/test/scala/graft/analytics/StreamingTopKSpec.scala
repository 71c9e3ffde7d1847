package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming SpaceSaving top-k: with capacity above the distinct-key
  * count the final emission must EQUAL the exact batch top-k — one
  * micro-batch or split; with a tight capacity the classic sketch
  * bounds must hold against exact counts. */
class StreamingTopKSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import StreamingTopK.{KeyObs, TopKRow}

  private val sf = "/root/testdata/sf0.001"
  private val K = 10

  private lazy val obs: Seq[KeyObs] =
    Tables(spark, sf, "events")
      .select(col("event_type"), col("user_id").cast("string"))
      .collect().map(r => KeyObs(r.getString(0), r.getString(1)))

  /** Exact per-group counts from the same observations. */
  private lazy val exact: Map[(String, String), Long] =
    obs.groupBy(o => (o.group, o.key)).map { case (gk, os) =>
      gk -> os.size.toLong
    }

  private lazy val exactTopK: Map[String, Seq[(String, Long)]] =
    exact.groupBy(_._1._1).map { case (g, m) =>
      g -> m.toSeq.map { case ((_, k), n) => (k, n) }
        .sortBy { case (k, n) => (-n, k) }.take(K)
    }

  /** Runs the stream; returns the LAST emission per group. */
  private def runStream(batches: Seq[Seq[KeyObs]], capacity: Int)
      : Map[String, Seq[(String, Long)]] = {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[KeyObs]
    val last = mutable.Map[String, Seq[(String, Long)]]()
    val q = StreamingTopK.topK(in.toDS(), capacity, K)
      .writeStream.outputMode("update").foreachBatch {
        (df: org.apache.spark.sql.Dataset[TopKRow], _: Long) =>
          val rows = df.collect()
          last.synchronized {
            rows.groupBy(_.group).foreach { case (g, rs) =>
              last(g) = rs.sortBy(_.rank).map(r => (r.key, r.est)).toSeq
            }
          }
          ()
      }.start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    last.synchronized(last.toMap)
  }

  test("ample capacity: one-shot replay equals the exact batch top-k") {
    assert(exactTopK.nonEmpty)
    assert(runStream(Seq(obs), 4096) === exactTopK)
  }

  test("ample capacity: split replay equals exact — state carries") {
    val (b1, b2) = obs.splitAt(obs.length / 2)
    assert(runStream(Seq(b1, b2), 4096) === exactTopK)
  }

  test("tight capacity: overestimate + guaranteed-presence bounds hold") {
    val cap = 16
    val got = runStream(Seq(obs), cap)
    got.foreach { case (g, entries) =>
      entries.foreach { case (k, est) =>
        val truth = exact.getOrElse((g, k), 0L)
        assert(est >= truth,
          s"SpaceSaving must overestimate: $g/$k est=$est true=$truth")
      }
      // every key with true count > N_g / cap must be present
      val ng = exact.collect { case ((`g`, _), n) => n }.sum
      val mustHave = exact.collect {
        case ((`g`, k), n) if n > ng / cap => k
      }.toSet
      val present = entries.map(_._1).toSet
      val missing = mustHave -- present
      assert(missing.isEmpty,
        s"guaranteed hitters missing from $g top-$K: $missing")
    }
  }
}
