package graft.sources

import scala.collection.mutable

import graft.SparkTestBase
import graft.dns.{Pipeline, Streaming}
import org.scalatest.funsuite.AnyFunSuite

/** The connector seam, driven for real: the `graft-replay` DataSource
  * V2 micro-batch source feeds the DNS pipeline through the SAME
  * `Streaming.envelopeSource(format, options)` call a production
  * Kinesis connector would — offsets checkpoint, a restarted query
  * resumes mid-stream, and every emitted envelope flows through the
  * full decode → validate → format path. */
class ReplaySourceSpec extends AnyFunSuite with SparkTestBase {

  test("replay source streams valid envelopes through the pipeline in bounded batches") {
    val env = Streaming.envelopeSource(spark, "graft-replay",
      Map("rowsPerBatch" -> "40", "maxRows" -> "120", "shards" -> "3"))
    val perBatch = mutable.ArrayBuffer[(Long, Long)]() // (lines, quarantined)
    val q = env.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = Pipeline.process(df)
        val counted = (out.lines.count(), out.quarantine.count())
        out.release()
        perBatch.synchronized { perBatch += counted }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val (lines, quarantined) =
      (perBatch.map(_._1).sum, perBatch.map(_._2).sum)
    // every record is valid (one answer → 1 query + 1 reply line);
    // admission control caps each micro-batch at 40 envelopes
    assert(quarantined === 0, s"valid envelopes must not quarantine")
    assert(lines === 240L, s"120 envelopes x 2 lines, got $lines")
    assert(perBatch.size >= 3, s"expected >= 3 bounded batches: $perBatch")
    assert(perBatch.forall(_._1 <= 80L),
      s"each batch should carry <= 40 envelopes (80 lines): $perBatch")
  }

  test("replay source resumes from the checkpointed offset after restart") {
    val ckpt = java.nio.file.Files.createTempDirectory("replay-ckpt").toString
    val seen = mutable.Set[String]()
    def run(maxRows: Int): Unit = {
      val env = Streaming.envelopeSource(spark, "graft-replay",
        Map("rowsPerBatch" -> "25", "maxRows" -> maxRows.toString))
      val q = env.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = df.select("requestId").collect().map(_.getString(0))
          seen.synchronized { seen ++= ids }
          ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    run(50)
    assert(seen.size === 50, s"first run must consume 50: ${seen.size}")
    // restart against the same checkpoint with a longer stream: only
    // the NEW offsets replay — no duplicates, no gaps
    run(80)
    assert(seen.size === 80, s"resume must add exactly 30: ${seen.size}")
    assert((0 until 80).forall(i => seen.contains(s"req-$i")),
      "offsets must be contiguous across the restart")
  }
}
