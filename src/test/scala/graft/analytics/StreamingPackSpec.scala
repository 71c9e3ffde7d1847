package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Streaming sequence packing: the per-lane stateful cursor must make
  * incremental micro-batch emission equal to packing the concatenated
  * stream in one shot, and the cursor must survive a checkpoint
  * restart. */
class StreamingPackSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import StreamingPack.{BlockSlice, DocTokens}

  /** Sequential reference packer: one cursor per lane, docs in the
    * exact order given, separator after each doc — the semantics the
    * distributed operator claims. */
  private def reference(docs: Seq[DocTokens], b: Long): Seq[BlockSlice] = {
    val cursor = mutable.Map[Int, Long]().withDefaultValue(0L)
    docs.flatMap { d =>
      val g = cursor(d.lane)
      cursor(d.lane) = g + d.n_tok + 1
      (g / b to (g + d.n_tok - 1) / b).map { blk =>
        BlockSlice(d.lane, blk, d.doc_id,
          math.max(g, blk * b) - g,
          math.min(g + d.n_tok, (blk + 1) * b) - g)
      }
    }
  }

  test("streaming pack: micro-batch emission ≡ sequential packing; cursor persists") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Int, Long, Long)]
    val out = mutable.ArrayBuffer[BlockSlice]()
    val q = StreamingPack.pack(
        in.toDS().map { case (l, id, n) => DocTokens(l, id, n) },
        blockSize = 100L)
      .writeStream.outputMode("append").foreachBatch {
        (df: org.apache.spark.sql.Dataset[BlockSlice], _: Long) =>
          out.synchronized { out ++= df.collect() }
          ()
      }.start()
    // three micro-batches, two lanes; sizes chosen so docs straddle
    // block boundaries (70+1, 40+1 → doc 12 spans blocks 0 and 1) and
    // a single doc covers multiple whole blocks (250 spans 3 blocks)
    val b1 = Seq((0, 11L, 70L), (0, 12L, 40L), (1, 21L, 95L))
    val b2 = Seq((0, 13L, 250L), (1, 22L, 10L))
    val b3 = Seq((1, 23L, 130L), (0, 14L, 5L))
    Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    // reference order: per micro-batch, a lane's docs sort by doc_id
    val ordered = Seq(b1, b2, b3).flatMap(
      _.map { case (l, id, n) => DocTokens(l, id, n) }
        .sortBy(d => (d.lane, d.doc_id)))
    val want = reference(ordered, 100L)
    val key = (s: BlockSlice) => (s.lane, s.block_id, s.doc_id)
    assert(out.synchronized(out.sortBy(key)) === want.sortBy(key))
    // the cursor genuinely carried across batches: lane 0's last doc
    // (batch 3) lands after 70+1+40+1+250+1 = 363 tokens → block 3
    assert(out.synchronized(out.exists(s =>
      s.lane == 0 && s.doc_id == 14L && s.block_id == 3L)))
  }

  test("streaming pack: cursor survives a checkpoint restart") {
    // a file source (not MemoryStream) so the restarted query resumes
    // the SAME source from the checkpoint — the StreamingSpec restart
    // pattern
    val inDir = java.nio.file.Files.createTempDirectory("pack_in")
    val ckpt = java.nio.file.Files
      .createTempDirectory("packckpt").toString
    val out = mutable.ArrayBuffer[BlockSlice]()
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("lane INT, doc_id BIGINT, n_tok BIGINT")
        .json(inDir.toString).as[DocTokens]
      val q = StreamingPack.pack(src, blockSize = 100L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[BlockSlice], _: Long) =>
            out.synchronized { out ++= df.collect() }
            ()
        }.start()
      q.processAllAvailable()
      q.stop()
    }
    java.nio.file.Files.writeString(inDir.resolve("a.json"),
      """{"lane":0,"doc_id":1,"n_tok":150}""")
    runOnce() // cursor → 151
    java.nio.file.Files.writeString(inDir.resolve("b.json"),
      """{"lane":0,"doc_id":2,"n_tok":10}""")
    runOnce() // restart: must resume at 151, not repack doc 1
    val slices = out.synchronized(out.toList)
    assert(slices.count(_.doc_id == 1L) === 2,
      s"doc 1 must pack exactly once (blocks 0+1): $slices")
    assert(slices.filter(_.doc_id == 2L)
        .map(s => (s.block_id, s.tok_start, s.tok_end)) ===
      Seq((1L, 0L, 10L)),
      s"cursor did not survive the restart: $slices")
  }
}
