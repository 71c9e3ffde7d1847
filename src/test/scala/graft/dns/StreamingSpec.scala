package graft.dns

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.net.{DatagramPacket, DatagramSocket}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64
import scala.collection.mutable

/** Streaming-layer specs: micro-batch semantics over MemoryStream, the
  * real file source end-to-end (UDP datagrams received on loopback +
  * parquet dead-letter), and the watermarked windowed aggregation. */
class StreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  private def record(qname: String, ts: String = "2023-10-15T14:03:07Z") =
    s"""{"version":"1","account_id":"a","region":"r","vpc_id":"vpc-s",
       |"query_timestamp":"$ts","query_name":"$qname","query_type":"A",
       |"query_class":"IN","rcode":"NOERROR",
       |"answers":[{"Rdata":"1.2.3.4","Type":"A"}],"srcaddr":"10.0.0.1",
       |"srcport":"1234","transport":"UDP",
       |"srcids":{"instance":"i-1"}}""".stripMargin.replaceAll("\n", "")

  private def envelope(id: String, datas: String*): String =
    s"""{"requestId":"$id","records":[${
      datas.map(d => s"""{"data":"$d"}""").mkString(",")}]}"""

  test("memory stream: per-micro-batch pipeline with poison isolation") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[String]
    val collected = mutable.Map[Long, (Long, Long)]() // batch -> (lines, quarantined)
    val query = stream.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val out = Pipeline.process(Pipeline.parseEnvelopes(df.as[String]))
        collected.synchronized {
          collected(id) = (out.lines.count(), out.quarantine.count())
        }
        ()
      }
      .start()
    stream.addData(envelope("b0", b64(record("one.example."))))
    query.processAllAvailable()
    stream.addData(envelope("b1", b64(record("two.example.")), b64("{broken")))
    query.processAllAvailable()
    query.stop()
    assert(collected(0L) === ((2L, 0L))) // query + 1 reply
    assert(collected(1L) === ((2L, 1L))) // poison quarantined, batch flows
  }

  test("file source end-to-end: UDP datagrams on loopback + dead letters") {
    val inDir = Files.createTempDirectory("stream_in").toString
    val dlDir = Files.createTempDirectory("stream_dl").toString
    val ckDir = Files.createTempDirectory("stream_ck").toString
    // loopback syslog collector
    val socket = new DatagramSocket(0, java.net.InetAddress.getByName("127.0.0.1"))
    socket.setSoTimeout(15000)
    val received = mutable.ArrayBuffer[String]()
    val collector = new Thread(() => {
      val buf = new Array[Byte](65535)
      try while (true) {
        val p = new DatagramPacket(buf, buf.length)
        socket.receive(p)
        received.synchronized {
          received += new String(p.getData, 0, p.getLength,
            StandardCharsets.UTF_8)
        }
      } catch { case _: Exception => () }
    })
    collector.setDaemon(true)
    collector.start()

    Files.writeString(java.nio.file.Path.of(inDir, "batch0.json"),
      envelope("f0", b64(record("stream.example.")), b64("!!!bad???")) +
        "\n" + envelope("f1", b64(record("other.example."))))
    val q = Streaming.start(
      Streaming.envelopesFromJsonFiles(spark, inDir),
      "127.0.0.1", socket.getLocalPort, dlDir, ckDir,
      Trigger.AvailableNow())
    q.awaitTermination(60000)
    // two valid records × (1 query + 1 reply) = 4 datagrams
    val deadline = System.currentTimeMillis() + 10000
    while (received.synchronized(received.size) < 4 &&
      System.currentTimeMillis() < deadline) Thread.sleep(100)
    socket.close()
    val lines = received.synchronized(received.toList)
    assert(lines.size === 4, s"got: $lines")
    assert(lines.forall(_.startsWith("<30>Oct 15 14:03:07 vpc-s route53resolver:")))
    // SysLogHandler parity: append_nul=True terminates each datagram
    assert(lines.forall(_.endsWith("\u0000")), "datagrams must be NUL-terminated")
    assert(lines.count(_.contains("query: stream.example.")) === 1)
    assert(lines.count(_.contains("reply: other.example. is 1.2.3.4")) === 1)
    val quarantined = spark.read.parquet(s"$dlDir/quarantine")
    assert(quarantined.count() === 1)
    assert(quarantined.select("reason").as[String].head() === "json")
    // batch_id is a discovered partition column of the idempotent sink
    assert(quarantined.columns.contains("batch_id"))
  }

  test("replayed micro-batch overwrites its dead-letter partition (idempotent sink)") {
    val inDir = Files.createTempDirectory("replay_in").toString
    val dlDir = Files.createTempDirectory("replay_dl").toString
    val ckDir = Files.createTempDirectory("replay_ck").toString
    Files.writeString(java.nio.file.Path.of(inDir, "b0.json"),
      envelope("rp0", b64(record("rp.example.")), b64("{broken")))
    val sink = new DatagramSocket(0,
      java.net.InetAddress.getByName("127.0.0.1"))
    def runOnce(): Unit = {
      val q = Streaming.start(Streaming.envelopesFromJsonFiles(spark, inDir),
        "127.0.0.1", sink.getLocalPort, dlDir, ckDir, Trigger.AvailableNow())
      q.awaitTermination(60000)
      q.stop()
    }
    runOnce()
    assert(spark.read.parquet(s"$dlDir/quarantine").count() === 1)
    // simulate a crash between side-output write and commit: removing
    // the commit marker makes the restarted query REPLAY batch 0
    // (the local-fs .crc sidecar must go too or the recommit's rename
    // trips over it)
    val committed = java.nio.file.Path.of(ckDir, "commits", "0")
    assert(Files.deleteIfExists(committed), "commit marker must exist")
    Files.deleteIfExists(java.nio.file.Path.of(ckDir, "commits", ".0.crc"))
    runOnce()
    sink.close()
    // the replay overwrote batch_id=0 instead of appending a duplicate
    val rows = spark.read.parquet(s"$dlDir/quarantine")
    assert(rows.count() === 1,
      "replayed batch must overwrite its partition, not append")
    assert(rows.select("reason").as[String].head() === "json")
  }

  test("envelope source seam selects connectors by config") {
    // "files": the environment default — a streaming envelope frame
    val dir = Files.createTempDirectory("seam_in").toString
    val files = Streaming.envelopeSource(spark, "files", Map("path" -> dir))
    assert(files.isStreaming)
    assert(files.columns.contains("requestId") &&
      files.columns.contains("records"))
    // connector path: ANY registered streaming DataSource name wires
    // through the same envelope parse ("rate" stands in; its payload
    // column is `value`)
    val rate = Streaming.envelopeSource(spark, "rate",
      Map("rowsPerSecond" -> "1"), payloadColumn = "value")
    assert(rate.isStreaming && rate.columns.contains("requestId"))
    // "kinesis" goes through the same registry lookup; without the
    // connector jar deployed, the lookup is the ONLY failure — i.e.
    // production enables Kinesis by dropping in the jar + this config
    val err = intercept[Exception] {
      Streaming.envelopeSource(spark, "kinesis",
        Map("streamName" -> "dns-log-stream"))
    }
    assert(err.getMessage.toLowerCase.contains("kinesis"), err.getMessage)
  }

  test("checkpointed restart: processed files are never re-emitted") {
    val inDir = Files.createTempDirectory("restart_in").toString
    val dlDir = Files.createTempDirectory("restart_dl").toString
    val ckDir = Files.createTempDirectory("restart_ck").toString
    val socket =
      new DatagramSocket(0, java.net.InetAddress.getByName("127.0.0.1"))
    socket.setSoTimeout(15000)
    val received = mutable.ArrayBuffer[String]()
    val collector = new Thread(() => {
      val buf = new Array[Byte](65535)
      try while (true) {
        val p = new DatagramPacket(buf, buf.length)
        socket.receive(p)
        received.synchronized {
          received += new String(p.getData, 0, p.getLength,
            StandardCharsets.UTF_8)
        }
      } catch { case _: Exception => () }
    })
    collector.setDaemon(true)
    collector.start()

    def runOnce(): Unit = {
      val q = Streaming.start(
        Streaming.envelopesFromJsonFiles(spark, inDir),
        "127.0.0.1", socket.getLocalPort, dlDir, ckDir,
        Trigger.AvailableNow())
      q.awaitTermination(60000)
    }
    Files.writeString(java.nio.file.Path.of(inDir, "a.json"),
      envelope("c0", b64(record("first.example."))))
    runOnce()
    Files.writeString(java.nio.file.Path.of(inDir, "b.json"),
      envelope("c1", b64(record("second.example."))))
    runOnce() // same checkpoint: must process ONLY the new file
    val deadline = System.currentTimeMillis() + 10000
    while (received.synchronized(received.size) < 4 &&
      System.currentTimeMillis() < deadline) Thread.sleep(100)
    socket.close()
    val lines = received.synchronized(received.toList)
    assert(lines.size === 4, s"got: $lines") // 2 records × (query+reply)
    assert(lines.count(_.contains("query: first.example.")) === 1,
      "restart must not re-emit the already-processed file")
    assert(lines.count(_.contains("query: second.example.")) === 1)
  }

  test("stream-static threat-list enrichment joins per micro-batch") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[String]
    val clean = Pipeline.decodedRecords(
      Pipeline.parseEnvelopes(stream.toDS())).filter(col("reason").isNull)
    val threats = Seq(("evil.example.", "high"), ("shady.example.", "low"))
      .toDF("query_name", "severity")
    val enriched = Streaming.enrichWithThreatList(clean, threats)
    val hits = mutable.ArrayBuffer[(String, String)]()
    val q = enriched.writeStream.foreachBatch {
      (df: org.apache.spark.sql.DataFrame, _: Long) =>
        hits.synchronized {
          hits ++= df.select("query_name", "severity").collect()
            .map(r => (r.getString(0), r.getString(1)))
        }
        ()
    }.start()
    stream.addData(envelope("t0",
      b64(record("benign.example.")), b64(record("evil.example.")),
      b64(record("shady.example."))))
    q.processAllAvailable()
    q.stop()
    assert(hits.synchronized(hits.toSet) ===
      Set(("evil.example.", "high"), ("shady.example.", "low")))
  }

  test("streaming dedup absorbs at-least-once replays within the watermark") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[String]
    val clean = Pipeline.decodedRecords(
      Pipeline.parseEnvelopes(stream.toDS())).filter(col("reason").isNull)
    val q = Streaming.dedupRecords(clean)
      .select(col("requestId"), col("record_idx"))
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    val env = envelope("dup0",
      b64(record("a.example.")), b64(record("b.example.")))
    stream.addData(env)
    q.processAllAvailable()
    stream.addData(env) // replayed delivery — same (requestId, record_idx)
    q.processAllAvailable()
    val rows = spark.table("deduped").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    q.stop()
    assert(rows.sorted === Seq(("dup0", 0), ("dup0", 1)),
      s"replay must be absorbed, got: $rows")
  }

  test("dedup state is bounded by the watermark horizon, not stream length") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[String]
    val clean = Pipeline.decodedRecords(
      Pipeline.parseEnvelopes(stream.toDS())).filter(col("reason").isNull)
    val q = Streaming.dedupRecords(clean)
      .select(col("requestId"), col("record_idx"))
      .writeStream.format("noop").start()
    stream.addData(envelope("s0",
      b64(record("a.example.", "2023-10-15T14:00:00Z")),
      b64(record("b.example.", "2023-10-15T14:00:01Z"))))
    q.processAllAvailable()
    val before = q.lastProgress.stateOperators.head.numRowsTotal
    assert(before === 2, "both keys buffered inside the horizon")
    // Jump event time far past the 10-minute horizon. The watermark
    // derived from this batch evicts the 14:00 keys on the NEXT batch
    // (watermarks advance between batches), hence two more batches.
    stream.addData(envelope("s1",
      b64(record("c.example.", "2023-10-15T16:00:00Z"))))
    q.processAllAvailable()
    stream.addData(envelope("s2",
      b64(record("d.example.", "2023-10-15T16:00:01Z"))))
    q.processAllAvailable()
    val after = q.lastProgress.stateOperators.head.numRowsTotal
    val removed =
      q.recentProgress.flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    q.stop()
    assert(after <= 2,
      s"state must hold only keys inside the horizon, got $after rows")
    assert(removed >= 2,
      s"watermark passage must evict the expired keys, removed=$removed")
  }

  test("retry-join state is bounded by the watermark horizon") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[String]
    val clean = Pipeline.decodedRecords(
      Pipeline.parseEnvelopes(stream.toDS())).filter(col("reason").isNull)
    val q = Streaming.retries(clean, withinSeconds = 10)
      .writeStream.format("noop").start()
    stream.addData(envelope("j0",
      b64(record("x.example.", "2023-10-15T14:00:00Z")),
      b64(record("y.example.", "2023-10-15T14:00:01Z"))))
    q.processAllAvailable()
    val before = q.lastProgress.stateOperators.head.numRowsTotal
    assert(before > 0, "the interval join must buffer in-horizon rows")
    stream.addData(envelope("j1",
      b64(record("z.example.", "2023-10-15T16:00:00Z"))))
    q.processAllAvailable()
    stream.addData(envelope("j2",
      b64(record("w.example.", "2023-10-15T16:00:30Z"))))
    q.processAllAvailable()
    val after = q.lastProgress.stateOperators.head.numRowsTotal
    val removed =
      q.recentProgress.flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    q.stop()
    assert(after < before + 2,
      s"join state must not grow with stream length (before=$before, after=$after)")
    assert(removed > 0,
      s"watermark passage must evict expired join rows, removed=$removed")
  }

  test("observe() metrics report per-reason quarantine counts") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[String]
    val records = Streaming.observed(
      Pipeline.decodedRecords(Pipeline.parseEnvelopes(stream.toDS())))
    val q = records.writeStream.format("noop").start()
    stream.addData(envelope("m0",
      b64(record("ok.example.")), "!!!notb64!!!", b64("{broken")))
    q.processAllAvailable()
    val metrics = q.lastProgress.observedMetrics.get("graft_pipeline")
    q.stop()
    assert(metrics.getAs[Long]("n_records") === 3L)
    assert(metrics.getAs[Long]("n_quarantined") === 2L)
    assert(metrics.getAs[Long]("n_base64") === 1L)
    assert(metrics.getAs[Long]("n_json") === 1L)
  }

  test("stream-stream interval self-join flags retries within the bound") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[String]
    val clean = Pipeline.decodedRecords(
      Pipeline.parseEnvelopes(stream.toDS())).filter(col("reason").isNull)
    val joined = Streaming.retries(clean, withinSeconds = 10)
    val q = joined.writeStream.format("memory").queryName("retries")
      .outputMode("append").start()
    stream.addData(envelope("r0",
      b64(record("dup.example.", "2023-10-15T14:00:00Z")),
      b64(record("dup.example.", "2023-10-15T14:00:05Z")), // retry (+5s)
      b64(record("dup.example.", "2023-10-15T14:00:30Z")), // outside 10s
      b64(record("other.example.", "2023-10-15T14:00:06Z"))))
    q.processAllAvailable()
    // advance watermark so the joined rows finalize in append mode
    stream.addData(envelope("r1",
      b64(record("late.example.", "2023-10-15T15:00:00Z"))))
    q.processAllAvailable()
    val rows = spark.table("retries")
      .select("query_name", "first_ts", "retry_ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString))
    q.stop()
    assert(rows.toSet === Set(
      ("dup.example.", "2023-10-15 14:00:00.0", "2023-10-15 14:00:05.0")))
  }

  test("watermarked per-vpc rate windows aggregate event time") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[String]
    val records = Pipeline.decodedRecords(
      Pipeline.parseEnvelopes(stream.toDS()))
      .filter(col("reason").isNull)
    val agg = Streaming.ratePerVpc(records, "1 minute", "5 minutes")
    val query = agg.writeStream.format("memory")
      .queryName("rates").outputMode("complete").start()
    stream.addData(envelope("w0",
      b64(record("a.example.", "2023-10-15T14:03:07Z")),
      b64(record("b.example.", "2023-10-15T14:03:30Z")),
      b64(record("c.example.", "2023-10-15T14:04:02Z"))))
    query.processAllAvailable()
    val rows = spark.table("rates")
      .select("window_start", "n_queries")
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    query.stop()
    assert(rows === Map(
      "2023-10-15 14:03:00.0" -> 2L,
      "2023-10-15 14:04:00.0" -> 1L))
  }
}
