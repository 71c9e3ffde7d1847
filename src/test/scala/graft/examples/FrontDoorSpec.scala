package graft.examples

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.net.{DatagramPacket, DatagramSocket, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64
import scala.collection.mutable

/** End-to-end front-door example: envelope POST body → ack contract →
  * file spool → streaming pipeline → UDP BIND9 lines (the reference's
  * full transport surface, app/app.py:60-105 + 17-32). */
class FrontDoorSpec extends AnyFunSuite with SparkTestBase {

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  private val record =
    """{"version":"1","account_id":"a","region":"r","vpc_id":"vpc-fd",
      |"query_timestamp":"2023-10-15T14:03:07Z","query_name":"door.example.",
      |"query_type":"A","query_class":"IN","rcode":"NOERROR",
      |"answers":[{"Rdata":"1.2.3.4","Type":"A"}],"srcaddr":"10.0.0.9",
      |"srcport":"4242","transport":"UDP",
      |"srcids":{"instance":"i-fd"}}""".stripMargin.replaceAll("\n", "")

  private def post(port: Int, body: String,
      contentType: String = "application/json"): HttpResponse[String] =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/endpoint"))
        .header("Content-Type", contentType)
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST -> ack -> spool -> pipeline -> UDP lines, end to end") {
    val spool = Files.createTempDirectory("frontdoor_spool")
    val server = FrontDoor.start(0, spool)
    try {
      // health mirrors app/app.py:265-267
      val health = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${server.port}/health")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(health.statusCode() === 200 &&
        health.body().contains("healthy"))

      // thread-per-request like the reference's threaded Flask server:
      // concurrent posts all succeed and all spool (and none corrupt
      // each other's spool files — atomic rename per delivery)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val futures = (1 to 8).map { i =>
          pool.submit(new java.util.concurrent.Callable[Int] {
            override def call(): Int = post(server.port,
              s"""{"requestId":"conc-$i","records":[{"data":"${b64(record)}"}]}""")
              .statusCode()
          })
        }
        assert(futures.map(_.get()).forall(_ == 200),
          "all concurrent posts must be accepted")
      } finally pool.shutdown()
      assert(Files.list(spool).count() === 8, "every delivery must spool")
      Files.list(spool).forEach(p => Files.delete(p))

      // wrong Content-Type: 400 with the reference's exact error
      // message BEFORE any schema validation (app/app.py:69-74; the
      // reference's != comparison also rejects a charset suffix)
      for (ct <- Seq("text/plain", "application/json; charset=utf-8")) {
        val wrongCt = post(server.port,
          s"""{"requestId":"req-ct","records":[{"data":"${b64(record)}"}]}""",
          contentType = ct)
        assert(wrongCt.statusCode() === 400, s"content type $ct")
        assert(wrongCt.body().contains("\"requestId\": \"unknown\""))
        assert(wrongCt.body().contains(
          "Invalid content type. Expected application/json."))
      }
      assert(!Files.list(spool).iterator().hasNext,
        "content-type reject must not spool")

      // invalid envelope: 400 + Firehose failure doc, nothing spooled
      val bad = post(server.port,
        s"""{"requestId":7,"records":[{"data":"${b64(record)}"}]}""")
      assert(bad.statusCode() === 400)
      assert(bad.body().contains("\"requestId\": \"unknown\""))
      assert(bad.body().contains("Invalid data format: requestId_type"))
      assert(!Files.list(spool).iterator().hasNext, "reject must not spool")

      // valid envelope: 200 + {requestId, timestamp}, body spooled
      val ok = post(server.port,
        s"""{"requestId":"req-door","records":[{"data":"${b64(record)}"}]}""")
      assert(ok.statusCode() === 200)
      assert(ok.body().contains("\"requestId\": \"req-door\""))

      // loopback syslog collector
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
            received +=
              new String(p.getData, 0, p.getLength, StandardCharsets.UTF_8)
          }
        } catch { case _: Exception => () }
      })
      collector.setDaemon(true)
      collector.start()

      val q = graft.dns.Streaming.start(
        graft.dns.Streaming.envelopeSource(spark, "files",
          Map("path" -> spool.toString)),
        "127.0.0.1", socket.getLocalPort,
        Files.createTempDirectory("frontdoor_dl").toString,
        Files.createTempDirectory("frontdoor_ck").toString,
        Trigger.AvailableNow())
      q.awaitTermination(60000)
      val deadline = System.currentTimeMillis() + 10000
      while (received.synchronized(received.size) < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      socket.close()

      val lines = received.synchronized(received.toList)
      assert(lines.size === 2, s"got: $lines") // 1 query + 1 reply
      assert(lines.count(_.contains("query: door.example. IN A")) === 1)
      assert(lines.count(_.contains("reply: door.example. is 1.2.3.4")) === 1)
      assert(lines.forall(l =>
        l.startsWith("<30>") && l.endsWith("\u0000")))
    } finally server.stop()
  }
}
