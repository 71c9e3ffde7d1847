package graft.dns

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import java.nio.charset.StandardCharsets
import java.util.Base64

/** SURVEY.md §5.2 property tests, against a faithful Scala port of the
  * reference's validators:
  *  (a) emitted line count = Σ (1 + |answers|) over accepted records;
  *  (b) the formatter is total on accepted rows (no null/blank lines);
  *  (c) the pipeline accepts a record iff the ported
  *      `is_valid_dns_data` + strict strptime accept it;
  *  (d) poison isolation: appending invalid records never changes the
  *      lines produced for the valid ones.
  */
object DnsPipelineProperties extends Properties("DnsPipeline")
    with SparkTestBase {

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  // ----- generators ------------------------------------------------

  private val word: Gen[String] = for {
    n <- Gen.choose(1, 10)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  private val tsValid: Gen[String] = for {
    epoch <- Gen.choose(0L, 2000000000L)
  } yield java.time.Instant.ofEpochSecond(epoch)
    .toString.replace("Z", "") .take(19) + "Z"

  private def quote(s: String) = "\"" + s + "\""

  /** A record as ordered key→raw-JSON-fragment pairs, so mutations can
    * drop/retype fields precisely. */
  private val validRecord: Gen[Vector[(String, String)]] = for {
    qname <- word.map(_ + ".example.com.")
    ts <- tsValid
    nAns <- Gen.choose(0, 3)
    answers <- Gen.listOfN(nAns, for {
      rd <- word; ty <- Gen.oneOf("A", "AAAA", "CNAME", "TXT")
    } yield s"""{"Rdata":${quote(rd)},"Type":${quote(ty)}}""")
    port <- Gen.choose(1024, 65535)
  } yield Vector(
    "version" -> quote("1.100000"),
    "account_id" -> quote("111122223333"),
    "region" -> quote("eu-west-1"),
    "vpc_id" -> quote("vpc-test"),
    "query_timestamp" -> quote(ts),
    "query_name" -> quote(qname),
    "query_type" -> quote("A"),
    "query_class" -> quote("IN"),
    "rcode" -> quote("NOERROR"),
    "answers" -> answers.mkString("[", ",", "]"),
    "srcaddr" -> quote("10.0.0.7"),
    "srcport" -> quote(port.toString),
    "transport" -> quote("UDP"),
    "srcids" -> """{"instance":"i-prop"}""")

  /** Mutations spanning every reference drop reason. */
  private val mutation: Gen[Vector[(String, String)] => (Vector[(String, String)], Boolean)] =
    Gen.oneOf(
      Gen.const((r: Vector[(String, String)]) => (r, true)),
      Gen.oneOf(Schemas.stringFields ++ Seq("answers", "srcids")).map(f =>
        (r: Vector[(String, String)]) => (r.filterNot(_._1 == f), false)),
      Gen.const((r: Vector[(String, String)]) =>
        (r.map { case ("srcport", _) => ("srcport", "53211")
                 case kv => kv }, false)),
      Gen.const((r: Vector[(String, String)]) =>
        (r.map { case ("answers", _) => ("answers", """[{"Type":"A"}]""")
                 case kv => kv }, false)),
      Gen.const((r: Vector[(String, String)]) =>
        (r.map { case ("srcids", _) => ("srcids", """{"other":"x"}""")
                 case kv => kv }, false)),
      Gen.const((r: Vector[(String, String)]) =>
        (r.map { case ("query_timestamp", v) =>
                   ("query_timestamp", v.replace("Z\"", ".123Z\""))
                 case kv => kv }, false)))

  private def render(r: Vector[(String, String)]): String =
    r.map { case (k, v) => s"${quote(k)}:$v" }.mkString("{", ",", "}")

  private case class TestRecord(json: String, valid: Boolean, nAnswers: Int)

  private val anyRecord: Gen[TestRecord] = for {
    base <- validRecord
    m <- mutation
  } yield {
    val (mutated, stillValid) = m(base)
    val nAns = mutated.find(_._1 == "answers")
      .map(a => a._2.count(_ == '{')).getOrElse(0)
    TestRecord(render(mutated), stillValid, nAns)
  }

  private def run(records: Seq[String]): Pipeline.Outputs = {
    val env =
      s"""{"requestId":"prop","records":[${
        records.map(r => s"""{"data":"${b64(r)}"}""").mkString(",")}]}"""
    Pipeline.processJson {
      val sp = spark
      import sp.implicits._
      spark.createDataset(Seq(env))
    }
  }

  propertyWithSeed("accepts iff reference validator accepts; " +
    "line count = sum(1+|answers|); lines are total", None) =
    Prop.forAllNoShrink(Gen.listOfN(6, anyRecord)) { recs =>
      val out = run(recs.map(_.json))
      val expectedIdx = recs.zipWithIndex.collect {
        case (r, i) if r.valid => i }.toSet
      val gotIdx = out.lines.select("record_idx")
        .distinct().collect().map(_.getInt(0)).toSet
      val expectedLines = recs.filter(_.valid).map(1 + _.nAnswers).sum
      val lines = out.lines.select("line").collect().map(_.getString(0))
      (gotIdx == expectedIdx) :| s"accepted $gotIdx expected $expectedIdx" &&
      (lines.length == expectedLines) :| s"${lines.length} lines, want $expectedLines" &&
      lines.forall(l => l != null && l.nonEmpty) :| "formatter must be total" &&
      (out.quarantine.count() == (recs.size - expectedIdx.size)) :| "quarantine count"
    }

  private val validTestRecord: Gen[TestRecord] = validRecord.map { r =>
    val nAns = r.find(_._1 == "answers").map(_._2.count(_ == '{')).getOrElse(0)
    TestRecord(render(r), valid = true, nAns)
  }

  propertyWithSeed("poison isolation: valid lines unchanged by poison", None) =
    Prop.forAllNoShrink(Gen.listOfN(3, validTestRecord),
      Gen.listOfN(2, Gen.oneOf(
        "!!!notb64!!!", b64("{nope"), b64("[1,2]"), ""))) { (valid, poison) =>
      val clean = run(valid.map(_.json)).lines
        .select("record_idx", "line_idx", "line").collect().map(_.toString)
      val mixed = run(valid.map(_.json) ++ poison).lines
        .select("record_idx", "line_idx", "line").collect().map(_.toString)
      (clean.toSeq == mixed.toSeq) :| "valid records' lines must be identical"
    }

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(15)
}
