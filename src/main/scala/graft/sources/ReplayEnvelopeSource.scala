package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-replay` — a DataSource V2 micro-batch streaming source that
  * replays deterministic Firehose-style envelope documents, registered
  * under the SAME connector API a production Kinesis source
  * implements (`TableProvider` → `Scan.toMicroBatchStream` →
  * `MicroBatchStream with SupportsAdmissionControl`). The Kinesis
  * connector jar cannot ship in this offline environment; this source
  * makes the integration point REAL rather than documented: the
  * pipeline consumes it through the ordinary
  * `Streaming.envelopeSource(spark, "graft-replay", options)` seam
  * with zero pipeline-side changes, exactly as it would a connector.
  *
  * Connector-faithful mechanics, not a toy:
  *   - offsets are a monotone record index, serialized to the
  *     checkpoint log as JSON and restored via `deserializeOffset` —
  *     a restarted query resumes mid-stream (spec-asserted);
  *   - batch sizing rides `SupportsAdmissionControl.latestOffset
  *     (start, limit)` (the Kafka/Kinesis shape) so restart safety
  *     does not depend on source-instance state;
  *   - each batch splits into `shards` contiguous `InputPartition`s,
  *     read by executor-side `PartitionReader`s.
  *
  * Options: `rowsPerBatch` (admission cap per trigger, default 100),
  * `maxRows` (stream end, default 1000), `shards` (partitions per
  * batch, default 2). Emits one column `data: string` — the envelope
  * JSON document, the payload shape `envelopeSource`'s connector arm
  * expects. Record i is a fully VALID envelope (one Route53 record,
  * one answer), so the downstream pipeline emits 2 syslog lines per
  * envelope — which the spec pins. */
class ReplayEnvelopeSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-replay"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplayEnvelopeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ReplayTable(new CaseInsensitiveStringMap(properties))
}

object ReplayEnvelopeSource {
  val schema: StructType =
    StructType(Seq(StructField("data", StringType, nullable = false)))

  /** Deterministic valid envelope document for record index i —
    * requestId/timestamp/one base64 record with one answer. */
  def envelopeJson(i: Long): String = {
    val payload =
      s"""{"version":"1.100000","account_id":"111122223333",""" +
        s""""region":"eu-west-1","vpc_id":"vpc-${i % 10}",""" +
        f""""query_timestamp":"2026-01-01T00:${i / 60 % 60}%02d:${i % 60}%02dZ",""" +
        s""""query_name":"u$i.example.com.","query_type":"A",""" +
        s""""query_class":"IN","rcode":"NOERROR",""" +
        s""""answers":[{"Rdata":"10.0.0.${i % 250}","Type":"A","Class":"IN"}],""" +
        s""""srcaddr":"10.0.0.${i % 250}","srcport":"${1024 + i % 60000}",""" +
        s""""transport":"UDP","srcids":{"instance":"i-$i"}}"""
    val b64 = java.util.Base64.getEncoder.encodeToString(
      payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    s"""{"requestId":"req-$i","timestamp":$i,"records":[{"data":"$b64"}]}"""
  }
}

private[sources] class ReplayTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  override def name(): String = "graft-replay"
  override def schema(): StructType = ReplayEnvelopeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder with Scan {
    override def build(): Scan = this
    override def readSchema(): StructType = ReplayEnvelopeSource.schema
    override def description(): String = "graft-replay envelope stream"
    override def toMicroBatchStream(checkpointLocation: String)
        : MicroBatchStream =
      new ReplayMicroBatchStream(
        rowsPerBatch = longOpt(caseInsensitiveOptions, "rowsPerBatch", 100L),
        maxRows = longOpt(caseInsensitiveOptions, "maxRows", 1000L),
        shards = longOpt(caseInsensitiveOptions, "shards", 2L).toInt)
  }

  private def longOpt(o: CaseInsensitiveStringMap, key: String,
      dflt: Long): Long =
    Option(o.get(key)).map(_.toLong).getOrElse(dflt)
}

/** A monotone record-index offset, JSON-serialized to the offset log. */
case class ReplayOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

private[sources] class ReplayMicroBatchStream(rowsPerBatch: Long,
    maxRows: Long, shards: Int)
  extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = ReplayOffset(0L)

  override def deserializeOffset(json: String): Offset =
    ReplayOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  /** The admission-control form — start comes from the engine's
    * checkpoint state, so a fresh source instance resumes correctly
    * after restart (the no-arg variant below is never called when
    * this one is implemented). The ENGINE's limit is authoritative
    * when it carries a row cap (Trigger.AvailableNow wraps the
    * default limit in a composite; a changed trigger may pass a
    * different cap than this instance's rowsPerBatch), and the
    * result clamps to ≥ start so a restart with a smaller maxRows
    * than the checkpointed offset yields an empty batch, never a
    * negative range. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[ReplayOffset].index
    ReplayOffset(math.max(from, math.min(from + admitted(limit), maxRows)))
  }

  /** Rows this trigger admits: the smallest maxRows cap in the
    * engine-supplied limit; everything available for
    * ReadAllAvailable; this source's configured batch size when the
    * limit carries no row semantics (ReadMinRows etc.). */
  private def admitted(limit: ReadLimit): Long = limit match {
    case m: ReadMaxRows => m.maxRows()
    case _: ReadAllAvailable => maxRows
    case c: CompositeReadLimit =>
      val caps = c.getReadLimits.collect { case m: ReadMaxRows => m.maxRows() }
      if (caps.nonEmpty) caps.min else rowsPerBatch
    case _ => rowsPerBatch
  }

  override def latestOffset(): Offset =
    throw new IllegalStateException(
      "latestOffset(Offset, ReadLimit) should be called instead of this")

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val from = start.asInstanceOf[ReplayOffset].index
    val to = end.asInstanceOf[ReplayOffset].index
    val n = math.max(1, math.min(shards.toLong, to - from)).toInt
    (0 until n).map { s =>
      val lo = from + (to - from) * s / n
      val hi = from + (to - from) * (s + 1) / n
      ReplayPartition(lo, hi): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition)
          : PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[ReplayPartition]
        new PartitionReader[InternalRow] {
          private var i = p.from - 1
          override def next(): Boolean = { i += 1; i < p.until }
          override def get(): InternalRow =
            InternalRow(UTF8String.fromString(
              ReplayEnvelopeSource.envelopeJson(i)))
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class ReplayPartition(from: Long, until: Long)
  extends InputPartition
