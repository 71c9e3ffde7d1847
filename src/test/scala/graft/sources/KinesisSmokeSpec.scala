package graft.sources

import graft.SparkTestBase
import graft.dns.Streaming
import org.apache.spark.sql.execution.datasources.DataSource
import org.scalatest.funsuite.AnyFunSuite

/** Reflection smoke for the production Kinesis seam: the pipeline
  * consumes any DSv2 connector through
  * `Streaming.envelopeSource(spark, "<provider>", options)`, and the
  * offline container cannot ship a Kinesis jar — so this spec resolves
  * the provider AT RUNTIME and exercises the config path only when a
  * jar is actually present, canceling with a logged reason otherwise.
  * The day a connector jar lands on the classpath, the production
  * claim becomes a green test instead of documentation. The seam's
  * mechanics (offsets, admission control, restart) are covered today
  * by ReplaySourceSpec through the same code path via `graft-replay`. */
class KinesisSmokeSpec extends AnyFunSuite with SparkTestBase {

  test("provider lookup resolves graft-replay (the mechanism the smoke relies on)") {
    // guards the smoke against rotting: if lookupDataSource semantics
    // change, THIS fails loudly rather than the kinesis arm silently
    // canceling forever
    val cls =
      DataSource.lookupDataSource("graft-replay", spark.sessionState.conf)
    assert(classOf[ReplayEnvelopeSource].isAssignableFrom(cls),
      s"graft-replay resolved to unexpected provider $cls")
  }

  test("kinesis config path is exercised when a provider jar is present") {
    scala.util.Try(
      DataSource.lookupDataSource("kinesis", spark.sessionState.conf)
    ).toOption match {
      case None =>
        info("no 'kinesis' DSv2 provider on the classpath — offline " +
          "container; canceling the live config-path exercise. The " +
          "envelopeSource connector arm is exercised by ReplaySourceSpec.")
        cancel("kinesis provider jar not present in this environment")
      case Some(cls) =>
        info(s"kinesis provider present: $cls — driving the pipeline seam")
        val df = Streaming.envelopeSource(spark, "kinesis",
          Map("streamName" -> "graft-smoke",
            "endpointUrl" -> "http://localhost:0",
            "startingposition" -> "TRIM_HORIZON"))
        assert(df.isStreaming,
          "envelopeSource over a connector must yield a streaming frame")
        assert(df.schema.fieldNames.nonEmpty)
    }
  }
}
