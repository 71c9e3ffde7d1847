package graft.plans

import graft.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The plan-guard optimizer rule: strict mode rejects the three
  * scale-hostile shapes, bounded variants of the same shapes stay
  * legal, warn/off modes never throw. Uses its own session (the rule
  * arrives via the public extension seam, like a user deployment). */
class PlanGuardSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private var prior: Option[SparkSession] = None

  private lazy val s: SparkSession = {
    prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-planguard-test")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    prior.foreach { p =>
      SparkSession.setDefaultSession(p)
      SparkSession.setActiveSession(p)
    }
    super.afterAll()
  }

  private def strict[A](f: => A): A = {
    s.conf.set(PlanGuard.ConfKey, "strict")
    try f finally s.conf.set(PlanGuard.ConfKey, "off")
  }

  private def expectViolation(kind: String)(f: => Unit): Unit = {
    val e = intercept[Throwable](strict(f))
    // the violation may surface directly or wrapped by the executor
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).filter(_ != null).mkString(" | ")
    assert(msgs.contains(kind), s"expected [$kind] in: $msgs")
  }

  test("strict rejects a partition-less window") {
    expectViolation("partition-less-window") {
      s.range(100).toDF("x")
        .withColumn("r", row_number().over(Window.orderBy("x")))
        .collect()
    }
  }

  test("partitioned and limit-bounded windows stay legal") {
    strict {
      s.range(100).toDF("x").withColumn("p", col("x") % 4)
        .withColumn("r",
          row_number().over(Window.partitionBy("p").orderBy("x")))
        .collect()
      s.range(100).toDF("x").orderBy("x").limit(10)
        .withColumn("r", row_number().over(Window.orderBy("x")))
        .collect()
    }
  }

  test("strict rejects a grouping-less collect over unbounded input") {
    expectViolation("unbounded-collect") {
      s.range(100).toDF("x")
        .agg(collect_list(col("x"))).collect()
    }
  }

  test("bounded collect and grouped collect stay legal") {
    strict {
      s.range(100).toDF("x").orderBy("x").limit(10)
        .agg(collect_list(col("x"))).collect()
      s.range(100).toDF("x").withColumn("p", col("x") % 4)
        .groupBy("p").agg(collect_list(col("x"))).collect()
    }
  }

  test("strict rejects an unbounded cartesian; scalar cross joins pass") {
    expectViolation("unbounded-cross-join") {
      s.range(100).toDF("x").crossJoin(s.range(100).toDF("y")).collect()
    }
    strict {
      // the engine's one-row broadcast-scalar pattern must stay legal
      val scalar = s.range(100).toDF("x").agg(sum(col("x")).as("s"))
      s.range(100).toDF("x").crossJoin(broadcast(scalar)).collect()
    }
  }

  test("warn and off modes never throw on a violating plan") {
    s.conf.set(PlanGuard.ConfKey, "warn")
    try {
      s.range(100).toDF("x")
        .withColumn("r", row_number().over(Window.orderBy("x")))
        .collect()
    } finally s.conf.set(PlanGuard.ConfKey, "off")
    s.range(100).toDF("x")
      .withColumn("r", row_number().over(Window.orderBy("x")))
      .collect()
  }
}
