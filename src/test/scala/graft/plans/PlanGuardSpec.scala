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
    // 200k > the guard's BoundedRows: genuinely corpus-sized input
    expectViolation("partition-less-window") {
      s.range(200000).toDF("x")
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
      s.range(200000).toDF("x")
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
      s.range(200000).toDF("x")
        .crossJoin(s.range(200000).toDF("y")).limit(5).collect()
    }
    strict {
      // the engine's one-row broadcast-scalar pattern must stay legal
      val scalar = s.range(200000).toDF("x").agg(sum(col("x")).as("s"))
      s.range(200000).toDF("x").crossJoin(broadcast(scalar))
        .agg(sum(col("x"))).collect()
    }
  }

  test("a bounded branch does not bless the joined corpus (window/collect)") {
    // corpus ⋈ one-row scalar is still corpus-sized: a global window or
    // grouping-less collect over it must be rejected — the first-cut
    // collectFirst boundedness passed these through the scalar branch
    val corpus = s.range(200000).toDF("x")
    val scalar = corpus.agg(sum(col("x")).as("s"))
    expectViolation("partition-less-window") {
      corpus.crossJoin(broadcast(scalar))
        .withColumn("r", row_number().over(Window.orderBy("x")))
        .collect()
    }
    expectViolation("unbounded-collect") {
      corpus.crossJoin(broadcast(scalar))
        .agg(collect_list(col("x"))).collect()
    }
  }

  test("Range and persisted one-row scalars count as bounded join sides") {
    // the engine's own patterns: a small Range replicate table and a
    // PERSISTED scalar (an InMemoryRelation leaf by optimization time)
    // riding cross joins — both must stay legal under strict
    strict {
      val reps = s.range(0, 100).toDF("b")
      s.range(1000).toDF("x").crossJoin(reps).agg(sum(col("x"))).collect()
      val kdf = s.range(1000).toDF("x").agg(sum(col("x")).as("k")).persist()
      try {
        kdf.count()
        s.range(1000).toDF("x").crossJoin(broadcast(kdf))
          .agg(sum(col("x"))).collect()
      } finally { kdf.unpersist(); () }
    }
  }

  test("registered engine queries run clean under strict mode") {
    // the two shapes the review flagged as false-positives of the
    // first-cut boundedness: a Range replicate cross join
    // (q_stats_bootstrap) and a persisted one-row scalar riding every
    // round (q_graph_kcore) — both must pass strict end-to-end
    strict {
      assert(graft.SparkEntry.queries("q_stats_bootstrap")(
        s, "/root/testdata/sf0.001").collect().nonEmpty)
      assert(graft.SparkEntry.queries("q_graph_kcore")(
        s, "/root/testdata/sf0.001").collect().nonEmpty)
    }
  }

  test("strict rejects a rank window keyed only on declared low-cardinality columns") {
    // the deployment declares `id`'s derived keys bounded; a
    // row_number over raw rows partitioned on an alias chain rooted
    // ONLY in it must be rejected, while (a) the same rank over an
    // AGGREGATED histogram and (b) a rank also keyed on an undeclared
    // column both stay legal — and with no declaration the check is
    // inert on the identical plan
    s.conf.set(PlanGuard.LowCardColsKey, "id")
    try {
      expectViolation("low-card-ordered-window") {
        s.range(200000)
          .select(col("id").as("g"), (col("id") * 7 % 1000).as("x"))
          .withColumn("rn",
            row_number().over(Window.partitionBy("g").orderBy("x")))
          .agg(sum(col("rn"))).collect()
      }
      strict {
        s.range(200000)
          .select(col("id").as("g"), (col("id") * 7 % 1000).as("x"))
          .groupBy(col("g"), col("x")).count()
          .withColumn("rn",
            row_number().over(Window.partitionBy("g").orderBy("x")))
          .agg(sum(col("rn"))).collect()
        s.range(200000)
          .select(col("id").as("g"), (col("id") * 7 % 1000).as("x"),
            monotonically_increasing_id().as("u"))
          .withColumn("rn",
            row_number().over(Window.partitionBy("g", "u").orderBy("x")))
          .agg(sum(col("rn"))).collect()
      }
    } finally s.conf.unset(PlanGuard.LowCardColsKey)
    strict {
      s.range(200000)
        .select(col("id").as("g"), (col("id") * 7 % 1000).as("x"))
        .withColumn("rn",
          row_number().over(Window.partitionBy("g").orderBy("x")))
        .agg(sum(col("rn"))).collect()
    }
  }

  test("warn and off modes never throw on a violating plan") {
    s.conf.set(PlanGuard.ConfKey, "warn")
    try {
      s.range(200000).toDF("x")
        .withColumn("r", row_number().over(Window.orderBy("x")))
        .agg(sum(col("r"))).collect()
    } finally s.conf.set(PlanGuard.ConfKey, "off")
    s.range(200000).toDF("x")
      .withColumn("r", row_number().over(Window.orderBy("x")))
      .agg(sum(col("r"))).collect()
  }
}
