package graft.analytics

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source/sink format coverage (SURVEY.md §2.6 row 1): the engine's
  * queries read parquet; CSV, JSON, and ORC round-trips prove the same
  * relational surface runs over every built-in batch format (Avro's
  * connector jar doesn't ship in /opt/spark/jars — documented, not
  * claimed). */
class FormatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("n_nationkey").collect().map(_.toString).toSeq

  test("csv, json and orc round-trip the nation table byte-equally") {
    val nation = Tables(spark, sf, "nation")
    val base = canon(nation)
    val dir = Files.createTempDirectory("formats").toString

    nation.write.option("header", "true").csv(s"$dir/nation_csv")
    val csv = spark.read.option("header", "true")
      .schema(nation.schema).csv(s"$dir/nation_csv")
    assert(canon(csv) === base)

    nation.write.json(s"$dir/nation_json")
    val json = spark.read.schema(nation.schema).json(s"$dir/nation_json")
    assert(canon(json) === base)

    nation.write.orc(s"$dir/nation_orc")
    val orc = spark.read.orc(s"$dir/nation_orc")
    assert(canon(orc) === base)
  }

  test("a registry query runs unchanged over an ORC copy of its input") {
    val dir = Files.createTempDirectory("orc_tables").toString
    Seq("nation", "region", "customer", "supplier").foreach { t =>
      Tables(spark, sf, t).write.orc(s"$dir/${t}_orc")
    }
    // same join/set-op logic, fed from ORC instead of parquet
    val nation = spark.read.orc(s"$dir/nation_orc")
    val cn = nation.join(spark.read.orc(s"$dir/customer_orc"),
        nation("n_nationkey") === col("c_nationkey"), "left_semi")
      .select(col("n_name"))
    val sn = nation.join(spark.read.orc(s"$dir/supplier_orc"),
        nation("n_nationkey") === col("s_nationkey"), "left_semi")
      .select(col("n_name"))
    val fromOrc = cn.intersect(sn).orderBy("n_name")
      .as[String].collect().toSeq
    val fromParquet = RelationalQueries.qSetopsNations.run(spark, sf)
      .filter(col("tag") === "both").select("n_name")
      .as[String].collect().toSeq
    assert(fromOrc === fromParquet && fromOrc.nonEmpty)
  }
}
