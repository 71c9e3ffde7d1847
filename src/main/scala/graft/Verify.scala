package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing args select a query subset (dev iteration);
    // the driver's 2-arg call dumps the full registry. `--families=x,y`
    // selects whole families (the q_<fam>_ name prefix) so per-family
    // gate iteration stays fast as the registry grows.
    val (famArgs, nameArgs) = args.drop(2).partition(_.startsWith("--families="))
    val fams = famArgs.flatMap(_.stripPrefix("--families=").split(","))
      .filter(_.nonEmpty).toSet
    def family(n: String): String = n.split("_").lift(1).getOrElse("other")
    val subset = nameArgs.toSet
    // a typo'd subset name would otherwise run a PARTIAL gate that
    // looks like a passing one — fail fast instead
    val unknown = subset.diff(SparkEntry.queries.keySet) ++
      fams.diff(SparkEntry.queries.keySet.map(family))
    if (unknown.nonEmpty) {
      System.err.println(
        s"[verify] unknown query/family name(s): ${unknown.toSeq.sorted.mkString(", ")}")
      sys.exit(1)
    }
    // `--families=` with an EMPTY value (e.g. an unset shell variable)
    // must not silently fall through to a full-registry run — the
    // caller asked for a subset; an empty one is a mistake
    if (famArgs.nonEmpty && fams.isEmpty) {
      System.err.println("[verify] --families= given with no family names")
      sys.exit(1)
    }
    val selected =
      if (subset.isEmpty && fams.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) =>
        subset(n) || fams.contains(family(n))
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache() // intra-query persists don't leak
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
