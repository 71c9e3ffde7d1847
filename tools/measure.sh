#!/bin/bash
# Per-query measurement harness for optimization rounds: times N reps of
# selected registered queries (Bench methodology: .count() action, AQE on,
# shuffle.partitions = cores, warmup rep at sf0.001) and writes each query's
# .explain("formatted") to a file. Dev tooling only — the shipped library
# has no dependency on it.
#
# Usage: tools/measure.sh <outDir> <q1,q2,...> [reps] [cores] [sfDir]
set -e
OUT="$1"; NAMES="$2"; REPS="${3:-3}"; CORES="${4:-32}"
SFDIR="${5:-/root/testdata/sf0.1}"
mkdir -p "$OUT"
cat > "$OUT/_measure.scala" <<EOF
val names = "$NAMES".split(",").toSeq
val sfDir = "$SFDIR"
val reps = $REPS
val qs = graft.SparkEntry.queries
import org.apache.spark.sql.execution.ExplainMode
names.foreach { n =>
  val fn = qs(n)
  try { fn(spark, "/root/testdata/sf0.001").count() } catch { case _: Throwable => () }
  spark.catalog.clearCache()
  val plan = fn(spark, sfDir).queryExecution.explainString(ExplainMode.fromString("formatted"))
  java.nio.file.Files.writeString(java.nio.file.Paths.get("$OUT", n + ".txt"), plan)
  val ts = (1 to reps).map { _ =>
    spark.sparkContext.setJobDescription(n)
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache(); System.gc()
    dt
  }.sorted
  val med = if (ts.length % 2 == 1) ts(ts.length / 2)
            else (ts(ts.length / 2 - 1) + ts(ts.length / 2)) / 2.0
  println(f"MEASURE \$n%s med=\$med%.4f min=\${ts.head}%.4f max=\${ts.last}%.4f")
}
EOF
# EXTRA_CONFS: optional space-separated --conf k=v pairs for config A/Bs
(cat "$OUT/_measure.scala"; echo :quit) | /opt/spark/bin/spark-shell \
  --master "local[$CORES]" \
  --driver-class-path /root/repo/target/scala-2.13/classes \
  --driver-memory 32g \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false $EXTRA_CONFS 2>/dev/null | tr "\\r" "\\n" | grep -E "MEASURE"
