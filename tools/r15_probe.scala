// Round-15 optimization probe: for each key named in -Dgraft.probe.keys
// (comma-separated), against the dataset in -Dgraft.probe.dir (default the
// 32-split bench mirror of sf0.1), print
//   (a) the .explain("formatted") plan to plans/r15/<key>_<tag>.txt
//   (b) cold + min-of-3 warm wall seconds (count() action, the bench's
//       timed action) to stdout.
// Tag comes from -Dgraft.probe.tag (before/after). Usage:
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes \
//     -Dgraft.probe.keys=graph_triangles,quality_profile \
//     -Dgraft.probe.tag=before -i tools/r15_probe.scala
import graft.SparkEntry
import java.nio.file.{Files, Paths}

val keys = sys.props.getOrElse("graft.probe.keys", "").split(",").map(_.trim).filter(_.nonEmpty)
val tag = sys.props.getOrElse("graft.probe.tag", "before")
val dir = sys.props.getOrElse("graft.probe.dir",
  "/tmp/graft_bench_mirror_v5_" + java.security.MessageDigest.getInstance("MD5")
    .digest("/root/testdata/sf0.1".getBytes("UTF-8")).map("%02x".format(_)).mkString)
val outDir = Paths.get("plans/r15")
Files.createDirectories(outDir)
val qs = SparkEntry.queries

// session warmup (scheduler + codegen init), mirrors Bench
try spark.range(1000).selectExpr("sum(id)").collect() catch { case _: Throwable => () }

for (k <- keys) {
  try {
    val df = qs(k)(spark, dir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    Files.write(outDir.resolve(s"${k}_$tag.txt"), plan.getBytes("UTF-8"))
    val t0 = System.nanoTime(); qs(k)(spark, dir).count()
    val cold = (System.nanoTime() - t0) / 1e9
    val warm = (1 to 3).map { _ =>
      val t = System.nanoTime(); qs(k)(spark, dir).count()
      (System.nanoTime() - t) / 1e9
    }.min
    println(f"PROBE $k%-28s $tag%-7s cold=$cold%7.2f warm=$warm%7.2f plan=${outDir.resolve(s"${k}_$tag.txt")}")
  } catch { case e: Throwable =>
    println(s"PROBE FAIL $k: ${e.getMessage.take(200)}")
  }
}
sys.exit(0)
