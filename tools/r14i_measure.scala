// Round-14 session-6 batch-3 rows: quality_dp_release and
// export_shard_plan. Cold = first run, warm = min of 3.
// Control: agg_groupby.

// Usage: /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true --conf spark.ui.enabled=false \
//   --driver-class-path target/scala-2.13/classes -i tools/r14i_measure.scala
import graft.SparkEntry

val qs = SparkEntry.queries
val dirs = Seq("sf01" -> "/root/testdata/sf0.1", "tenx" -> "/tmp/graft10x", "centx" -> "/tmp/graft100x")
val keys = Seq("quality_dp_release", "export_shard_plan",
  "agg_groupby")

// JIT warmup at the smallest SF so the cold rows measure plan cost, not JIT
for (k <- keys) {
  try qs(k)(spark, "/root/testdata/sf0.001").count()
  catch { case e: Throwable => println("warmup fail " + k + ": " + e.getMessage.take(160)) }
}

def m(k: String, tag: String, dir: String): Unit = {
  def once(): Double = {
    val t0 = System.nanoTime()
    qs(k)(spark, dir).count()
    (System.nanoTime() - t0) / 1e9
  }
  try {
    val cold = once()
    val warm = (1 to 3).map(_ => once()).min
    println(f"M $k%-20s $tag%-6s cold=$cold%8.2f warm=$warm%8.2f")
  } catch { case e: Throwable =>
    println("FAIL " + k + " " + tag + ": " + e.getMessage.take(200))
  }
}

for ((tag, dir) <- dirs; k <- keys) m(k, tag, dir)
println("DONE r14i")
sys.exit(0)
