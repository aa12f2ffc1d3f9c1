// Partition-scaling A/B at 100x (round 12): the centx sweep ran at
// shuffle.partitions=32 (the sf0.1 bench convention). On a real cluster
// partitions scale with data; this measures the three largest-r100 keys
// at 32 vs 256 partitions to separate "algorithmically superlinear"
// from "32 partitions starve/spill at 60M rows". 2-rep min, codegen
// warmup at sf0.001.
// Usage: spark-shell --master local[32] --driver-memory 24g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true \
//   --driver-class-path target/scala-2.13/classes -i tools/centx_parts_ab.scala
import graft.SparkEntry
val keys = Seq("graph_triangles", "pipeline_tpch_q9", "pipeline_tpch_q21", "pipeline_pretrain")
val qs = SparkEntry.queries
for (k <- keys) { try qs(k)(spark, "/root/testdata/sf0.001").count() catch { case e: Throwable => println("warmup fail " + k + ": " + e.getMessage) } }
val best = scala.collection.mutable.HashMap[(String, Int), Double]()
for (rep <- 1 to 2; p <- Seq(32, 256); k <- keys) {
  spark.conf.set("spark.sql.shuffle.partitions", p.toString)
  val t0 = System.nanoTime()
  val ok = try { qs(k)(spark, "/tmp/graft100x").count(); true } catch { case e: Throwable => println("FAIL " + k + " p=" + p + ": " + e.getMessage); false }
  val dt = (System.nanoTime() - t0) / 1e9
  val kk = (k, p)
  if (ok && dt < best.getOrElse(kk, Double.MaxValue)) best(kk) = dt
}
for (k <- keys) { val a = best((k, 32)); val b = best((k, 256)); println(f"PARTSAB $k%-20s p32=$a%7.2f p256=$b%7.2f speedup=${a / b}%5.2f") }
System.exit(0)
