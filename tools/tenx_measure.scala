// 10x scaling measurement: edit `keys`, then
//   spark-shell --master local[32] --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes -i tools/tenx_measure.scala
// Requires the 10x tables (tools/tenx_build.scala) and the v4 bench mirror
// (any Bench run builds it). Record results + co-measured controls in BASELINE.md.
import graft.SparkEntry
val keys = Seq(
  "dedup_bloom_incremental", "sim_ann_nprobe_curve", "sample_kfold",
  "event_attribution_position",
  "dedup_incremental", "sim_ann_recall", "sample_split", "event_attribution")
val dirs = Seq("sf01" -> "/tmp/graft_bench_mirror_ddbe1476c5607681e1c7241437b45958", "tenx" -> "/tmp/graft10x")
val qs = SparkEntry.queries
// codegen warmup at sf0.001
for (k <- keys) { try qs(k)(spark, "/root/testdata/sf0.001").count() catch { case e: Throwable => println("warmup fail " + k + ": " + e.getMessage) } }
val best = scala.collection.mutable.HashMap[(String, String), Double]()
for (rep <- 1 to 3; (tag, dir) <- dirs; k <- keys) { val t0 = System.nanoTime(); val ok = try { qs(k)(spark, dir).count(); true } catch { case e: Throwable => println("FAIL " + k + " " + tag + ": " + e.getMessage); false }; val dt = (System.nanoTime() - t0) / 1e9; val kk = (k, tag); if (ok && dt < best.getOrElse(kk, Double.MaxValue)) best(kk) = dt }
for (k <- keys) { println(f"RESULT $k%-24s sf01=${best((k, "sf01"))}%6.2f tenx=${best((k, "tenx"))}%6.2f ratio=${best((k, "tenx")) / best((k, "sf01"))}%5.2f") }
System.exit(0)
