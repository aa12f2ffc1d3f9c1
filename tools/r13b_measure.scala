// Scaling rows for the two late round-13 keys: sample_anneal (two-decade,
// expected control-slope linear) and sim_ann_beam_curve (sf01/tenx
// warm-graph reps; the fixed-c=8 IVF graph build at centx is the
// documented DNF twin, same adjudication as align_bitext_knn). Record in
// BASELINE.md.
// Usage: spark-shell --master local[32] --driver-memory 24g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true --conf spark.ui.enabled=false \
//   --driver-class-path target/scala-2.13/classes -i tools/r13b_measure.scala
import graft.SparkEntry
val qs = SparkEntry.queries
val mirror = "/tmp/graft_bench_mirror_ddbe1476c5607681e1c7241437b45958"
val dirs = Seq("sf01" -> mirror, "tenx" -> "/tmp/graft10x", "centx" -> "/tmp/graft100x")
for (k <- Seq("sample_anneal", "sim_ann_beam_curve")) { try qs(k)(spark, "/root/testdata/sf0.001").count() catch { case e: Throwable => println("warmup fail " + k + ": " + e.getMessage) } }
def m(k: String, tag: String, dir: String): Unit = { val t0 = System.nanoTime(); val ok = try { qs(k)(spark, dir).count(); true } catch { case e: Throwable => println("FAIL " + k + " " + tag + ": " + e.getMessage.take(120)); false }; if (ok) println(f"M $k%-22s $tag%-6s ${(System.nanoTime() - t0) / 1e9}%8.2f") }
for (rep <- 1 to 3; (tag, dir) <- dirs) m("sample_anneal", tag, dir)
for (rep <- 1 to 3; (tag, dir) <- dirs.take(2)) m("sim_ann_beam_curve", tag, dir)
println("R13B MEASURE DONE")
System.exit(0)
