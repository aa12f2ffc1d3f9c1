// Round-14 batch 2: scaling rows for sim_ann_delete (new key, tombstone
// + compaction maintenance) and the FUSED sim_ann_beam_curve (three
// width chains in one dataflow -- values identical, cost should drop vs
// the r14 batch-1 unfused rows). Same harness as tools/r14_measure.scala.
// Usage: spark-shell --master local[32] --driver-memory 24g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true --conf spark.ui.enabled=false \
//   --driver-class-path target/scala-2.13/classes -i tools/r14b_measure.scala
import graft.SparkEntry
val qs = SparkEntry.queries
val mirror = "/tmp/graft_bench_mirror_ddbe1476c5607681e1c7241437b45958"
val dirs = Seq("sf01" -> mirror, "tenx" -> "/tmp/graft10x", "centx" -> "/tmp/graft100x")
for (k <- Seq("agg_groupby", "sim_ann_delete", "sim_ann_beam_curve")) { try qs(k)(spark, "/root/testdata/sf0.001").count() catch { case e: Throwable => println("warmup fail " + k + ": " + e.getMessage.take(120)) } }
def m(k: String, tag: String, dir: String, note: String = ""): Unit = { val t0 = System.nanoTime(); val ok = try { qs(k)(spark, dir).count(); true } catch { case e: Throwable => println("FAIL " + k + " " + tag + ": " + e.getMessage.take(120)); false }; if (ok) println(f"M $k%-24s $tag%-6s ${(System.nanoTime() - t0) / 1e9}%8.2f  $note") }
for ((tag, dir) <- dirs) {
  m("sim_ann_delete", tag, dir, "cold: scaled train + land lists + compaction")
  for (rep <- 1 to 3) m("sim_ann_delete", tag, dir, "warm: tombstone probe + equality + recall")
  m("sim_ann_beam_curve", tag, dir, "cold: graph build + fused curve")
  for (rep <- 1 to 3) m("sim_ann_beam_curve", tag, dir, "warm fused curve")
}
for (rep <- 1 to 3; (tag, dir) <- dirs) m("agg_groupby", tag, dir)
println("R14B MEASURE DONE")
System.exit(0)
