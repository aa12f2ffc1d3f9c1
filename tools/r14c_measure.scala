// Round-14 session-3 scaling rows for the three new keys:
// (a) sample_epoch_cap -- one corpus scan + bounded-source arithmetic;
//     expect the scan to dominate and scale ~linearly with tokens;
// (b) sim_ann_rebalance -- cold includes the shared scaled-model train +
//     full-corpus list landing (the n*c IVF assignment every index build
//     pays, shared with delete/filtered); warm is sizes + the oversized
//     members' margin aggregate + per-list windows (skew-bounded);
// (c) stream_ann_upsert -- cold stages the increment + runs the 4-batch
//     checkpointed stream + probes; warm re-runs the stream from a fresh
//     checkpoint over the landed staging (the gate is per-run real) --
//     microbatch-count-bound like the other checkpointed gates.
// Prints one M line per measurement; record in BASELINE.md.
// Usage: spark-shell --master local[32] --driver-memory 24g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true --conf spark.ui.enabled=false \
//   --driver-class-path target/scala-2.13/classes -i tools/r14c_measure.scala
import graft.SparkEntry
val qs = SparkEntry.queries
val dirs = Seq("sf01" -> "/root/testdata/sf0.1", "tenx" -> "/tmp/graft10x", "centx" -> "/tmp/graft100x")
val keys = Seq("sample_epoch_cap", "sim_ann_rebalance", "stream_ann_upsert")
for (k <- keys) { try qs(k)(spark, "/root/testdata/sf0.001").count() catch { case e: Throwable => println("warmup fail " + k + ": " + e.getMessage.take(160)) } }
def m(k: String, tag: String, dir: String, note: String = ""): Unit = { val t0 = System.nanoTime(); val ok = try { qs(k)(spark, dir).count(); true } catch { case e: Throwable => println("FAIL " + k + " " + tag + ": " + e.getMessage.take(160)); false }; if (ok) println(f"M $k%-20s $tag%-6s ${(System.nanoTime() - t0) / 1e9}%8.2f  $note") }
for ((tag, dir) <- dirs) {
  m("sample_epoch_cap", tag, dir, "cold (scan + bounded arithmetic)")
  for (r <- 1 to 3) m("sample_epoch_cap", tag, dir, "warm")
  m("sim_ann_rebalance", tag, dir, "cold: scaled-model train + land lists + rebalance")
  for (r <- 1 to 3) m("sim_ann_rebalance", tag, dir, "warm: sizes + margins + evict")
  m("stream_ann_upsert", tag, dir, "cold: stage + 4-batch stream + probe")
  for (r <- 1 to 3) m("stream_ann_upsert", tag, dir, "warm: fresh ckpt over landed staging")
}
// control
for (r <- 1 to 3; (tag, dir) <- dirs) m("agg_groupby", tag, dir)
println("R14C MEASURE DONE")
System.exit(0)
