// Round-14 scaling rows: (a) the c-scaled sample-trained IVF kNN-graph
// BUILD (knnGraphIvf now trains on cachedKmeansCentsScaled) cold at
// sf01/tenx/centx -- the r13 verdict's headline fix, where the fixed-c=8
// build was 272-484 s at tenx and the documented DNF twin at centx;
// (b) 100x rows for align_bitext_knn and sim_ann_beam_curve over that
// build (r13 verdict item 3); (c) dedup_semantic_scaled cold train with
// bounded-sample Lloyd (was 175 s at centx unsampled) + warm report
// reps; (d) post-staged-landing-refactor 10x rows for the five real
// checkpointed streaming gates (verdict item 4); (e) the new
// sim_ann_upsert at all three decades (cold = base train + landed base
// lists, warm = assign-only increment + probe). Prints one M/BUILD line
// per measurement so a killed run still leaves a usable partial record.
// Record in BASELINE.md.
// Usage: spark-shell --master local[32] --driver-memory 24g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true --conf spark.ui.enabled=false \
//   --driver-class-path target/scala-2.13/classes -i tools/r14_measure.scala
import graft.SparkEntry
import graft.ops.Ann
val qs = SparkEntry.queries
val mirror = "/tmp/graft_bench_mirror_ddbe1476c5607681e1c7241437b45958"
val dirs = Seq("sf01" -> mirror, "tenx" -> "/tmp/graft10x", "centx" -> "/tmp/graft100x")
val warmKeys = Seq("agg_groupby", "dedup_semantic_scaled", "align_bitext_knn", "sim_ann_beam_curve", "sim_ann_upsert", "stream_stateful_session", "stream_restart_resume", "stream_join_sink", "stream_late_drop", "stream_upsert_sink")
for (k <- warmKeys) { try qs(k)(spark, "/root/testdata/sf0.001").count() catch { case e: Throwable => println("warmup fail " + k + ": " + e.getMessage.take(120)) } }
def m(k: String, tag: String, dir: String, note: String = ""): Unit = { val t0 = System.nanoTime(); val ok = try { qs(k)(spark, dir).count(); true } catch { case e: Throwable => println("FAIL " + k + " " + tag + ": " + e.getMessage.take(120)); false }; if (ok) println(f"M $k%-24s $tag%-6s ${(System.nanoTime() - t0) / 1e9}%8.2f  $note") }
// per decade: semantic-scaled cold (train+report) then warm reps; the
// graph BUILD cold (model already warm from the semantic rep -- the
// BUILD line is candidate-gen + tile scoring + top-M + land); then warm
// graph-consumer reps; then upsert cold + warm.
for ((tag, dir) <- dirs) {
  m("dedup_semantic_scaled", tag, dir, "cold: sample-train + report")
  for (rep <- 1 to 3) m("dedup_semantic_scaled", tag, dir, "warm report")
  val t0 = System.nanoTime(); val ne = Ann.knnGraphIvf(spark, dir, 16, 3).count()
  println(f"BUILD knnGraphIvf $tag%-6s ${(System.nanoTime() - t0) / 1e9}%8.2f  edges=$ne (c-scaled model warm, candidates+score+land)")
  m("align_bitext_knn", tag, dir, "cold-ish rep1 over landed graph")
  for (rep <- 1 to 3) m("align_bitext_knn", tag, dir, "warm")
  m("sim_ann_beam_curve", tag, dir, "rep1")
  for (rep <- 1 to 3) m("sim_ann_beam_curve", tag, dir, "warm")
  m("sim_ann_upsert", tag, dir, "cold: base train + land base lists")
  for (rep <- 1 to 3) m("sim_ann_upsert", tag, dir, "warm: assign increment + probe")
}
// streaming gates: post-refactor rows at sf01 + tenx (checkpointed real
// streams; microbatch-count-bound adjudication on record predates the
// r13 staged-landing rewrite)
val streamKeys = Seq("stream_stateful_session", "stream_restart_resume", "stream_join_sink", "stream_late_drop", "stream_upsert_sink")
for (rep <- 1 to 3; (tag, dir) <- dirs.take(2); k <- streamKeys) m(k, tag, dir)
// control
for (rep <- 1 to 3; (tag, dir) <- dirs) m("agg_groupby", tag, dir)
println("R14 MEASURE DONE")
System.exit(0)
