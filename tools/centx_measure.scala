// 100x (sf10-equivalent) scaling measurement -- the round-12 two-decade
// study: each key timed (3-rep min, codegen warmup at sf0.001) against
// the sf0.1 bench mirror, the 10x tables (tools/tenx_build.scala) and
// the 100x tables (tools/centx_build.scala). `keysTenx` keys involve a
// documented quadratic naive twin (all-pairs kernels) and are measured
// at sf0.1 + 10x only; their scale paths appear in keysAll or in
// tools/centx_kernels.scala (c-scaled cluster builds).
// Usage: spark-shell --master local[32] --driver-memory 24g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true --conf spark.ui.enabled=false \
//   --driver-class-path target/scala-2.13/classes -i tools/centx_measure.scala
// Record results + co-measured controls in BASELINE.md.
import graft.SparkEntry
val keysAll = Seq(
  "agg_groupby", "filter_pred", "agg_filtered",
  "dedup_exact", "dedup_bloom_incremental",
  "text_gopher_rules", "text_unigram_train", "text_decontaminate_ngram", "pipeline_pretrain",
  "swivel_cooc", "graph_pagerank", "graph_triangles", "graph_components",
  "pipeline_tpch_q9", "pipeline_tpch_q21",
  "event_funnel", "event_retention", "window_skew_topk",
  "stream_restart_resume", "stream_join_sink")
val keysTenx = Seq(
  "dedup_minhash", "dedup_minhash_recall", "dedup_semantic", "sim_ann_hnsw", "sim_ann_graph_build",
  "sim_ann_kmeans_recall", "sim_ann_pq_recall", "sim_ann_nprobe_curve")
val mirror = "/tmp/graft_bench_mirror_ddbe1476c5607681e1c7241437b45958"
val dirsAll = Seq("sf01" -> mirror, "tenx" -> "/tmp/graft10x", "centx" -> "/tmp/graft100x")
val dirsTenx = Seq("sf01" -> mirror, "tenx" -> "/tmp/graft10x")
val qs = SparkEntry.queries
for (k <- keysAll ++ keysTenx) { try qs(k)(spark, "/root/testdata/sf0.001").count() catch { case e: Throwable => println("warmup fail " + k + ": " + e.getMessage) } }
val best = scala.collection.mutable.HashMap[(String, String), Double]()
def run(keys: Seq[String], dirs: Seq[(String, String)]): Unit = {
  for (rep <- 1 to 3; (tag, dir) <- dirs; k <- keys) { val t0 = System.nanoTime(); val ok = try { qs(k)(spark, dir).count(); true } catch { case e: Throwable => println("FAIL " + k + " " + tag + ": " + e.getMessage); false }; val dt = (System.nanoTime() - t0) / 1e9; val kk = (k, tag); if (ok && dt < best.getOrElse(kk, Double.MaxValue)) best(kk) = dt }
}
run(keysAll, dirsAll)
run(keysTenx, dirsTenx)
def g(k: String, t: String): String = best.get((k, t)).map(v => f"$v%7.2f").getOrElse("      -")
for (k <- keysAll) { println(f"RESULT $k%-26s sf01=${g(k, "sf01")} tenx=${g(k, "tenx")} centx=${g(k, "centx")} r10=${best.getOrElse((k, "tenx"), 0.0) / best((k, "sf01"))}%5.2f r100=${best.getOrElse((k, "centx"), 0.0) / best((k, "sf01"))}%6.2f") }
for (k <- keysTenx) { println(f"RESULT $k%-26s sf01=${g(k, "sf01")} tenx=${g(k, "tenx")} r10=${best.getOrElse((k, "tenx"), 0.0) / best((k, "sf01"))}%5.2f (centx: quadratic-twin key, see centx_kernels)") }
System.exit(0)
