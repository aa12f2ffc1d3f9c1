// Round-13 scaling rows: (a) two-decade rows for the new round-13 keys
// (dedup_minhash_clusters, dedup_semantic_scaled, align_bt_rank_capped)
// plus the remaining 10x-only round-12 keys (maintenance_analyze,
// agg_sketch_cms, text_span_dedup, dedup_keeper); (b) align_bitext_knn at
// sf01/tenx (its fixed-c=8 IVF graph at centx is the documented DNF twin;
// the c-scaled kernel study covers the centx deploy shape); (c)
// sql_tpch_parity cold vs cached (the certification amortizes per
// session/dataset); (d) the sim_ann_hnsw BUILD vs SEARCH split the r12
// verdict asked for. Prints one M/PARITY/HNSW line per measurement so a
// killed run still leaves a usable partial record. Record in BASELINE.md.
// Usage: spark-shell --master local[32] --driver-memory 24g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true --conf spark.ui.enabled=false \
//   --driver-class-path target/scala-2.13/classes -i tools/r13_measure.scala
import graft.SparkEntry
import graft.ops.Ann
import graft.Tables
val qs = SparkEntry.queries
val mirror = "/tmp/graft_bench_mirror_ddbe1476c5607681e1c7241437b45958"
val dirs = Seq("sf01" -> mirror, "tenx" -> "/tmp/graft10x", "centx" -> "/tmp/graft100x")
val keys = Seq("agg_groupby", "dedup_minhash_clusters", "dedup_semantic_scaled", "align_bt_rank_capped", "maintenance_analyze", "agg_sketch_cms", "text_span_dedup")
for (k <- keys ++ Seq("align_bitext_knn", "dedup_keeper")) { try qs(k)(spark, "/root/testdata/sf0.001").count() catch { case e: Throwable => println("warmup fail " + k + ": " + e.getMessage) } }
def m(k: String, tag: String, dir: String): Unit = { val t0 = System.nanoTime(); val ok = try { qs(k)(spark, dir).count(); true } catch { case e: Throwable => println("FAIL " + k + " " + tag + ": " + e.getMessage.take(120)); false }; if (ok) println(f"M $k%-24s $tag%-6s ${(System.nanoTime() - t0) / 1e9}%8.2f") }
for (rep <- 1 to 3; (tag, dir) <- dirs; k <- keys) m(k, tag, dir)
for (rep <- 1 to 3; (tag, dir) <- dirs.take(2)) m("align_bitext_knn", tag, dir)
for ((tag, dir) <- dirs.take(2)) { val t0 = System.nanoTime(); qs("sql_tpch_parity")(spark, dir).count(); val cold = (System.nanoTime() - t0) / 1e9; val t1 = System.nanoTime(); qs("sql_tpch_parity")(spark, dir).count(); val warm = (System.nanoTime() - t1) / 1e9; println(f"PARITY $tag%-6s cold=$cold%8.2f cached=$warm%6.2f") }
for ((tag, dir) <- dirs.take(2)) { val t0 = System.nanoTime(); val g = Ann.knnGraph(spark, dir, 16); val ne = g.count(); val tb = (System.nanoTime() - t0) / 1e9; val v = Ann.prep(Tables.embeddings(spark, dir)).localCheckpoint(); var bestS = 1e9; for (r <- 1 to 3) { val t1 = System.nanoTime(); Ann.beamSearchTopK(v, g, Seq(0L, 101L, 202L), 8, 16, 4, 10).count(); val ds = (System.nanoTime() - t1) / 1e9; if (ds < bestS) bestS = ds }; println(f"HNSW $tag%-6s edges=$ne build_first=$tb%8.2f search_min=$bestS%6.2f") }
for ((tag, dir) <- dirs) m("dedup_keeper", tag, dir)
println("R13 MEASURE DONE")
System.exit(0)
