// Two-decade scaling rows for ALL ten round-12 session-2 keys (curation,
// alignment, tokenizer-encode, jsonl export, graph modularity) plus a
// co-measured control, against the same fixtures as tools/centx_measure.scala.
// NOTE: /tmp/graft10x and /tmp/graft100x replicate documents AND the TPC-H
// tables 10x/100x (dup-heavy worst case); graph_modularity reads lineitem,
// everything else here reads only the documents table.
// Usage: spark-shell --master local[32] --driver-memory 24g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true --conf spark.ui.enabled=false \
//   --driver-class-path target/scala-2.13/classes -i tools/centx_curation.scala
import graft.SparkEntry
val keys = Seq("agg_groupby", "text_line_dedup", "sample_dsir",
  "text_perplexity_bucket", "pipeline_sft", "text_unigram_encode",
  "pipeline_dpo", "sample_doremi", "text_wordpiece_encode",
  "export_jsonl", "graph_modularity")
val mirror = "/tmp/graft_bench_mirror_ddbe1476c5607681e1c7241437b45958"
val dirs = Seq("sf01" -> mirror, "tenx" -> "/tmp/graft10x", "centx" -> "/tmp/graft100x")
val qs = SparkEntry.queries
for (k <- keys) { try qs(k)(spark, "/root/testdata/sf0.001").count() catch { case e: Throwable => println("warmup fail " + k + ": " + e.getMessage) } }
val best = scala.collection.mutable.HashMap[(String, String), Double]()
for (rep <- 1 to 3; (tag, dir) <- dirs; k <- keys) { val t0 = System.nanoTime(); val ok = try { qs(k)(spark, dir).count(); true } catch { case e: Throwable => println("FAIL " + k + " " + tag + ": " + e.getMessage); false }; val dt = (System.nanoTime() - t0) / 1e9; val kk = (k, tag); if (ok && dt < best.getOrElse(kk, Double.MaxValue)) best(kk) = dt }
def g(k: String, t: String): String = best.get((k, t)).map(v => f"$v%7.2f").getOrElse("      -")
def ratio(k: String, num: String, den: String): String = (for { n <- best.get((k, num)); d <- best.get((k, den)) } yield f"${n / d}%6.2f").getOrElse("     -")
for (k <- keys) { println(f"RESULT $k%-24s sf01=${g(k, "sf01")} tenx=${g(k, "tenx")} centx=${g(k, "centx")} r10=${ratio(k, "tenx", "sf01")} r100=${ratio(k, "centx", "sf01")} r2=${ratio(k, "centx", "tenx")}") }
System.exit(0)
