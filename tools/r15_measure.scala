// Round-15 rows: (1) dedup_semantic_scaled after the two-level routing
// (verdict task #1 - the centx cold row must show the 2nsqrtc assign, not
// the flat n*c), (2) sim_ann_ivf2_capped decade rows (task #2 - the cap
// BINDS at centx: c_eff = 512 vs uncapped 1000; cold must scale LINEAR),
// (3) stream_ann_upsert steady state (task #4 - 1 cold + 5 warm reps
// over the landed staging; warm variance must sit < 2x).
// Ordering is the attribution: dedup_semantic_scaled runs FIRST per dir
// so its cold pays the shared scaled model + ivfdell landing; ivf2 then
// measures the amortized consumer; capped builds its own model + lists.
// Control: agg_groupby.

// Usage: /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true --conf spark.ui.enabled=false \
//   --driver-class-path target/scala-2.13/classes -i tools/r15_measure.scala
import graft.SparkEntry

val qs = SparkEntry.queries
val dirs = Seq("sf01" -> "/root/testdata/sf0.1", "tenx" -> "/tmp/graft10x", "centx" -> "/tmp/graft100x")
val keys = Seq("dedup_semantic_scaled", "sim_ann_ivf2", "sim_ann_ivf2_capped", "agg_groupby")

// JIT warmup at the smallest SF so the cold rows measure plan cost, not JIT
for (k <- keys :+ "stream_ann_upsert") {
  try qs(k)(spark, "/root/testdata/sf0.001").count()
  catch { case e: Throwable => println("warmup fail " + k + ": " + e.getMessage.take(160)) }
}

def once(k: String, dir: String): Double = {
  val t0 = System.nanoTime()
  qs(k)(spark, dir).count()
  (System.nanoTime() - t0) / 1e9
}

var nFail = 0

def m(k: String, tag: String, dir: String): Unit = {
  try {
    val cold = once(k, dir)
    val warm = (1 to 3).map(_ => once(k, dir)).min
    println(f"M $k%-22s $tag%-6s cold=$cold%8.2f warm=$warm%8.2f")
  } catch { case e: Throwable =>
    nFail += 1
    println("FAIL " + k + " " + tag + ": " + e.getMessage.take(200))
  }
}

for ((tag, dir) <- dirs; k <- keys) m(k, tag, dir)

// stream_ann_upsert steady state: rep-1 stages the increment files +
// trains the base model (cold); reps 2..6 re-run the 4-microbatch
// checkpointed stream over the LANDED staging - the steady-state the
// r14 row could not separate. Print every rep so the variance is the
// record, not a summary of it.
for ((tag, dir) <- dirs if tag == "centx") {
  try {
    val cold = once("stream_ann_upsert", dir)
    val reps = (1 to 5).map(_ => once("stream_ann_upsert", dir))
    println(f"M stream_ann_upsert     $tag%-6s cold=$cold%8.2f warm_reps=" +
      reps.map(r => f"$r%.2f").mkString(",") +
      f" min=${reps.min}%.2f max=${reps.max}%.2f ratio=${reps.max / reps.min}%.2f")
  } catch { case e: Throwable =>
    nFail += 1
    println("FAIL stream_ann_upsert " + tag + ": " + e.getMessage.take(200))
  }
}
// exit 1 on any failed measurement so a chained caller cannot record
// the round's decade rows as collected when they were not (review
// finding: the script always exited 0)
println(if (nFail == 0) "DONE r15" else s"DONE r15 with $nFail FAILURES")
sys.exit(if (nFail == 0) 0 else 1)
