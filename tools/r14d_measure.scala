// Round-14 session-4 scaling rows: the two-level serving-index build.
// (a) BUILD A/B in isolation: the ivfdell landing via the flat n*c
//     assignment (the session-3 study's named boundary: 33-44 s at the
//     100x point inside the delete/filtered cold rows) vs the two-level
//     n*(g + c/g) quantizer that now gates as sim_ann_ivf2 -- same
//     model, same output contract (vec_id, bucket), timed to parquet.
// (b) The gated serving keys cold/warm at the three decades, post-swap:
//     sim_ann_ivf2 cold = sample-train + two-level landing + probe;
//     delete/filtered/rebalance/upsert share the landed artifact.
// Prints one M line per measurement; record in BASELINE.md.
// Usage: /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true --conf spark.ui.enabled=false \
//   --driver-class-path target/scala-2.13/classes -i tools/r14d_measure.scala
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables}

val qs = SparkEntry.queries
val dirs = Seq("sf01" -> "/root/testdata/sf0.1", "tenx" -> "/tmp/graft10x", "centx" -> "/tmp/graft100x")

def timed[T](body: => T): (T, Double) = {
  val t0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - t0) / 1e9)
}

// ---- (a) isolated build A/B: flat vs two-level, same scaled model
for ((tag, dir) <- dirs) {
  val v = graft.ops.Ann.prep(Tables.embeddings(spark, dir)).localCheckpoint()
  val n = v.count()
  val c = math.max(8L, n / 200L).toInt
  val vs = v.orderBy(col("vec_id")).limit(1024).localCheckpoint()
  val (cents, tTrain) = timed {
    val m = graft.ops.Ann.kmeansCentroidsQuantized(vs, c, 3); m.count(); m
  }
  println(f"M build_train        $tag%-6s $tTrain%8.2f  n=$n c=$c (bounded-sample Lloyd)")
  val (_, tFlat) = timed {
    graft.ops.Ann.assignTo(v, cents).select("vec_id", "bucket")
      .write.mode("overwrite").parquet("/tmp/ab_flat_" + tag)
  }
  println(f"M build_flat_nc      $tag%-6s $tFlat%8.2f  n*c assignment -> parquet")
  val (_, tTwo) = timed {
    graft.ops.Ann.twoLevelAssign(v, cents).select("vec_id", "bucket")
      .write.mode("overwrite").parquet("/tmp/ab_two_" + tag)
  }
  println(f"M build_two_level    $tag%-6s $tTwo%8.2f  n*(g+c/g) two-level -> parquet")
  val flat = spark.read.parquet("/tmp/ab_flat_" + tag)
  val two = spark.read.parquet("/tmp/ab_two_" + tag)
  val agree = flat.join(two, Seq("vec_id", "bucket")).count()
  println(f"M build_agreement    $tag%-6s ${agree * 100.0 / n}%8.2f  pct buckets identical (totality: ${two.count()} of $n)")
}

// ---- (b) the gated keys across decades (cold first run, then 3 warm)
val keys = Seq("sim_ann_ivf2", "sim_ann_delete", "sim_ann_filtered",
  "sim_ann_rebalance", "sim_ann_upsert", "stream_ann_upsert")
for (k <- keys) { try qs(k)(spark, "/root/testdata/sf0.001").count() catch { case e: Throwable => println("warmup fail " + k + ": " + e.getMessage.take(160)) } }
def m(k: String, tag: String, dir: String, note: String = ""): Unit = {
  val t0 = System.nanoTime()
  val ok = try { qs(k)(spark, dir).count(); true }
    catch { case e: Throwable => println("FAIL " + k + " " + tag + ": " + e.getMessage.take(160)); false }
  if (ok) println(f"M $k%-20s $tag%-6s ${(System.nanoTime() - t0) / 1e9}%8.2f  $note")
}
for ((tag, dir) <- dirs; k <- keys) {
  m(k, tag, dir, "cold")
  for (r <- 1 to 3) m(k, tag, dir, "warm")
}
// control
for (r <- 1 to 3; (tag, dir) <- dirs) m("agg_groupby", tag, dir)
println("R14D MEASURE DONE")
System.exit(0)
