// Round-16 plan dumps: explain("formatted") for every key this round
// touches, written to plans/r16/<key>_<TAG>.txt. TAG comes from the
// environment (BEFORE against the pre-change classes, AFTER post-change)
// so the same script produces both sides of the evidence.
//
// Usage: /opt/spark/bin/spark-shell --master local[32] --driver-memory 16g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true --conf spark.ui.enabled=false \
//   --driver-class-path target/scala-2.13/classes -i tools/r16_dump.scala
// with R16_TAG=before|after
import graft.SparkEntry
import java.nio.file.{Files, Paths}

val tag = sys.env.getOrElse("R16_TAG", "before")
val dir = sys.env.getOrElse("R16_SF_DIR", "/root/testdata/sf0.1")
val keys = Seq("sim_ann_nprobe_curve", "graph_components", "graph_triangles",
  "pipeline_pretrain")
Files.createDirectories(Paths.get("plans/r16"))

// job/stage counter: the graph_components change is an ACTION-count
// optimization (explain can't show it — the loop runs inside the
// builder), so the dump records jobs+stages per key invocation too.
@volatile var jobs = 0
@volatile var stages = 0
spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
  override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
    jobs += 1; stages += j.stageInfos.size
  }
})

// One full invocation = builder (which may run actions itself: the
// graph_components loop, landings) + count. Cold pays landings; the
// warm row is what the bench's min-of-reps measures.
def invoke(k: String): (Double, Int, Int, org.apache.spark.sql.DataFrame) = {
  jobs = 0; stages = 0
  val t0 = System.nanoTime()
  val df = SparkEntry.queries(k)(spark, dir)
  df.count()
  ((System.nanoTime() - t0) / 1e9, jobs, stages, df)
}
for (k <- keys) {
  try {
    val (cw, cj, csg, _) = invoke(k)
    val (ww, wj, wsg, df) = invoke(k)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val hdr = f"-- $k ($tag) sf=$dir  cold: jobs=$cj stages=$csg wall=$cw%.2f s" +
      f"  warm: jobs=$wj stages=$wsg wall=$ww%.2f s\n"
    Files.write(Paths.get(s"plans/r16/${k}_$tag.txt"),
      (hdr + plan).getBytes("UTF-8"))
    println(f"DUMP $k%-24s cold_jobs=$cj cold=$cw%.2f warm_jobs=$wj warm=$ww%.2f")
  } catch { case e: Throwable =>
    println("FAIL " + k + ": " + e.getMessage.take(200))
  }
}
println("DONE dump " + tag)
sys.exit(0)
