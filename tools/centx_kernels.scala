// c-SCALED cluster-build kernel study (round 12): measures the claim the
// SemDeDup-shape keys (dedup_semantic, sim_ann_graph_build) rest on --
// "cluster count c grows with the corpus, so the per-bucket candidate
// tile stays bounded and the build is near-linear". The gated keys pin
// correctness against the shared c=8 trained model (oracle-replayable);
// THIS script measures the kernel the way a corpus run deploys it:
// c scaled with n (constant ~250 vectors/bucket at every decade), full
// pipeline = quantized-Lloyd train (3 rounds) + nprobe=3 multi-assign +
// co-bucket candidate join + top-M adjacency. One timed run per decade
// (train is the dominant fixed cost; the candidate join is the scaling
// subject). Record in BASELINE.md.
// Usage: spark-shell --master local[32] --driver-memory 24g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//   --driver-class-path target/scala-2.13/classes -i tools/centx_kernels.scala
import graft.ops.{Ann, Similarity}
import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
def kernel(d: String, c: Int): (Long, Long, Double, Double) = {
  val v = Ann.prep(Tables.embeddings(spark, d)).localCheckpoint()
  val t0 = System.nanoTime()
  val cents = Ann.kmeansCentroidsQuantized(v, c, 3)
  val tTrain = (System.nanoTime() - t0) / 1e9
  val t1 = System.nanoTime()
  val rnA = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))
  val ma = v.crossJoin(broadcast(cents)).select(col("vec_id"), col("cid"), (Similarity.dot(col("ve"), col("cve")) / (col("nrm") * col("cnrm"))).as("ccos")).withColumn("rn", row_number().over(rnA)).filter(col("rn") <= 3).select(col("cid"), col("vec_id")).repartition(col("cid"))
  val cand = ma.as("x").join(ma.as("y"), col("x.cid") === col("y.cid") && col("x.vec_id") < col("y.vec_id")).select(col("x.vec_id").as("i"), col("y.vec_id").as("j")).distinct()
  val p = cand.join(v.select(col("vec_id").as("i"), col("ve").as("vei"), col("nrm").as("nrmi")), Seq("i")).join(v.select(col("vec_id").as("j"), col("ve").as("vej"), col("nrm").as("nrmj")), Seq("j")).select(col("i"), col("j"), (Similarity.dot(col("vei"), col("vej")) / (col("nrmi") * col("nrmj"))).as("cos_raw")).localCheckpoint()
  val dirp = p.unionByName(p.select(col("j").as("i"), col("i").as("j"), col("cos_raw")))
  val w = Window.partitionBy("i").orderBy(col("cos_raw").desc, col("j"))
  val edges = dirp.withColumn("rn", row_number().over(w)).filter(col("rn") <= 16).count()
  val semPairs = p.filter(col("cos_raw") >= 0.5).count()
  val tBuild = (System.nanoTime() - t1) / 1e9
  (edges, semPairs, tTrain, tBuild)
}
for ((tag, d, c) <- Seq(("sf01", "/root/testdata/sf0.1", 8), ("tenx", "/tmp/graft10x", 80), ("centx", "/tmp/graft100x", 800))) { val (e, sp, tt, tb) = kernel(d, c); println(f"KERNEL $tag%-6s c=$c%4d edges=$e%10d sem_pairs=$sp%10d train=$tt%7.2f build=$tb%7.2f") }
System.exit(0)
