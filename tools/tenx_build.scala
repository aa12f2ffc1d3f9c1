// Rebuild the /tmp 10x tables (BASELINE.md scaling-study inputs) after a
// /tmp wipe. Replicates the sf0.1 tables x10 with id offsets; documents
// is the dup-heavy worst case (each text appears 10x under distinct
// doc_ids); embeddings replicate with vec_id offset 10,000,000.
// Usage: spark-shell ... -i tools/tenx_build.scala
import org.apache.spark.sql.functions._
val sf = "/root/testdata/sf0.1"
val out = "/tmp/graft10x"
val reps = spark.range(10).toDF("rep")
def land(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
  df.repartition(32).write.mode("overwrite").parquet(s"$out/$name.parquet")
  println(s"$name: ${spark.read.parquet(s"$out/$name.parquet").count}")
}
val li = spark.read.parquet(s"$sf/lineitem.parquet")
// l_partkey/l_suppkey offset with the same rep stride as p_partkey/
// s_suppkey so each replica joins its own replica's part/supplier rows
// (round-11 advice: unoffset, every replica collapsed onto replica-0
// dims and reps 1..9 of part/supplier dangled)
land("lineitem", li.crossJoin(reps)
  .withColumn("l_orderkey", col("l_orderkey") + col("rep") * 10000000L)
  .withColumn("l_partkey", col("l_partkey") + col("rep") * 1000000L)
  .withColumn("l_suppkey", col("l_suppkey") + col("rep") * 1000000L).drop("rep"))
val ord = spark.read.parquet(s"$sf/orders.parquet")
land("orders", ord.crossJoin(reps)
  .withColumn("o_orderkey", col("o_orderkey") + col("rep") * 10000000L)
  .withColumn("o_custkey", col("o_custkey") + col("rep") * 1000000L).drop("rep"))
val cust = spark.read.parquet(s"$sf/customer.parquet")
land("customer", cust.crossJoin(reps).withColumn("c_custkey", col("c_custkey") + col("rep") * 1000000L).drop("rep"))
val part = spark.read.parquet(s"$sf/part.parquet")
land("part", part.crossJoin(reps).withColumn("p_partkey", col("p_partkey") + col("rep") * 1000000L).drop("rep"))
val supp = spark.read.parquet(s"$sf/supplier.parquet")
land("supplier", supp.crossJoin(reps).withColumn("s_suppkey", col("s_suppkey") + col("rep") * 1000000L).drop("rep"))
val ev = spark.read.parquet(s"$sf/events.parquet")
land("events", ev.crossJoin(reps)
  .withColumn("event_id", col("event_id") + col("rep") * 100000000L)
  .withColumn("user_id", col("user_id") + col("rep") * 1000000L).drop("rep"))
val docs = spark.read.parquet(s"$sf/documents.parquet")
land("documents", docs.crossJoin(reps).withColumn("doc_id", col("doc_id") + col("rep") * 10000000L).drop("rep"))
val emb = spark.read.parquet(s"$sf/embeddings.parquet")
land("embeddings", emb.crossJoin(reps).withColumn("vec_id", col("vec_id") + col("rep") * 1000000L).drop("rep"))
for (small <- Seq("region", "nation")) {
  spark.read.parquet(s"$sf/$small.parquet").write.mode("overwrite").parquet(s"$out/$small.parquet")
  println(s"$small copied")
}
println("DONE 10x build at " + out)
sys.exit(0)
