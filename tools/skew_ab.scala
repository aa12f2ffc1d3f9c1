// AQE skew-join A/B under bench conditions (round 12): PlanSpec pins the
// split MECHANISM on an in-memory fixture; this measures it on the 100x
// events table. 90% of the 10M-row fact collapses onto one hot key (the
// planted-skew worst case join_salted exists for); the dim side is 1000
// keys so the join must shuffle (SMJ forced, broadcast disabled). A/B =
// identical query with AQE skew-split on vs off, 3-rep min after warmup;
// the ON plan's "skew=true" partition marks confirm the split fired.
// Thresholds sized to the compressed shuffle blocks of this table
// (hot partition ~10^2 MB raw): skewed past 32MB and 2x median, split
// to 8MB targets -- the same scaling argument as the PlanSpec pin.
// Usage: spark-shell --master local[32] --driver-memory 24g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true -i tools/skew_ab.scala
import org.apache.spark.sql.functions._
val ev = spark.read.parquet("/tmp/graft100x/events.parquet")
val fact = ev.select(when(pmod(col("event_id"), lit(10)) =!= 0, lit(0L)).otherwise(pmod(col("user_id"), lit(1000))).as("k"), md5(concat_ws("-", col("event_id").cast("string"))).as("pad"))
val dim = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
spark.conf.set("spark.sql.adaptive.enabled", "true")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32MB")
spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
// The aggregate MUST consume the pad column (sum of its length) or
// Catalyst column-prunes it out of the shuffle and the hot partition is
// 9M identical 8-byte keys -- which compress below the skew threshold,
// so the split (correctly) never fires. Payload-through-the-join is the
// shape the optimization exists for.
def ab(skew: Boolean): Double = {
  spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew.toString)
  val t0 = System.nanoTime()
  val j = fact.hint("merge").join(dim, "k").agg(sum(col("w") + length(col("pad"))).as("s"), count(lit(1)).as("n"))
  val r = j.collect()
  val dt = (System.nanoTime() - t0) / 1e9
  val ps = j.queryExecution.executedPlan.toString
  val marks = "skew=true".r.findAllIn(ps).length + "skewed".r.findAllIn(ps).length
  println(f"AB skew=$skew time=$dt%6.2f skewMarks=$marks rows=${r(0).getLong(1)}")
  dt
}
ab(true)
ab(false)
val on = (1 to 3).map(_ => ab(true)).min
val off = (1 to 3).map(_ => ab(false)).min
println(f"SKEWAB on=$on%6.2f off=$off%6.2f speedup_from_split=${off / on}%5.2f")
System.exit(0)
