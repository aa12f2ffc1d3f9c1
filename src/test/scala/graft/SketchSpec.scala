package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sketch

/** Liveness + guarantee goldens for the probabilistic operators: the gate
  * corpora exercise bloom false positives only at sf0.1 and CMS
  * overestimates possibly never, so tiny saturated fixtures prove both
  * behaviors here (everything md5-determined — once green, always green).
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom: no false negatives ever; false positives live at small m; matched = exact join") {
    val fact = (1L to 200L).toDF("k")
    val small = Seq(7L, 97L).toDF("sk")
    val got = Sketch.bloomSemiJoin(fact, "k", small, "sk", m = 16)
      .select(col("k"), col("matched")).as[(Long, Boolean)].collect().toMap
    // bloom guarantee: every true key survives the prefilter
    assert(got.get(7L).contains(true) && got.get(97L).contains(true))
    // matched flags exactly the true keys
    assert(got.filter(_._2).keySet == Set(7L, 97L))
    // at m=16 with 4 bits set, collisions are certain across 200 keys:
    // the candidate set strictly exceeds the match set (deterministic)
    assert(got.size > 2, s"expected live false positives, got ${got.size} candidates")
    // and the prefilter did filter: nowhere near all 200 keys pass
    assert(got.size < 200, "prefilter passed everything — bloom is vacuous")
  }

  test("cms: est >= exact for every token; collisions overestimate at small width; state bounded") {
    val tokens = Seq("a", "b", "c", "d", "e", "f", "g", "a", "a", "b")
      .toDF("token")
    val counters = Sketch.cmsCounters(tokens, "token", depth = 2, width = 4)
    assert(counters.count() <= 2 * 4, "counter table exceeds depth x width")
    // total mass per row = total token occurrences
    val mass = counters.groupBy("r").agg(sum("cnt").as("m"))
      .orderBy("r").select("m").as[Long].collect().toSeq
    assert(mass == Seq(10L, 10L))
    val exact = tokens.groupBy("token").agg(count(lit(1)).as("exact_n"))
    val est = Sketch.cmsEstimate(counters, exact, "token", depth = 2, width = 4)
      .select(col("token"), col("exact_n"), col("est"))
      .as[(String, Long, Long)].collect()
    assert(est.forall { case (_, ex, e) => e >= ex },
      s"CMS underestimated: ${est.mkString(",")}")
    // 7 distinct tokens into 4 buckets: some token collides in BOTH rows
    assert(est.exists { case (_, ex, e) => e > ex },
      s"expected a live overestimate at width 4: ${est.mkString(",")}")
  }

  test("kmvLedger under-full branch: n < k makes every estimate exact (booleans with zero slack)") {
    import spark.implicits._
    // 10 elements, k = 256 → the sketch holds everything; the review-fix
    // fallback must report est_union == exact and exact shares, so every
    // within-20pct boolean holds with ZERO estimator error
    val u = (1L to 10L).map(i => (i, java.sql.Date.valueOf("2024-01-01"),
        i <= 6, i >= 4)) // A = 1..6, B = 4..10 → ∩ = 3, A\B = 3, B\A = 4
      .toDF("user_id", "d", "in_a", "in_b")
    val r = graft.ops.Sketch.kmvLedger(u, 256).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 3L, 3L, 4L)), s"exact companions wrong: $r")
    assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6),
      s"under-full estimates must be exact: $r")
  }
}
