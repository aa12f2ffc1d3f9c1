package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wiring smoke: every declared query executes at sf0.001 and every
  * oracle key has a query (the driver's t1/t2 preconditions). */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys") {
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name executes at sf0.001") {
      assert(fn(spark, d).count() >= 0)
    }
  }
}
