package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Relational

/** Plan-shape guards (SURVEY §5.2-5): cheap regressions pinning the
  * physical-plan properties the 100 TB design depends on. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def plan(q: graft.ops.QueryDef): String =
    q.fn(spark, d).queryExecution.executedPlan.toString

  test("join_broadcast plans as BroadcastHashJoin (no shuffle of the fact side)") {
    assert(plan(Relational.joinBroadcast).contains("BroadcastHashJoin"))
  }

  test("filter_pred pushes predicates into the parquet scan") {
    val p = plan(Relational.filterPred)
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("IsNotNull") || p.contains("GreaterThan") || p.contains("In("))
  }

  test("scan_project prunes to the 4 selected columns at the scan") {
    val p = plan(Relational.scanProject)
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_shipdate")) // pruned column must not be read
  }

  test("sort_multi top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(plan(Relational.sortMulti).contains("TakeOrderedAndProject"))
  }

  test("agg_groupby uses two-phase hash aggregation (map-side partial)") {
    val p = plan(Relational.aggGroupby)
    assert("HashAggregate".r.findAllIn(p).length >= 2)
  }

  test("whole-stage codegen covers the Q1 pipeline") {
    // AQE's plan toString omits codegen wrappers — execute, then read the
    // formatted explain of the final adaptive plan (codegen stage ids).
    val df = Relational.aggGroupby.fn(spark, d)
    df.collect()
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // Spark 4.1 formatted explain marks codegen spans as "[codegen id : N]"
    assert(formatted.contains("codegen id :"))
  }

  test("sim_knn and dedup_embed plan as blocked equi-joins (no nested-loop N² join)") {
    for (q <- Seq(graft.ops.Similarity.simKnn, graft.ops.Dedup.dedupEmbed)) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"${q.name} still plans an unblocked N² join")
    }
  }

  test("dedup_simhash aggregates with map-side partial merge (two-phase ObjectHashAggregate)") {
    val p = plan(graft.ops.Dedup.dedupSimhash)
    // the SimHashAgg buffer must partial-merge before the doc_id shuffle:
    // 256 B/group over the wire, not the token stream
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2)
    assert(p.contains("simhashagg") || p.contains("SimHashAgg") || p.contains("simhash"))
  }

  test("LSH band projection stays inside whole-stage codegen (LshBandKeys)") {
    val emb = graft.Tables.embeddings(spark, d)
    val v = graft.ops.Ann.prep(emb)
    val df = graft.ops.Ann.lshBands(v, dim = 64, bands = 16, rowsPerBand = 8)
    df.collect() // materialize so AQE reports the FINAL plan
    // read only the final-plan section (the Initial Plan echo below it
    // never carries codegen markers); WSCG shows as a "*(n) " prefix in
    // the tree string
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val gen = p.linesIterator.find(_.contains("Generate")).getOrElse("")
    assert(gen.contains("lshbandkeys"), s"band projection not a single expression: $gen")
    // the unrolled-128-column formulation this replaced ran interpreted
    assert(gen.trim.stripPrefix("+- ").startsWith("*"),
      s"Generate stage not codegen'd: $gen")
  }

  test("join_asof plans with a single shuffle (one Exchange before the window)") {
    val p = plan(Relational.joinAsof)
    // union-tag trick: expect no SortMergeJoin / BroadcastHashJoin at all
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"))
    assert(p.contains("Window") || p.contains("RunningWindowFunction"))
  }
}
