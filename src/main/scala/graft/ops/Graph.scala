package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph analytics (SURVEY.md §2.7b, round 8): PageRank over a
  * co-occurrence graph — the iterated join+aggregate family the rest of
  * the inventory lacks (`dedup_keeper`'s min-label propagation is the
  * reachability member; this is the weighted-score member).
  *
  * Everything is INTEGER micro-rank arithmetic (1.0 ≡ 1 000 000) with
  * truncating division on non-negative operands, so every rank at every
  * iteration is a BIGINT both engines agree on bit-for-bit — the same
  * discipline as `event_attribution`'s micro-cent credits. No doubles
  * exist anywhere in the computation, so iteration count cannot compound
  * rounding drift.
  */
object Graph {

  /** Deterministic temp root (join_bucketed / join_dpp convention). */
  private def prDir(d: String): String =
    sys.props("java.io.tmpdir") + "/graft_pr_" +
      java.lang.Integer.toHexString(d.hashCode)

  /** Directed co-occurrence edges: supplier u → v iff both appear in the
    * same order (u ≠ v). The self-join meets on l_orderkey, so candidate
    * pairs are bounded by per-order lineitem count (single digits) —
    * linear in the fact table, never |S|². Symmetric by construction, so
    * every node has out-degree ≥ 1 and PageRank has no dangling mass. */
  def supplierEdges(li: DataFrame): DataFrame = {
    val a = li.select(col("l_orderkey"), col("l_suppkey").as("u"))
    val b = li.select(col("l_orderkey"), col("l_suppkey").as("v"))
    a.join(b, Seq("l_orderkey"))
      .filter(col("u") =!= col("v"))
      .select("u", "v").distinct()
  }

  /** The iteration core over a degree-carrying (u, v, d) edge relation
    * and a (node) vertex relation: `iters` rounds of
    *   r'(v) = 150000 + 85 · Σ_{u→v} (r(u) div d(u)) div 100
    * i.e. damping 0.85 in micro-units with truncating division. Each
    * round is one edge⋈rank join on u (AQE broadcasts the node-sized
    * rank side at test SFs, shuffle-joins at web scale) plus one
    * combinable sum on v. */
  def iterateWithDeg(ed: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    var r = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to iters) {
      r = ed.join(r, col("u") === col("node"))
        .select(col("v"), expr("r div d").as("c"))
        .groupBy("v")
        .agg(sum(col("c")).as("s"))
        .select(col("v").as("node"),
          (lit(150000L) + expr("(85 * s) div 100")).as("r"))
    }
    r
  }

  /** Degree-computing wrapper over a bare (u, v) edge relation — the
    * form EdgeSpec pins with hand-computed exact ranks. */
  def pagerankIterate(edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy("u").agg(count(lit(1)).as("d"))
    iterateWithDeg(edges.join(deg, "u"), deg.select(col("u").as("node")), iters)
  }

  /** PageRank over the 1996 co-engagement graph: scope the fact table to
    * one order-year (a real analysis window — and what keeps the edge
    * build proportionate to the question asked), then materialize the
    * degree-carrying edge relation ONCE to parquet before iterating. At
    * 100 TB the edge build is the expensive pass — every production graph
    * pipeline lands it first, which is also what keeps the 3-iteration
    * lineage from recomputing the fact self-join (and the degree
    * aggregate — it rides IN the edge file) every round. The oracle
    * replays the identical 3 rounds as unrolled CTEs (the
    * `sim_ann_kmeans` Lloyd-round pattern) with `//` floor division —
    * equal to `div` truncation on these non-negative operands. */
  def pagerankPlan(s: SparkSession, d: String): DataFrame = {
    val root = prDir(d)
    val ord96 = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .select("o_orderkey")
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
      .join(ord96, col("l_orderkey") === col("o_orderkey"))
      .drop("o_orderkey")
    val edges = supplierEdges(li)
    val deg = edges.groupBy("u").agg(count(lit(1)).as("d"))
    edges.join(deg, "u").write.mode("overwrite").parquet(root + "/edges")
    deg.select(col("u").as("node"))
      .write.mode("overwrite").parquet(root + "/nodes")
    iterateWithDeg(s.read.parquet(root + "/edges"),
      s.read.parquet(root + "/nodes"), 3)
      .orderBy(col("r").desc, col("node"))
      .limit(25)
      .select(col("node"), col("r").as("rank_micro"))
  }

  private val Round =
    """SELECT e.v AS node,
      |       CAST(150000 + (85 * sum(PREV.r // e.d)) // 100 AS BIGINT) AS r
      |FROM edges e
      |JOIN PREV ON e.u = PREV.node
      |GROUP BY e.v""".stripMargin

  val graphPagerank = QueryDef(
    "graph_pagerank",
    s"""WITH ord96 AS (
       |  SELECT o_orderkey FROM orders
       |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
       |    AND o_orderdate <  TIMESTAMP '1997-01-01'
       |), li AS (
       |  SELECT l_orderkey, l_suppkey FROM lineitem
       |  JOIN ord96 ON l_orderkey = o_orderkey
       |), e0 AS (
       |  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
       |  FROM li a JOIN li b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
       |), deg AS (
       |  SELECT u, CAST(count(*) AS BIGINT) AS d FROM e0 GROUP BY u
       |), edges AS (
       |  SELECT e0.u, e0.v, deg.d FROM e0 JOIN deg ON e0.u = deg.u
       |), r0 AS (
       |  SELECT u AS node, CAST(1000000 AS BIGINT) AS r FROM deg
       |), r1 AS (
       |${Round.replace("PREV", "r0")}
       |), r2 AS (
       |${Round.replace("PREV", "r1")}
       |), r3 AS (
       |${Round.replace("PREV", "r2")}
       |)
       |SELECT node, r AS rank_micro FROM r3
       |ORDER BY r DESC, node LIMIT 25""".stripMargin) { (s, d) =>
    pagerankPlan(s, d)
  }

  val all: Seq[QueryDef] = Seq(graphPagerank)
}
