package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Retrieval

/** Invariants + plan pins for the retrieval-serving family (round 14):
  * BM25, hybrid RRF fusion, scatter-gather sharded top-k, chunking. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def plan(q: graft.ops.QueryDef): String =
    q.fn(spark, d).queryExecution.executedPlan.toString

  test("text_bm25 never builds a corpus-wide window (df is a broadcast dim, not a token partition)") {
    val p = plan(Retrieval.textBm25)
    assert(!p.contains("Window"), "df must not be a token-partitioned window")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "df/stats sides must broadcast")
  }

  test("sim_ann_shard scatters via a combinable per-shard top-k (two-phase ObjectHashAggregate)") {
    val p = Retrieval.shardTopK(Retrieval.shardScored(spark, d))
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      "per-shard top-k must partially aggregate before the exchange")
  }

  test("sim_ann_shard merge of per-shard top-k equals the direct global top-k") {
    val rows = Retrieval.simAnnShard.fn(spark, d).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("merge_match")),
      "scatter-gather merge diverged from the direct top-k")
    assert(rows.map(_.getAs[Long]("n_topk")).sum == 10L,
      "shard contributions must sum to k")
  }

  test("text_chunk covers every token with stride-24 starts and a full-or-final window") {
    val ch = Retrieval.textChunk.fn(spark, d)
      .groupBy("doc_id")
      .agg(max(col("start") + col("chunk_len")).as("covered"),
        max(col("ci")).as("last_ci"), count(lit(1)).as("n_chunks"),
        max(col("start")).as("last_start"))
      .collect()
    val docs = graft.Tables.documents(spark, d)
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ch.nonEmpty && ch.length == docs.size)
    for (r <- ch) {
      val id = r.getAs[Long]("doc_id"); val n = docs(id)
      assert(r.getAs[Long]("covered") == n,
        s"doc $id: chunks cover ${r.getAs[Long]("covered")} of $n tokens")
      assert(r.getAs[Long]("n_chunks") == r.getAs[Long]("last_ci") + 1)
      assert(r.getAs[Long]("last_start") == r.getAs[Long]("last_ci") * 24)
      assert(r.getAs[Long]("last_start") < n, s"doc $id: empty final chunk")
    }
  }

  test("pipeline_rag funnel is monotone and every keeper routes into the index") {
    val st = graft.ops.Ann.pipelineRag.fn(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st.keySet == Set("a_chunks", "b_unique", "c_keepers", "d_routed", "e_buckets"))
    assert(st("a_chunks") >= st("b_unique"), "dedup cannot add chunks")
    assert(st("b_unique") >= st("c_keepers"), "keepers are per unique chunk")
    assert(st("c_keepers") == st("d_routed"),
      "every keeper doc must land in the serving index (doc ≡ vec universe)")
    assert(st("d_routed") >= st("e_buckets"), "buckets cannot exceed routed docs")
    assert(st("e_buckets") >= 1)
  }

  test("chunkRel boundary arithmetic: window-exact, one-past, stride-exact and empty docs") {
    import spark.implicits._
    def doc(id: Long, n: Int) =
      (id, (1 to n).map(i => s"t$i").mkString(" "))
    // n=32 → 1 chunk; n=33 → 2 (second covers 25..33); n=56 → 2 (24..56
    // exactly fills the window); n=57 → 3; n=1 → 1; empty text → split
    // gives [""] (n=1) → 1 chunk of the empty token
    val docs = Seq(doc(1, 32), doc(2, 33), doc(3, 56), doc(4, 57),
      doc(5, 1), (6L, "")).toDF("doc_id", "text")
    val ch = graft.ops.Retrieval.chunkRel(docs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nc"),
        max(col("start") + col("chunk_len")).as("covered"),
        min(col("chunk_len")).as("minlen"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("nc"), r.getAs[Long]("covered"), r.getAs[Long]("minlen"))).toMap
    assert(ch(1L) == (1L, 32L, 32L))
    assert(ch(2L) == (2L, 33L, 9L))   // 2nd chunk = tokens 25..33
    assert(ch(3L) == (2L, 56L, 32L))  // 2nd chunk exactly fills the window
    assert(ch(4L) == (3L, 57L, 9L))   // 3rd chunk = tokens 49..57
    assert(ch(5L) == (1L, 1L, 1L))
    assert(ch(6L) == (1L, 1L, 1L))    // split("") = [""] — one empty token
  }

  test("bm25Raw: term-absent docs drop out; tf raises and doc length lowers the score") {
    import spark.implicits._
    val docs = Seq(
      (1L, "vector alpha beta gamma"),                 // tf=1, dl=4
      (2L, "vector vector alpha beta"),                // tf=2, same dl → higher
      (3L, "vector alpha beta gamma delta eps zeta"),  // tf=1, dl=7 → lower than 1
      (4L, "alpha beta gamma")                         // no query term → absent
    ).toDF("doc_id", "text")
    // bm25Raw reads the documents table: stage the planted docs as a
    // dataset dir the Tables reader accepts
    val dir = graft.ops.QueryDef.tmpRoot("edge_bm25", "planted")
    docs.write.mode("overwrite").parquet(dir + "/documents.parquet")
    val got = graft.ops.Retrieval.bm25Raw(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("bm25_raw")).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "term-absent doc must not appear")
    assert(got(2L) > got(1L), "higher tf at equal length must score higher")
    assert(got(1L) > got(3L), "longer doc at equal tf must score lower")
    assert(got.values.forall(_ > 0.0), "Lucene positive idf keeps scores > 0")
  }

  test("sim_hybrid_rrf rows come from a source list and the fused score matches the ranks") {
    val rows = Retrieval.simHybridRrf.fn(spark, d).collect()
    assert(rows.length == 20)
    for (r <- rows) {
      val lr = Option(r.getAs[java.lang.Long]("lr")).map(_.toLong)
      val vr = Option(r.getAs[java.lang.Long]("vr")).map(_.toLong)
      assert(lr.nonEmpty || vr.nonEmpty, "fused row in neither list")
      assert(lr.forall(x => x >= 1 && x <= 50) && vr.forall(x => x >= 1 && x <= 50))
      val expect = lr.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        vr.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-6)
    }
    // both retrievers actually contribute to the fused top-20
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("lr"))),
      "lexical list contributes no fused row")
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("vr"))),
      "vector list contributes no fused row")
  }
}
