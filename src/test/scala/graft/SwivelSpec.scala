package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.swivel.SwivelPrep

/** Hand-computed goldens for the Swivel prep pipeline (SURVEY §5.2-3). */
class SwivelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("tokenize: 1-based positions, whitespace split") {
    val got = SwivelPrep.tokenize(docs("a b a")).orderBy("pos")
      .as[(Long, Long, String)].collect()
    assert(got.toSeq == Seq((0L, 1L, "a"), (0L, 2L, "b"), (0L, 3L, "a")))
  }

  test("cooc golden: 'a b a', window 2 — 1/d weights, symmetric, self-pair doubled") {
    val d = docs("a b a")
    val vocab = SwivelPrep.buildVocab(d, minCount = 1, shardSize = 1)
    // counts: a=2, b=1 → ids a=0, b=1
    assert(vocab.orderBy("id").as[(Long, String, Long)].collect().toSeq ==
      Seq((0L, "a", 2L), (1L, "b", 1L)))
    val cells = SwivelPrep.cooc(d, vocab, windowSize = 2)
      .orderBy("row_id", "col_id").as[(Long, Long, Double)].collect().toSeq
    // pairs: (a@1,b@2,d=1), (a@1,a@3,d=2), (b@2,a@3,d=1); both orientations:
    // C[a][a] = 1/2 + 1/2 = 1.0 ; C[a][b] = C[b][a] = 1/1 + 1/1 = 2.0
    assert(cells == Seq((0L, 0L, 1.0), (0L, 1L, 2.0), (1L, 0L, 2.0)))
    val marg = SwivelPrep.marginals(d, vocab, windowSize = 2)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    // row sums: a: 1.0 + 2.0 = 3.0 ; b: 2.0
    assert(marg == Seq((0L, 3.0), (1L, 2.0)))
  }

  test("vocab: count ties break token-ASC; truncation to shard_size multiple") {
    // a,b,c count 3; d count 2; minCount=2 keeps all 4; shardSize=3 → keep 3
    val d = docs("a b c d", "b c a d", "c a b")
    val v = SwivelPrep.buildVocab(d, minCount = 2, shardSize = 3)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(v == Seq((0L, "a", 3L), (1L, "b", 3L), (2L, "c", 3L)))
  }

  test("vocab: min_count filter drops rare tokens before ranking") {
    val d = docs("x x y")
    val v = SwivelPrep.buildVocab(d, minCount = 2, shardSize = 1)
      .as[(Long, String, Long)].collect().toSeq
    assert(v == Seq((0L, "x", 2L)))
  }

  test("cooc: out-of-vocab tokens drop but positions keep original distances") {
    // 'a z b': z is OOV (minCount=2 with one z)… use explicit truncation:
    // vocab {a,b} via minCount=2; pair (a@1, b@3) has d=2, not 1.
    val d = docs("a z b", "a b z a b")
    val vocab = SwivelPrep.buildVocab(d, minCount = 2, shardSize = 2)
    assert(vocab.select("token").as[String].collect().toSet == Set("a", "b"))
    val pairs = SwivelPrep.coocPairs(docs("a z b"), vocab, windowSize = 2)
      .as[(Long, Long, Int)].collect().toSeq
    // only (a,b,d=2) + mirror — distance measured on original positions
    assert(pairs.toSet == Set((0L, 1L, 2), (1L, 0L, 2)))
  }

  test("coocSalted produces exactly the cells of cooc (skew path is lossless)") {
    val d = docs("a b a c a b", "b c a a", "a a a a a a")
    val vocab = SwivelPrep.buildVocab(d, minCount = 1, shardSize = 1)
    val plain = SwivelPrep.cooc(d, vocab, 3)
      .orderBy("row_id", "col_id").as[(Long, Long, Double)].collect().toSeq
    val salted = SwivelPrep.coocSalted(d, vocab, 3, saltBuckets = 4)
      .orderBy("row_id", "col_id").as[(Long, Long, Double)].collect().toSeq
    assert(salted == plain)
  }

  test("shard: id % num_shards assignment, dense locals") {
    val d = docs("a a b b c c d d", "a b c d")
    val vocab = SwivelPrep.buildVocab(d, minCount = 1, shardSize = 2)
    assert(vocab.count() == 4) // → num_shards = 2
    val cells = SwivelPrep.cooc(d, vocab, 2)
    val sh = SwivelPrep.shard(cells, vocab, shardSize = 2)
    val bad = sh.filter(
      org.apache.spark.sql.functions.expr(
        "row_shard <> global_row % 2 OR local_row <> global_row div 2 OR " +
        "col_shard <> global_col % 2 OR local_col <> global_col div 2"))
    assert(bad.count() == 0)
  }
}
