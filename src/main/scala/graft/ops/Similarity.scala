package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Embedding-similarity operators (NORTH-STAR surface).
  *
  * Dot products are sequential left folds over `zip_with` — the same
  * association order DuckDB's `list_dot_product` uses, so cosine values
  * are bit-comparable; the emitted value is additionally rounded to 4dp
  * and every ORDER BY ties-breaks on ids.
  *
  * Scale path: the brute-force pairwise forms below are the exact
  * baseline (N² pairs, top-k via TakeOrderedAndProject — never a global
  * sort). For 100 TB-scale ANN, `Ann.ivfTopK` buckets vectors by nearest
  * coarse centroid and searches only the probed buckets.
  */
object Similarity {

  /** float[] → double[] (exact cast; DuckDB lists compute in double). */
  def vecD(c: Column): Column = transform(c, _.cast("double"))

  /** Sequential dot product — a native codegen Expression
    * (graft.functions.DotProduct): the same left-to-right double
    * accumulation as `aggregate(zip_with(...))` and DuckDB's
    * list_dot_product (bit-identical results), minus the per-element
    * lambda interpretation that dominated the N² kNN pipelines.
    */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct.dot(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** vec_id, ve (double[]), nrm — shared prep. */
  private def vecs(s: SparkSession, d: String): DataFrame = {
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), vecD(col("embedding")).as("ve"))
    v.select(col("vec_id"), col("label"), col("ve"), l2norm(col("ve")).as("nrm"))
  }

  private val vecCte =
    """WITH v AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      |  FROM embeddings
      |), n AS (
      |  SELECT vec_id, label, ve, sqrt(list_dot_product(ve, ve)) AS nrm FROM v
      |)""".stripMargin

  val simKnn = QueryDef(
    "sim_knn",
    s"""$vecCte
       |SELECT a.vec_id AS i, b.vec_id AS j,
       |       round(list_dot_product(a.ve, b.ve) / (a.nrm * b.nrm), 4) AS cos
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |ORDER BY cos DESC, i, j LIMIT 20""".stripMargin) { (s, d) =>
    val n = vecs(s, d)
    n.as("a").join(n.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        round(dot(col("a.ve"), col("b.ve")) / (col("a.nrm") * col("b.nrm")), 4).as("cos"))
      .orderBy(col("cos").desc, col("i"), col("j"))
      .limit(20)
  }

  val simSearch = QueryDef(
    "sim_search",
    s"""$vecCte
       |SELECT b.vec_id,
       |       round(list_dot_product(a.ve, b.ve) / (a.nrm * b.nrm), 4) AS cos
       |FROM n a JOIN n b ON a.vec_id = 0 AND b.vec_id <> 0
       |ORDER BY cos DESC, b.vec_id LIMIT 10""".stripMargin) { (s, d) =>
    // k-NN search for one query vector: the 1-row query side broadcasts;
    // the scan side streams — the exact shape that scales out.
    val n = vecs(s, d)
    val q = n.filter(col("vec_id") === 0)
      .select(col("ve").as("qve"), col("nrm").as("qnrm"))
    n.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("qve"), col("ve")) / (col("qnrm") * col("nrm")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  val multimodalJoin = QueryDef(
    "multimodal_join",
    s"""$vecCte
       |SELECT doc_id, lang, n_chars, label, round(nrm, 4) AS l2_norm
       |FROM documents JOIN n ON doc_id = vec_id
       |ORDER BY doc_id LIMIT 100""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .join(vecs(s, d), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("label"),
        round(col("nrm"), 4).as("l2_norm"))
      .orderBy("doc_id")
      .limit(100)
  }

  val all: Seq[QueryDef] = Seq(simKnn, simSearch, multimodalJoin)
}
