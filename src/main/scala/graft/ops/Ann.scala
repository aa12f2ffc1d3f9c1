package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate nearest-neighbor search — the scale path beside the exact
  * `sim_search` baseline (NORTH-STAR surface).
  *
  * IVF (inverted-file) layout: pick C coarse centroids, assign every
  * vector to its nearest centroid (one bucket each), and at query time
  * scan only the `nprobe` buckets whose centroids are nearest the query.
  * At 100 TB the assignment is one broadcast join (C centroids) + one
  * shuffle keyed by bucket, and a query touches nprobe/C of the data.
  * Centroid selection here is deterministic (the first C vectors by id —
  * a stand-in for k-means||; the operator contract is unchanged).
  */
object Ann {

  /** (vec_id, ve, nrm, bucket): nearest-centroid assignment by cosine,
    * ties → lowest centroid id. */
  def ivfAssign(emb: DataFrame, centroidIds: Seq[Long]): DataFrame = {
    val v = emb.select(col("vec_id"), Similarity.vecD(col("embedding")).as("ve"))
      .select(col("vec_id"), col("ve"), Similarity.l2norm(col("ve")).as("nrm"))
    val cents = v.filter(col("vec_id").isin(centroidIds: _*))
      .select(col("vec_id").as("cid"), col("ve").as("cve"), col("nrm").as("cnrm"))
    val rn = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cid"))
    v.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("ve"), col("nrm"), col("cid"),
        (Similarity.dot(col("ve"), col("cve")) / (col("nrm") * col("cnrm"))).as("ccos"))
      .withColumn("rn", row_number().over(rn))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("ve"), col("nrm"), col("cid").as("bucket"))
  }

  /** Top-k by cosine for the query vector, scanning only the nprobe
    * buckets nearest the query. */
  def ivfTopK(emb: DataFrame, queryId: Long, centroidIds: Seq[Long],
      nprobe: Int, k: Int): DataFrame = {
    val assigned = ivfAssign(emb, centroidIds)
    val q = assigned.filter(col("vec_id") === queryId)
      .select(col("ve").as("qve"), col("nrm").as("qnrm"))
    // nprobe buckets nearest the query (by centroid cosine, ties → id)
    val probed = assigned.filter(col("vec_id").isin(centroidIds: _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("pbucket"),
        (Similarity.dot(col("qve"), col("ve")) / (col("qnrm") * col("nrm"))).as("pcos"))
      .orderBy(col("pcos").desc, col("pbucket"))
      .limit(nprobe)
      .select("pbucket")
    assigned
      .join(broadcast(probed), col("bucket") === col("pbucket"))
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(Similarity.dot(col("qve"), col("ve")) / (col("qnrm") * col("nrm")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  private val NCentroids = 8
  private val centroidIds: Seq[Long] = (1L to NCentroids.toLong)

  val simAnnIvf = QueryDef(
    "sim_ann_ivf", {
      val cidList = centroidIds.mkString("(", ", ", ")")
      s"""WITH v0 AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
         |  FROM embeddings
         |), v AS (
         |  SELECT vec_id, ve, sqrt(list_dot_product(ve, ve)) AS nrm FROM v0
         |), cents AS (
         |  SELECT vec_id AS cid, ve AS cve, nrm AS cnrm FROM v WHERE vec_id IN $cidList
         |), assigned AS (
         |  SELECT vec_id, ve, nrm, cid AS bucket FROM (
         |    SELECT v.vec_id, v.ve, v.nrm, c.cid,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY list_dot_product(v.ve, c.cve) / (v.nrm * c.cnrm) DESC, c.cid) AS rn
         |    FROM v, cents c
         |  ) WHERE rn = 1
         |), q AS (
         |  SELECT ve AS qve, nrm AS qnrm FROM v WHERE vec_id = 0
         |), probed AS (
         |  SELECT cid AS pbucket FROM cents, q
         |  ORDER BY list_dot_product(qve, cve) / (qnrm * cnrm) DESC, cid
         |  LIMIT 2
         |)
         |SELECT vec_id, round(list_dot_product(qve, ve) / (qnrm * nrm), 4) AS cos
         |FROM assigned JOIN probed ON bucket = pbucket, q
         |WHERE vec_id <> 0
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
    }) { (s, d) =>
    ivfTopK(Tables.embeddings(s, d), queryId = 0L, centroidIds, nprobe = 2, k = 10)
  }

  val all: Seq[QueryDef] = Seq(simAnnIvf)
}
