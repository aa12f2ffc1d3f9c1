package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CentroidAgg

/** Typed-aggregation surface: udaf_centroid (SURVEY.md §2.7/§2.8). */
object Typed {

  val udafCentroid = QueryDef(
    "udaf_centroid",
    """WITH dims AS (
      |  SELECT label,
      |         generate_subscripts(embedding, 1) AS dim,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), cent AS (
      |  SELECT label, dim, sum(v) / count(*) AS c FROM dims GROUP BY label, dim
      |)
      |SELECT label, round(sqrt(sum(c * c)), 4) AS centroid_l2
      |FROM cent GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
    // Custom typed Aggregator via udaf() — element-wise mean per label,
    // then the L2 norm of the centroid. Double-sum association differs
    // between engines by design; the 4dp round absorbs the ulp-level
    // noise (inputs are 64 floats per row — error ≪ 1e-10).
    val centroid = udaf(CentroidAgg)
    Tables.embeddings(s, d)
      .groupBy("label")
      .agg(centroid(Similarity.vecD(col("embedding"))).as("centroid"))
      .select(col("label"),
        round(sqrt(Similarity.dot(col("centroid"), col("centroid"))), 4).as("centroid_l2"))
      .orderBy("label")
  }

  val all: Seq[QueryDef] = Seq(udafCentroid)
}
