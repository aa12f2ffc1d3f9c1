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

  /** Embedding-space DRIFT monitoring — the model-observability twin of
    * `quality_drift` (that key watches a SCALAR distribution; this
    * watches the geometry of an embedding column): per label, the L2
    * distance between the centroids of two deterministic halves of the
    * corpus (vec_id parity — the stand-in for the before/after split a
    * production monitor takes over ingest time). A representation
    * regression — re-embedded corpus, collapsed cluster, label leakage —
    * moves per-label centroids apart and the hashed drift number
    * catches it. Same machinery and determinism discipline as
    * udaf_centroid: the typed CentroidAgg aggregates each half map-side,
    * the drift is the one irreducibly-double output and rounds at 4dp
    * over ulp-level association noise (the established udaf_centroid
    * precedent). Two combinable aggregates + a 10-row self-join — scan-
    * bound at any corpus. */
  val simEmbeddingDrift = QueryDef(
    "sim_embedding_drift",
    """WITH dims AS (
      |  SELECT label, vec_id % 2 AS half,
      |         generate_subscripts(embedding, 1) AS dim,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), cent AS (
      |  SELECT label, half, dim, sum(v) / count(*) AS c
      |  FROM dims GROUP BY label, half, dim
      |), pair AS (
      |  SELECT a.label, a.dim, a.c AS ca, b.c AS cb
      |  FROM cent a JOIN cent b ON a.label = b.label AND a.dim = b.dim
      |  WHERE a.half = 0 AND b.half = 1
      |)
      |SELECT label, CAST(count(*) AS BIGINT) AS n_dims,
      |       round(sqrt(sum((ca - cb) * (ca - cb))), 4) AS drift_l2
      |FROM pair GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
    val centroid = udaf(CentroidAgg)
    val cents = Tables.embeddings(s, d)
      .withColumn("half", pmod(col("vec_id"), lit(2)))
      .groupBy("label", "half")
      .agg(centroid(Similarity.vecD(col("embedding"))).as("c"))
    cents.filter(col("half") === 0).select(col("label"), col("c").as("ca"))
      .join(cents.filter(col("half") === 1)
          .select(col("label"), col("c").as("cb")), "label")
      .withColumn("diff", zip_with(col("ca"), col("cb"), (x, y) => x - y))
      .select(col("label"), size(col("diff")).cast("long").as("n_dims"),
        round(sqrt(Similarity.dot(col("diff"), col("diff"))), 4).as("drift_l2"))
      .orderBy("label")
  }

  val all: Seq[QueryDef] = Seq(udafCentroid, simEmbeddingDrift)
}
