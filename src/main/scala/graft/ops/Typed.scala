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

  /** NEAREST-CENTROID probe — the cheapest supervised read on embedding
    * quality (the linear-probe stand-in every embedding eval starts
    * with): per-label centroids, every vector assigned to its nearest
    * centroid, and the k×k CONFUSION MATRIX gated. A representation
    * that separates classes puts the diagonal high; a collapsed or
    * shuffled embedding flattens it — and unlike `sim_embedding_drift`
    * (same-label geometry over time) this gates CROSS-label geometry.
    *
    * Determinism: centroids carry ulp-level association noise (the
    * udaf_centroid precedent), so they are QUANTIZED to 4dp per
    * dimension before any distance forms — from there every distance is
    * the same sequential fold over identical operands in both engines,
    * and the argmin (ties by label ASC via the row_number total order)
    * is exact. Scale: one combinable centroid aggregate, k centroids
    * broadcast against the corpus (k·d doubles — the classic
    * MLlib-style assign step), one vec-keyed rank, one k×k rollup. */
  val simNearestCentroid = QueryDef(
    "sim_nearest_centroid",
    """WITH dims AS (
      |  SELECT label,
      |         generate_subscripts(embedding, 1) AS dim,
      |         CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM embeddings
      |), cd AS (
      |  SELECT label, dim, round(sum(v) / count(*), 4) AS c
      |  FROM dims GROUP BY label, dim
      |), cent AS (
      |  SELECT label AS clabel, list(c ORDER BY dim) AS cv FROM cd GROUP BY label
      |), v AS (
      |  SELECT vec_id, label,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      |  FROM embeddings
      |), dist AS (
      |  SELECT v.vec_id, v.label, cent.clabel,
      |    list_dot_product(list_transform(range(1, 65), k -> v.ve[k] - cent.cv[k]),
      |                     list_transform(range(1, 65), k -> v.ve[k] - cent.cv[k])) AS d2
      |  FROM v, cent
      |), ranked AS (
      |  SELECT vec_id, label, clabel,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
      |  FROM dist
      |)
      |SELECT label, clabel AS pred_label, CAST(count(*) AS BIGINT) AS n_vecs
      |FROM ranked WHERE rn = 1
      |GROUP BY label, pred_label ORDER BY label, pred_label""".stripMargin) { (s, d) =>
    nearestCentroidConfusion(Tables.embeddings(s, d))
  }

  /** The confusion-matrix kernel over a (vec_id, label, embedding)
    * relation — split out so EdgeSpec can pin a separable planted
    * clustering to a perfect diagonal. */
  def nearestCentroidConfusion(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroid = udaf(CentroidAgg)
    val cent = emb
      .groupBy(col("label").as("clabel"))
      .agg(centroid(Similarity.vecD(col("embedding"))).as("craw"))
      .select(col("clabel"), transform(col("craw"), x => round(x, 4)).as("cv"))
    val v = emb
      .select(col("vec_id"), col("label"), Similarity.vecD(col("embedding")).as("ve"))
    val dist = v.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"), col("clabel"),
        Similarity.dot(zip_with(col("ve"), col("cv"), _ - _),
          zip_with(col("ve"), col("cv"), _ - _)).as("d2"))
    dist.withColumn("rn",
        row_number().over(Window.partitionBy("vec_id").orderBy(col("d2"), col("clabel"))))
      .filter(col("rn") === 1)
      .groupBy(col("label"), col("clabel").as("pred_label"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy("label", "pred_label")
  }

  val all: Seq[QueryDef] = Seq(udafCentroid, simEmbeddingDrift, simNearestCentroid)
}
