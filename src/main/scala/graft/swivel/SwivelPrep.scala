package graft.swivel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Swivel embedding-prep pipeline, re-expressed relationally
  * (SURVEY.md §2.6; semantics follow the published Swivel prep algorithm —
  * arXiv:1602.02215 §2 and its prep.py/fastprep companions; the reference
  * repo `src-d/swivel-spark-prep` distributes exactly this computation on
  * Spark).
  *
  * Pipeline: tokenize → frequency-ranked truncated vocab → windowed
  * 1/d-weighted symmetric co-occurrence counts → marginals → fixed-size
  * shard assignment. All stages are DataFrame→DataFrame and composable;
  * the gated queries bind windowSize=10, minCount=5, shardSize=8.
  *
  * Determinism: co-occurrence weights are Σ_d n_d/d — the per-distance
  * counts n_d are exact integers and the ≤windowSize-term division chain
  * is evaluated in a fixed left-to-right order, so the resulting double is
  * identical under ANY partitioning/aggregation order (no double-sum
  * nondeterminism), in Spark and in the DuckDB oracle alike.
  *
  * Scale posture (100 TB corpus): tokenize/pair-generation is embarrassingly
  * parallel per document; the vocab is the only global structure and is
  * bounded by truncation (broadcast-joined, never collected); cooc cells
  * shuffle once on (row_id, col_id); sharding is a pure projection. Hot
  * (Zipfian) tokens skew the cooc shuffle — AQE skew-join handles it, and
  * the groupBy key (row_id, col_id) already spreads a hot row across its
  * column partners.
  */
object SwivelPrep {

  /** (doc_id, pos, token) — whitespace split, 1-based position. */
  def tokenize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("token"))

  /** Frequency-ranked vocabulary: keep count ≥ minCount, rank by
    * (count DESC, token ASC), truncate to the largest multiple of
    * shardSize; ids dense in [0, vocabSize).
    *
    * Ranking is a distributed range-partitioned sort + zipWithIndex — a
    * deliberate RDD drop-down: a global `row_number()` window would pull
    * every surviving token into ONE partition, which dies at 100 TB corpus
    * scale (10⁷–10⁸ distinct tokens pre-truncation), while zipWithIndex
    * assigns the identical dense ranks from per-partition offsets. Output
    * ids are byte-identical to the window formulation ((count DESC,
    * token ASC) is a total order).
    */
  /** Unsigned lexicographic byte order — the order Spark SQL's UTF8String
    * and DuckDB's VARCHAR comparisons both use. JVM String.compareTo
    * (UTF-16 code units) diverges from it for supplementary-plane text
    * (emoji sort before U+E000–U+FFFF in UTF-16 but after in UTF-8), so
    * the rank tie-break must compare UTF-8 bytes to match the oracle. */
  private implicit val utf8Ord: Ordering[Array[Byte]] = (a, b) => {
    var i = 0
    var res = 0
    val n = math.min(a.length, b.length)
    while (res == 0 && i < n) {
      res = (a(i) & 0xff) - (b(i) & 0xff)
      i += 1
    }
    if (res != 0) res else a.length - b.length
  }

  def buildVocab(docs: DataFrame, minCount: Int, shardSize: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // The token-count relation has three consumers (the truncation count,
    // the sortBy sample pass, the sort shuffle): persist it so the corpus
    // is tokenized exactly ONCE — at 100 TB each extra evaluation is a
    // full corpus scan. The returned vocab is materialized with an eager
    // localCheckpoint (bounded by truncation — the same structure the
    // reference writes out as a vocab file), so the counts cache can be
    // released before returning: no unbounded storage blocks outlive the
    // call, and the caller's DataFrame never re-executes the corpus scan.
    val counts = tokenize(docs).groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .persist()
    try {
      val total = counts.count()
      val keep = (total / shardSize) * shardSize
      counts.select(col("token"), col("cnt")).as[(String, Long)].rdd
        .sortBy({ case (t, c) =>
          (-c, t.getBytes(java.nio.charset.StandardCharsets.UTF_8)) })
        .zipWithIndex()
        .collect { case ((t, c), i) if i < keep => (i, t, c) }
        .toDF("id", "token", "cnt")
        .localCheckpoint()
    } finally counts.unpersist(blocking = false)
  }

  /** Ordered in-window pairs with distance: for every in-vocab token pair
    * in the same document with 0 < d = pos_b − pos_a ≤ windowSize, BOTH
    * orientations (the matrix is symmetric; a self-pair (t,t,d) therefore
    * contributes twice to cell (t,t)).
    * Output: (row_id, col_id, dd).
    */
  def coocPairs(docs: DataFrame, vocab: DataFrame, windowSize: Int): DataFrame = {
    // Out-of-vocab tokens drop at this broadcast join, BEFORE pair
    // generation — order matters for semantics (distances are measured on
    // original positions, but pairs only form between in-vocab tokens).
    val t = tokenize(docs)
      .join(broadcast(vocab.select("token", "id")), "token")
      .select(col("doc_id"), col("pos"), col("id"))
    val pairs = t.as("a").join(t.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
        col("b.pos") > col("a.pos") &&
        col("b.pos") <= col("a.pos") + windowSize)
      .select(col("a.id").as("x"), col("b.id").as("y"),
        (col("b.pos") - col("a.pos")).cast("int").as("dd"))
    pairs.select(col("x").as("row_id"), col("y").as("col_id"), col("dd"))
      .union(pairs.select(col("y").as("row_id"), col("x").as("col_id"), col("dd")))
  }

  /** Fixed-order Σ_d n_d/d over the conditional per-distance counts —
    * see the determinism note in the object scaladoc. */
  private def weightExpr(windowSize: Int): Column =
    (1 to windowSize).map(k => sum(when(col("dd") === k, 1L).otherwise(0L)) / lit(k.toDouble))
      .reduceLeft(_ + _)

  /** Co-occurrence cells: (row_id, col_id, weight) with weight = Σ 1/d
    * over all in-window co-occurrences, rounded 4dp at the boundary. */
  def cooc(docs: DataFrame, vocab: DataFrame, windowSize: Int): DataFrame =
    coocPairs(docs, vocab, windowSize)
      .groupBy("row_id", "col_id")
      .agg(round(weightExpr(windowSize), 4).as("weight"))

  /** Skew-hardened variant: Zipfian corpora make the hot tokens' cells
    * (e.g. (the,the)) receive a large share of all pairs, so a single
    * reducer per hot cell can bottleneck even with AQE skew handling.
    * Two-level aggregation: salt the groupBy key with a per-row bucket,
    * partially count per (cell, salt), then merge the integer n_d counts —
    * exact integer sums, so the final fixed-order weight is bit-identical
    * to `cooc`. Salting costs one extra (tiny, cell-level) shuffle; use
    * when the corpus is known to be heavily skewed.
    */
  def coocSalted(docs: DataFrame, vocab: DataFrame, windowSize: Int,
      saltBuckets: Int = 64): DataFrame = {
    val partials = coocPairs(docs, vocab, windowSize)
      .withColumn("salt", pmod(hash(col("row_id"), col("col_id"), monotonically_increasing_id()), lit(saltBuckets)))
      .groupBy("row_id", "col_id", "salt")
      .agg((1 to windowSize).map(k =>
        sum(when(col("dd") === k, 1L).otherwise(0L)).as(s"n$k")).head,
        (2 to windowSize).map(k =>
          sum(when(col("dd") === k, 1L).otherwise(0L)).as(s"n$k")): _*)
    val merged = partials.groupBy("row_id", "col_id")
      .agg((1 to windowSize).map(k => sum(col(s"n$k")).as(s"n$k")).head,
        (2 to windowSize).map(k => sum(col(s"n$k")).as(s"n$k")): _*)
    val w = (1 to windowSize).map(k => col(s"n$k") / lit(k.toDouble)).reduceLeft(_ + _)
    merged.select(col("row_id"), col("col_id"), round(w, 4).as("weight"))
  }

  /** Positive-PMI report over the co-occurrence matrix — the quantity
    * Swivel's training objective approximates, surfaced as a gated
    * relation with EVERY step exact: the Σ n_d/d cell weight is rescaled
    * by LCM(1..windowSize) into an exact integer (n_d · (L/d) term sums
    * — no double ever forms), marginals and the matrix total are integer
    * sums of those, and the PMI ratio x_ij·T / (x_i·x_j) is carried in
    * micro-units through a DECIMAL(38,0) product with an integral `div`
    * (the 128-bit-safe path: x_ij·T·10⁶ overflows BIGINT on hub cells).
    * log() never runs — monotone in the ratio, so ranking by ratio IS
    * ranking by PMI and the emitted integer is engine-identical.
    *
    * Scale: one pair-level groupBy (the cooc shuffle), a vocab-bounded
    * marginal groupBy, a 1-row total broadcast, two vocab-bounded
    * marginal joins onto the cell relation, top-k per-partition heaps. */
  def pmiCells(docs: DataFrame, vocab: DataFrame, windowSize: Int,
      minScaled: Long, topK: Int): DataFrame = {
    val lcm = (1 to windowSize).foldLeft(1L)((a, k) =>
      a * k / BigInt(a).gcd(BigInt(k)).toLong)
    val scaled = (1 to windowSize).map(k =>
      sum(when(col("dd") === k, lit(lcm / k)).otherwise(0L)))
      .reduceLeft(_ + _)
    val cells = coocPairs(docs, vocab, windowSize)
      .groupBy("row_id", "col_id").agg(scaled.as("sw"))
    val marg = cells.groupBy("row_id").agg(sum(col("sw")).as("smi"))
    val tot = cells.agg(sum(col("sw")).as("st"))
    cells
      .join(marg, "row_id")
      .join(marg.select(col("row_id").as("col_id"), col("smi").as("smj")),
        "col_id")
      .crossJoin(broadcast(tot))
      .filter(col("sw") >= minScaled)
      .select(col("row_id"), col("col_id"), col("sw"),
        expr("CAST(sw AS DECIMAL(38,0)) * CAST(st AS DECIMAL(38,0)) * 1000000" +
          " div (CAST(smi AS DECIMAL(38,0)) * CAST(smj AS DECIMAL(38,0)))")
          .as("ratio_ppm"))
      .orderBy(col("ratio_ppm").desc, col("row_id"), col("col_id"))
      .limit(topK)
  }

  /** Row sums of the (symmetric) co-occurrence matrix per token id —
    * computed from the pair relation with the same fixed-order weight
    * expression, so marginals sum the UNROUNDED cell weights. */
  def marginals(docs: DataFrame, vocab: DataFrame, windowSize: Int): DataFrame =
    coocPairs(docs, vocab, windowSize)
      .groupBy(col("row_id").as("id"))
      .agg(round(weightExpr(windowSize), 4).as("marginal"))

  /** Shard assignment: row_shard = id % numShards, local index
    * id / numShards, with numShards = vocabSize / shardSize (vocabSize is
    * a multiple of shardSize by construction). The 1-row numShards scalar
    * broadcasts. */
  def shard(coocCells: DataFrame, vocab: DataFrame, shardSize: Int): DataFrame = {
    val ns = vocab.agg((count(lit(1)) / shardSize).cast("long").as("num_shards"))
    coocCells.crossJoin(broadcast(ns))
      .select(
        (col("row_id") % col("num_shards")).as("row_shard"),
        (col("col_id") % col("num_shards")).as("col_shard"),
        expr("row_id div num_shards").as("local_row"),
        expr("col_id div num_shards").as("local_col"),
        col("row_id").as("global_row"),
        col("col_id").as("global_col"),
        col("weight"))
  }
}
