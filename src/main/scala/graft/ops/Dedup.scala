package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scale-path deduplication operators (NORTH-STAR surface): MinHash-LSH
  * banding, SimHash fingerprint grouping, and embedding-cosine near-dup.
  * `dedup_exact` / `dedup_near` (shingle Jaccard) live in Text.scala.
  */
object Dedup {

  /** Per-document MinHash signature over the distinct-shingle set, via the
    * one-pass TypedImperativeAggregate sketch (graft.functions.MinHashAgg):
    * each shingle hashes once (xxhash64) and the k lane-minima accumulate
    * in a single k-long buffer with map-side partial merge — at 100 TB the
    * doc_id shuffle carries k·8 bytes per document, not the shingle set.
    * Output: (doc_id, sig array<long>).
    */
  def minHashSignatures(sh: DataFrame, k: Int): DataFrame =
    sh.groupBy("doc_id")
      .agg(graft.functions.MinHashAgg.sketch(xxhash64(col("shingle")), k).as("sig"))

  /** LSH candidate pairs with k single-hash bands (r=1): documents sharing
    * ANY of the k minhashes become candidates. Recall for a pair with
    * Jaccard j is 1-(1-j)^k — at j=0.5, k=16: 0.99998; at j=1 it is exact.
    * The shuffle is keyed by (band, hash): bounded bucket joins, never a
    * cartesian — this is the 100 TB replacement for the all-pairs shingle
    * join in `dedup_near`.
    */
  def minHashCandidates(sh: DataFrame, k: Int = 16): DataFrame = {
    val sig = minHashSignatures(sh, k)
    val bands = sig.select(col("doc_id"),
      posexplode(col("sig")).as(Seq("band", "h")))
    bands.as("x").join(bands.as("y"), Seq("band", "h"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct()
  }

  /** MinHash-LSH near-dup: LSH candidates, then the exact-Jaccard filter —
    * same output contract as `dedup_near`, different (scalable) candidate
    * generator. The oracle is the exact all-pairs computation; the LSH
    * path must (and empirically does, at every SF) reach full recall at
    * the 0.5 threshold.
    */
  def minHashNearDup(docs: DataFrame, k: Int = 16, threshold: Double = 0.5): DataFrame =
    minHashNearDupFromShingles(Functions.shingles(docs), k, threshold)

  /** The LSH near-dup kernel over an already-computed (doc_id, shingle)
    * relation — the `nearDupPairsFromShingles` split, same motivation. */
  def minHashNearDupFromShingles(sh: DataFrame, k: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    // signatures and set sizes come out of ONE doc_id aggregation — the
    // sketch buffer and the count ride the same shuffle
    val sig = sh.groupBy("doc_id")
      .agg(graft.functions.MinHashAgg.sketch(xxhash64(col("shingle")), k).as("sig"),
        count(lit(1)).as("n"))
    val bands = sig.select(col("doc_id"),
      posexplode(col("sig")).as(Seq("band", "h")))
    val cand = bands.as("x").join(bands.as("y"), Seq("band", "h"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct()
    val inter = cand
      .join(sh.as("sx"), col("i") === col("sx.doc_id"))
      .join(sh.as("sy"), col("j") === col("sy.doc_id") && col("sx.shingle") === col("sy.shingle"))
      .groupBy("i", "j").agg(count(lit(1)).as("inter"))
    val sizes = sig.select(col("doc_id"), col("n"))
    inter
      .join(sizes.as("si"), col("i") === col("si.doc_id"))
      .join(sizes.as("sj"), col("j") === col("sj.doc_id"))
      .select(col("i"), col("j"),
        (col("inter") / (col("si.n") + col("sj.n") - col("inter"))).as("jac_raw"))
      .filter(col("jac_raw") >= threshold)
      .select(col("i"), col("j"), round(col("jac_raw"), 4).as("jac"))
  }

  val dedupMinhash = QueryDef(
    "dedup_minhash",
    // AUDIT VIEW: the pair list is quadratic in dup-group width (m
    // copies → C(m,2) rows) and is DNF at 100× on the dup-saturated
    // fixture — the PRIMARY scale contract is the cluster output
    // (`dedup_minhash_clusters`, linear, keeper-first); this key stays
    // as the bounded pair-level audit of the same banding.
    // Oracle = the exact shingle-Jaccard relation (same as dedup_near):
    // the LSH candidate generator is an optimization, not a semantics
    // change, and has ~1 - 0.5^16 recall at the threshold. Accepted gate
    // risk, documented: the whole path is deterministic (xxhash64, no
    // RNG), so on the FIXED gate corpora recall is not probabilistic —
    // equality against the exact oracle is verified at sf0.001/0.01/0.1
    // and cannot regress unless the data itself changes. A just-over-
    // threshold pair on a brand-new corpus could in principle miss all
    // 16 bands (p ≈ 2·10⁻⁵ at j = 0.5); unioning in the exact shingle
    // equi-join would waive even that at the cost of making the LSH
    // path decorative, so the sketch path stays authoritative.
    s"""${Functions.shingleOracleCte},
       |shd AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE shingle IS NOT NULL),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
       |inter AS (
       |  SELECT x.doc_id AS i, y.doc_id AS j, count(*) AS inter
       |  FROM shd x JOIN shd y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
       |  GROUP BY i, j
       |)
       |SELECT i, j, round(jac_raw, 4) AS jac FROM (
       |  SELECT i, j, inter.inter / (si.n + sj.n - inter.inter) AS jac_raw
       |  FROM inter
       |  JOIN sizes si ON inter.i = si.doc_id
       |  JOIN sizes sj ON inter.j = sj.doc_id
       |) WHERE jac_raw >= 0.5
       |ORDER BY i, j""".stripMargin) { (s, d) =>
    minHashNearDup(Tables.documents(s, d)).orderBy("i", "j")
  }

  /** Measured recall of the MinHash-LSH banding against its exact twin
    * — the text-side member of the recall-gate family
    * (`dedup_embed_lsh_recall` covers the embedding side): one row of
    * |exact Jaccard pairs| (`dedup_near`'s relation), |LSH pairs|
    * (`dedup_minhash`'s relation), their overlap, and integer recall
    * percent at the 0.5 threshold. The oracle emits the exact count in
    * all three slots with recall 100 — the measured identity the
    * pairwise dedup_minhash gate proves on these corpora (deterministic
    * xxhash64 banding, 1−0.5^16 per-pair recall at the threshold) — so
    * a band-count or sketch regression that drops ANY pair fails the
    * hash with a readable recall number. Both sides are the existing
    * bounded kernels; the overlap join is pair-bounded. */
  val dedupMinhashRecall = QueryDef(
    "dedup_minhash_recall",
    s"""${Functions.shingleOracleCte},
       |shd AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE shingle IS NOT NULL),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
       |inter AS (
       |  SELECT x.doc_id AS i, y.doc_id AS j, count(*) AS inter
       |  FROM shd x JOIN shd y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
       |  GROUP BY i, j
       |), e AS (
       |  SELECT i, j FROM (
       |    SELECT i, j, inter.inter / (si.n + sj.n - inter.inter) AS jac_raw
       |    FROM inter
       |    JOIN sizes si ON inter.i = si.doc_id
       |    JOIN sizes sj ON inter.j = sj.doc_id
       |  ) WHERE jac_raw >= 0.5
       |), c AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM e)
       |SELECT n_exact, n_exact AS n_lsh, n_exact AS n_overlap,
       |       CAST(100 AS BIGINT) AS recall_pct
       |FROM c""".stripMargin) { (s, d) =>
    recallCollapsedCore(landedReps(s, d), landedRepExactPairs(s, d),
      landedRepLshPairs(s, d))
  }

  /** The content-collapse rule of the keeper-first family, in ONE
    * place: distinct contents by md5, representative = min doc_id,
    * multiplicity m. Both the landed gate path and the inline test
    * forms derive through this, so a change to the collapse (hash or
    * tie-break) cannot silently fork the relation between paths. */
  def repsOf(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("doc_id"), col("text"),
      md5(col("text")).as("h"))
    hashed.groupBy("h")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("m"))
      .join(hashed.select("doc_id", "text"), Seq("doc_id"))
      .select("doc_id", "text", "m")
  }

  /** The content-collapsed base relations of the keeper-first minhash
    * family, LANDED once per (session, dataset) — the co-shingle
    * statistics discipline (Text.landedShingleStats) applied to the
    * collapsed kernels: `dedup_minhash_clusters` and
    * `dedup_minhash_recall` each need (a) the distinct-content
    * representatives with multiplicities, (b) the shingles of those
    * representatives, and (c) the banded-LSH near-dup pairs between
    * them. One landing feeds all consumers; every derivation is
    * deterministic (md5 collapse, xxhash64 banding), so sharing cannot
    * move a hash. `reps` forces OUTSIDE the dependent closures (the
    * Landed.once non-reentrancy contract). */
  private def landedReps(s: SparkSession, d: String): DataFrame =
    graft.ops.Landed.once(s, d, "mhreps")(repsOf(Tables.documents(s, d)))

  private def landedRepShingles(s: SparkSession, d: String): DataFrame = {
    val reps = landedReps(s, d)
    graft.ops.Landed.once(s, d, "mhsh")(
      Functions.shingles(reps.select("doc_id", "text")))
  }

  private def landedRepLshPairs(s: SparkSession, d: String): DataFrame = {
    val sh = landedRepShingles(s, d)
    graft.ops.Landed.once(s, d, "mhlshp")(
      minHashNearDupFromShingles(sh).select("i", "j"))
  }

  /** The exact co-shingle pair relation over representatives — the
    * other half `dedup_minhash_recall` consumes; landed for the same
    * reason as the LSH pairs (it is the key's dominant cost and derives
    * deterministically from the landed shingles). */
  private def landedRepExactPairs(s: SparkSession, d: String): DataFrame = {
    val sh = landedRepShingles(s, d)
    graft.ops.Landed.once(s, d, "mhexp")(
      Text.nearDupPairsFromShingles(sh).select("i", "j"))
  }

  /** The recall report computed KEEPER-FIRST — exactly `dedup_near` vs
    * `dedup_minhash` pair counts over original doc_ids, without ever
    * forming a pair between two copies of the same content (the r9
    * containment remedy applied to the recall study, which would
    * otherwise pay the exact kernel's quadratic-in-copy-count blowup on
    * dup-heavy corpora — measured 17× at 10× data before this collapse).
    * Sound because BOTH kernels are CONTENT-DETERMINED: Jaccard depends
    * only on the shingle sets, and the MinHash banding only on xxhash64
    * of the shingles — so for distinct contents c₁ ≠ c₂ either every
    * (copy-of-c₁, copy-of-c₂) id-pair is found or none (m₁·m₂ pairs,
    * weighted arithmetic), and same-content pairs (J = 1, identical
    * signatures ⇒ every band collides) are found by both kernels
    * whenever the content has ≥ 1 shingle — the C(m,2) term, added to
    * all three counters. Contents under 3 tokens have no shingles in
    * either kernel and contribute nothing, exactly as in the full
    * computation. */
  def minhashRecallCollapsed(docs: DataFrame): DataFrame = {
    // feeds both kernels, the multiplicities and the C(m,2) term; ONE
    // shingle derivation feeds both kernels (each would otherwise
    // explode + distinct the identical relation)
    val reps = repsOf(docs).localCheckpoint()
    val sh = Functions.shingles(reps).localCheckpoint()
    recallCollapsedCore(reps,
      Text.nearDupPairsFromShingles(sh).select("i", "j").localCheckpoint(),
      minHashNearDupFromShingles(sh).select("i", "j").localCheckpoint())
  }

  /** The recall arithmetic over explicit collapsed relations — shared
    * by the inline form above (tests) and the landed-relation gate
    * path (which passes BOTH pair relations pre-landed). */
  private def recallCollapsedCore(reps: DataFrame, er: DataFrame,
      lr: DataFrame): DataFrame = {
    val mult = reps.select("doc_id", "m")
    def weighted(p: DataFrame, name: String): DataFrame =
      p.join(mult.toDF("doc_id", "mi"), col("i") === col("doc_id")).drop("doc_id")
        .join(mult.toDF("doc_id", "mj"), col("j") === col("doc_id")).drop("doc_id")
        .agg(coalesce(sum(col("mi") * col("mj")), lit(0L)).as(name))
    val sTerm = reps
      .filter(size(split(col("text"), " ")) >= 3 && col("m") >= 2)
      .agg(coalesce(sum(expr("(m * (m - 1)) div 2")), lit(0L)).as("s"))
    weighted(er, "ce").crossJoin(weighted(lr, "cl"))
      .crossJoin(weighted(er.join(lr, Seq("i", "j")), "co"))
      .crossJoin(sTerm)
      .select((col("ce") + col("s")).as("n_exact"),
        (col("cl") + col("s")).as("n_lsh"),
        (col("co") + col("s")).as("n_overlap"),
        when(col("ce") + col("s") === 0, lit(100L))
          .otherwise(expr("(100 * (co + s)) div (ce + s)")).as("recall_pct"))
  }

  /** MINHASH CLUSTER OUTPUT — the PRIMARY near-dup contract at scale
    * (the round-12 verdict's promotion): per document in a near-dup
    * cluster, the component keeper (minimum doc_id over the whole
    * connected component of the Jaccard-0.5 graph) and the cluster
    * size. This is what a 100 TB dedup pass actually consumes — a
    * keep/drop decision list, linear in the corpus — where the pair
    * list (`dedup_minhash`) is quadratic in dup-group width (m copies
    * → C(m,2) pairs) and serves as the bounded AUDIT view only.
    *
    * Computed KEEPER-FIRST (the minhashRecallCollapsed collapse, sound
    * for the same content-determinism reason): exact-duplicate contents
    * collapse to one representative (min doc_id, multiplicity m) BEFORE
    * shingling, the MinHash-LSH banding + exact-Jaccard filter runs on
    * distinct contents only, min-label propagation finds the component
    * keeper over representatives, and original ids re-attach through
    * the content map. Copies of a shingled content are mutual near-dups
    * (J = 1) so they join their representative's component; the
    * component minimum over representatives IS the minimum over
    * original ids (each rep is already its content's min). Shingle-less
    * contents (< 3 tokens) have no edges in either engine and never
    * appear — the dedup_minhash node set exactly.
    *
    * At scale: every stage is linear — one content-hash aggregate, LSH
    * banding over DISTINCT contents (the dup-saturation blowup never
    * forms), the bounded component fixpoint, and two content-keyed
    * equi-joins to expand. Measured linear at 10× on the dup-heavy
    * fixture where the pair emitter is DNF at 100×. */
  def minhashClusters(docs: DataFrame): DataFrame = {
    // feeds shingling and the multiplicity expansion
    val reps = repsOf(docs).localCheckpoint()
    val sh = Functions.shingles(reps.select("doc_id", "text"))
      .localCheckpoint()
    minhashClustersCore(docs, reps, sh,
      minHashNearDupFromShingles(sh).select("i", "j"))
  }

  /** The cluster expansion over explicit collapsed relations — shared
    * by the inline form above (tests) and the landed-relation gate
    * path, which reuses the SAME landed (reps, shingles, LSH pairs) as
    * `dedup_minhash_recall`. */
  private def minhashClustersCore(docs: DataFrame, reps: DataFrame,
      sh: DataFrame, pairs: DataFrame): DataFrame = {
    val repComp = Text.nearDupKeepersFromPairs(pairs)
      .select(col("doc_id").as("rep"), col("keeper"))
    // nodes = shingled contents; isolated ones label themselves
    val repLabel = sh.select(col("doc_id").as("rep")).distinct()
      .join(reps.select(col("doc_id").as("rep"), col("m")), Seq("rep"))
      .join(repComp, Seq("rep"), "left")
      .select(col("rep"), col("m"),
        coalesce(col("keeper"), col("rep")).as("keeper"))
    val csize = repLabel.groupBy("keeper")
      .agg(sum(col("m")).as("cluster_size"))
    val clustered = repLabel.join(csize, Seq("keeper"))
      .filter(col("cluster_size") >= 2)
      .select(col("rep"), col("keeper"), col("cluster_size"))
    // the doc -> representative map re-derives from the content hash
    // (identical md5 on both sides — no corpus-sized relation is landed)
    docs.select(col("doc_id"), md5(col("text")).as("h"))
      .join(reps.select(col("doc_id").as("rep"), md5(col("text")).as("h")),
        Seq("h"))
      .select(col("doc_id"), col("rep"))
      .join(clustered, Seq("rep"))
      .select(col("doc_id"), col("keeper"), col("cluster_size"))
  }

  val dedupMinhashClusters = QueryDef(
    "dedup_minhash_clusters",
    // Oracle: exact Jaccard-0.5 pairs over ORIGINAL ids (same-content
    // docs share all shingles, so copies are pairwise connected), the
    // recursive-CTE component minimum, and per-component size. Every
    // node of the pair graph sits in a ≥2-doc cluster and vice versa,
    // so no explicit size filter is needed here; the Spark side filters
    // cluster_size >= 2 only to drop isolated singleton contents.
    s"""${Functions.shingleOracleCte},
       |shd AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE shingle IS NOT NULL),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
       |inter AS (
       |  SELECT x.doc_id AS i, y.doc_id AS j, count(*) AS inter
       |  FROM shd x JOIN shd y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
       |  GROUP BY i, j
       |),
       |pairs AS (
       |  SELECT i, j FROM (
       |    SELECT i, j, inter.inter / (si.n + sj.n - inter.inter) AS jac_raw
       |    FROM inter
       |    JOIN sizes si ON inter.i = si.doc_id
       |    JOIN sizes sj ON inter.j = sj.doc_id
       |  ) WHERE jac_raw >= 0.5
       |),
       |edges AS (
       |  SELECT i AS src, j AS dst FROM pairs
       |  UNION ALL
       |  SELECT j AS src, i AS dst FROM pairs
       |),
       |reach AS (
       |  WITH RECURSIVE r(doc_id, m) AS (
       |    SELECT src, src FROM edges
       |    UNION
       |    SELECT e.src, r.m FROM edges e JOIN r ON e.dst = r.doc_id
       |  )
       |  SELECT doc_id, min(m) AS keeper FROM r GROUP BY doc_id
       |),
       |csize AS (
       |  SELECT keeper, CAST(count(*) AS BIGINT) AS cluster_size
       |  FROM reach GROUP BY keeper
       |)
       |SELECT reach.doc_id, reach.keeper, csize.cluster_size
       |FROM reach JOIN csize USING (keeper)
       |ORDER BY reach.doc_id""".stripMargin) { (s, d) =>
    minhashClustersCore(Tables.documents(s, d), landedReps(s, d),
      landedRepShingles(s, d), landedRepLshPairs(s, d))
      .orderBy("doc_id")
  }

  /** 64-bit SimHash over the token multiset: bit b of the fingerprint is
    * set iff Σ_tokens (±1 by bit b of the token hash) > 0. One explode +
    * one combinable groupBy — linear cost, and near-identical documents
    * land on identical (or hamming-close) fingerprints.
    *
    * The token hash is the first 16 hex chars of md5(token), split into
    * two 32-bit halves (hi = chars 1-8, lo = chars 9-16; bit b of the
    * 64-bit hash is bit b of lo for b < 32, bit b-32 of hi above). md5 is
    * bit-identical in DuckDB (`dedup_exact` already relies on it), which
    * makes the whole SimHash relation oracle-checkable — xxhash64, the
    * previous hash, had no DuckDB analog and left these keys gated by
    * specs alone.
    */
  def simHash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
      .withColumn("m", md5(col("token")))
      .withColumn("thi", conv(substring(col("m"), 1, 8), 16, 10).cast("long"))
      .withColumn("tlo", conv(substring(col("m"), 9, 8), 16, 10).cast("long"))
      .groupBy("doc_id")
      .agg(graft.functions.SimHashAgg.simhash(col("thi"), col("tlo")).as("simhash"))

  /** DuckDB CTE computing the identical (doc_id, simhash) relation —
    * shared by the dedup_simhash and dedup_simhash_near oracles. */
  private val simHashOracleCte: String = {
    val bitSums = (0 until 64).map { b =>
      val (src, sh) = if (b < 32) ("tlo", b) else ("thi", b - 32)
      s"sum(CASE WHEN ($src >> $sh) & 1 = 1 THEN 1 ELSE -1 END) AS b$b"
    }.mkString(",\n|    ")
    val fpTerms = (0 until 64).map { b =>
      val w = if (b == 63) "CAST(-9223372036854775808 AS BIGINT)"
              else s"CAST(${1L << b} AS BIGINT)"
      s"(CASE WHEN b$b > 0 THEN $w ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" +\n|    ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
       |), th AS (
       |  SELECT doc_id,
       |    CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) AS thi,
       |    CAST('0x' || substr(md5(token), 9, 8) AS BIGINT) AS tlo
       |  FROM toks
       |), bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM th GROUP BY doc_id
       |), fp AS (
       |  SELECT doc_id,
       |    $fpTerms AS simhash
       |  FROM bits
       |)""".stripMargin
  }

  /** Hamming-band LSH over the 64-bit SimHash: split the fingerprint into
    * four 16-bit bands — a pair at hamming distance ≤ 3 differs in at most
    * 3 bands, so it AGREES on at least one (pigeonhole): recall is exactly
    * 1 at the ≤3 threshold, no probabilistic miss. Candidates share a
    * (band, value) bucket — the shuffle is keyed by band value, bounded
    * bucket joins, never all-pairs — then the exact hamming refilter
    * (bit_count(x ^ y)) drops false candidates. This is what makes
    * SimHash a real near-dup operator instead of an exact-match hash.
    */
  def simHashNearDup(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = simHash(docs)
    val bands = fp.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("bval"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.bval").as("bval"))
    // hamming is computed BEFORE the pair dedup and the fingerprints are
    // dropped immediately, so the one wide shuffle (the band join) is the
    // only time the 64-bit fingerprints move; the candidate dedup is a
    // narrow (i, j) aggregation (hamming is functionally determined by the
    // pair — min() just picks the one value) with the cheap exact filter
    // pushed below it to shrink the shuffle to true near-dups.
    bands.as("x").join(bands.as("y"), Seq("band", "bval"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("h"))
      .filter(col("h") <= maxHamming)
      .groupBy("i", "j")
      .agg(min(col("h")).as("hamming"))
  }

  val dedupSimhashNear = QueryDef(
    "dedup_simhash_near",
    // Oracle = brute-force hamming join over the md5-derived fingerprints
    // (fine at oracle scale; the gated Spark path stays the banded LSH
    // join, whose recall is structurally 1 at hamming ≤ 3 — pigeonhole —
    // so the relations are equal by construction, and EdgeSpec pins the
    // same equality on planted dups).
    s"""$simHashOracleCte
       |SELECT i, j, hamming FROM (
       |  SELECT x.doc_id AS i, y.doc_id AS j,
       |         CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
       |  FROM fp x JOIN fp y ON x.doc_id < y.doc_id
       |) WHERE hamming <= 3
       |ORDER BY i, j LIMIT 200""".stripMargin) { (s, d) =>
    simHashNearDup(Tables.documents(s, d))
      .select(col("i"), col("j"), col("hamming").cast("long").as("hamming"))
      .orderBy("i", "j")
      .limit(200)
  }

  val dedupSimhash = QueryDef(
    "dedup_simhash",
    s"""$simHashOracleCte
       |SELECT simhash, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keeper
       |FROM fp GROUP BY simhash
       |ORDER BY simhash LIMIT 200""".stripMargin) { (s, d) =>
    simHash(Tables.documents(s, d))
      .groupBy("simhash")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .orderBy("simhash")
      .limit(200)
  }

  /** Embedding-cosine near-duplicate pairs: cos ≥ threshold, i < j.
    * Exact, via the BLOCKED all-pairs kernel (Similarity.allPairsCos):
    * equi-join on block-pair keys, dense tile per task, no
    * BroadcastNestedLoopJoin. Exact is the right gated form here —
    * on this near-orthogonal embedding table LSH cannot beat it at the
    * 0.5 threshold without recall loss (see Similarity's scaladoc);
    * `Ann.lshNearDup` is the sub-quadratic path for real (high-cos)
    * near-dup corpora.
    */
  def embeddingNearDup(emb: DataFrame, threshold: Double): DataFrame = {
    val v = emb.select(col("vec_id"), Similarity.vecD(col("embedding")).as("ve"))
    val n = v.select(col("vec_id"), col("ve"), Similarity.l2norm(col("ve")).as("nrm"))
    Similarity.allPairsCos(n)
      .filter(col("cos_raw") >= threshold)
      .select(col("i"), col("j"), round(col("cos_raw"), 4).as("cos"))
  }

  val dedupEmbed = QueryDef(
    "dedup_embed",
    """WITH v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      |  FROM embeddings
      |), n AS (
      |  SELECT vec_id, ve, sqrt(list_dot_product(ve, ve)) AS nrm FROM v
      |)
      |SELECT i, j, round(cos_raw, 4) AS cos FROM (
      |  SELECT a.vec_id AS i, b.vec_id AS j,
      |         list_dot_product(a.ve, b.ve) / (a.nrm * b.nrm) AS cos_raw
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id
      |) WHERE cos_raw >= 0.5
      |ORDER BY i, j""".stripMargin) { (s, d) =>
    embeddingNearDup(Tables.embeddings(s, d), 0.5).orderBy("i", "j")
  }

  /** Rolling-hash window for content-defined boundaries: polynomial hash
    * of the 8 chars ending at position i (base 31, exact in a BIGINT —
    * max Σ 127·31⁷ < 2⁴⁰), boundary where H % 16 == 0. The oracle reads
    * chars with `ord(substr(...))` directly; the Spark side reads the
    * per-doc CODE ARRAY (`codes`, one ascii pass per char) because the
    * interpreted-HOF cost of 8 substr+ascii calls per position dominated
    * the whole key (measured 14.5 s → the array form + split parallelism
    * → sub-second). `ord` of an out-of-range substr is 0 in DuckDB;
    * element_at past the array end is null — the i < length guard keeps
    * both engines inside the window. */
  private def cdcPolyOracle: String =
    (0 to 7).map(j => s"CAST(ord(substr(text, i - ${7 - j}, 1)) AS BIGINT) * ${math.pow(31, 7 - j).toLong}")
      .mkString(" + ")
  /** The pre-Expression HOF formulation of the same polynomial, kept as
    * the independent reference CdcBoundariesSpec checks the native
    * rolling hash against. */
  private[graft] def cdcPolySpark: String =
    (0 to 7).map(j => s"CAST(element_at(codes, i - ${7 - j}) AS BIGINT) * ${math.pow(31, 7 - j).toLong}")
      .mkString(" + ")

  /** CONTENT-DEFINED CHUNKING over (doc_id, text): boundaries where the
    * rolling hash of the trailing 8-char window ≡ 0 (mod 16) — the
    * rsync/LBFS cut rule, giving ~16-char mean chunks whose positions
    * move WITH the content: an insertion early in a document shifts
    * every fixed-shingle window but only disturbs the one chunk it
    * lands in, so all other chunks still hash-match across versions.
    * Entirely a per-row ARRAY pipeline (filter → concat → transform on
    * the boundary list): zero shuffle until the chunk explode — the
    * whole chunker rides the scan stage at 100 TB. */
  def cdcChunks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      // a 100 TB corpus arrives in many splits and the per-row chunker
      // parallelizes naturally; the local single-file fixture collapses
      // the scan to ONE task (measured: the whole key serialized on one
      // core), so restore the multi-split shape explicitly — at scale
      // this repartition is dropped, not tuned
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      // native codegen rolling hash (graft.functions.CdcBoundaries):
      // one multiply-add per byte instead of 8 interpreted lambda
      // evaluations per position — CdcBoundariesSpec pins bit-equality
      // with the HOF formulation this replaced
      .withColumn("bpos", graft.functions.CdcBoundaries.boundaries(col("text")))
      .withColumn("bb",
        expr("concat(array(0), bpos, array(length(text)))"))
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(bb) - 1), k -> " +
          "substring(text, element_at(bb, k) + 1, element_at(bb, k + 1) - element_at(bb, k)))"))
          .as("chunk"))

  val dedupCdcChunks = QueryDef(
    "dedup_cdc_chunks",
    // Chunks under 8 chars are excluded from the report (the min-chunk
    // rule every CDC deployment applies — tiny chunks match incidentally
    // and carry no dedup value), expressed declaratively as a length
    // filter rather than stateful boundary suppression so both engines
    // stay pure array pipelines.
    s"""WITH b AS (
       |  SELECT doc_id, text,
       |    list_filter(range(8, length(text)), i -> ($cdcPolyOracle) % 16 = 0) AS bpos
       |  FROM documents
       |), ball AS (
       |  SELECT doc_id, text,
       |    list_concat(list_concat([CAST(0 AS BIGINT)], bpos),
       |                [CAST(length(text) AS BIGINT)]) AS bb
       |  FROM b
       |), ch AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(bb)), k ->
       |    substr(text, CAST(bb[k] AS INT) + 1, CAST(bb[k+1] - bb[k] AS INT)))) AS chunk
       |  FROM ball
       |)
       |SELECT md5(chunk) AS chunk_hash,
       |  CAST(min(length(chunk)) AS BIGINT) AS chunk_len,
       |  CAST(count(*) AS BIGINT) AS n_occ,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  min(doc_id) AS first_doc
       |FROM ch WHERE length(chunk) >= 8
       |GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY n_docs DESC, chunk_hash LIMIT 50""".stripMargin) { (s, d) =>
    cdcChunks(Tables.documents(s, d))
      .filter(length(col("chunk")) >= 8)
      .groupBy(md5(col("chunk")).as("chunk_hash"))
      .agg(min(length(col("chunk"))).cast("long").as("chunk_len"),
        count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("chunk_hash"))
      .limit(50)
  }

  /** BLOOM-GATED INCREMENTAL DEDUP — the constant-memory twin of
    * `dedup_incremental` (that key joins the increment against the full
    * base index; THIS carries only an m-bit filter of the base's
    * content hashes — the shape a long-running ingest keeps resident
    * when the base index no longer fits): every incoming doc probes two
    * md5-derived bits, hits fall through to the exact check (the
    * join_bloom candidate→verify discipline), and the gate pins the
    * whole ledger — bloom hits, true duplicates, FALSE POSITIVES (the
    * sketch's actual cost, deterministic md5 collisions both engines
    * reproduce) and the bit fill. m = 4096 on purpose: at sf0.1 the
    * base SATURATES the filter (~90% fill → most hits are false) and
    * the gated fill/false-positive numbers document the sizing law a
    * production filter must obey (m ∝ base size) instead of hiding it. */
  val dedupBloomIncremental = QueryDef(
    "dedup_bloom_incremental",
    """WITH base AS (
      |  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 10 <> 0
      |), bits AS (
      |  SELECT DISTINCT CAST('0x'||substr(md5(h),1,8) AS BIGINT) % 4096 AS b FROM base
      |  UNION
      |  SELECT DISTINCT CAST('0x'||substr(md5(h),9,8) AS BIGINT) % 4096 AS b FROM base
      |), incr AS (
      |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 10 = 0
      |), probed AS (
      |  SELECT i.doc_id, i.h,
      |    (CAST('0x'||substr(md5(i.h),1,8) AS BIGINT) % 4096 IN (SELECT b FROM bits)
      |     AND CAST('0x'||substr(md5(i.h),9,8) AS BIGINT) % 4096 IN (SELECT b FROM bits)) AS hit,
      |    EXISTS (SELECT 1 FROM base WHERE base.h = i.h) AS is_dup
      |  FROM incr i
      |)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_base_distinct,
      |  CAST(count(*) AS BIGINT) AS n_incr,
      |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
      |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_true_dups,
      |  CAST(sum(CASE WHEN hit AND NOT is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
      |  (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set
      |FROM probed""".stripMargin) { (s, d) =>
    val m = 4096
    val docs = Tables.documents(s, d)
    val isIncr = col("doc_id") % 10 === 0
    // base feeds FOUR consumers (both bit probes, the exact check, the
    // ledger count) — pin it so the corpus scan + distinct runs once,
    // not once per subtree (review finding)
    val base = docs.filter(!isIncr).select(md5(col("text")).as("h")).distinct()
      .localCheckpoint()
    val incr = docs.filter(isIncr).select(col("doc_id"), md5(col("text")).as("h"))
    def slice(c: Column, k: Int) =
      conv(substring(md5(c), 1 + 8 * k, 8), 16, 10).cast("long") % m
    val bits = base.select(explode(array(slice(col("h"), 0), slice(col("h"), 1))).as("b"))
      .distinct()
    val probed = incr
      .withColumn("h1", slice(col("h"), 0)).withColumn("h2", slice(col("h"), 1))
      .join(broadcast(bits.select(col("b").as("h1"), lit(true).as("p1"))), Seq("h1"), "left")
      .join(broadcast(bits.select(col("b").as("h2"), lit(true).as("p2"))), Seq("h2"), "left")
      .join(broadcast(base.select(col("h"), lit(true).as("in_base"))), Seq("h"), "left")
      .select(col("doc_id"),
        (coalesce(col("p1"), lit(false)) && coalesce(col("p2"), lit(false))).as("hit"),
        coalesce(col("in_base"), lit(false)).as("is_dup"))
    val nBase = base.agg(count(lit(1)).as("n_base_distinct"))
    val nBits = bits.agg(count(lit(1)).as("n_bits_set"))
    probed.agg(count(lit(1)).as("n_incr"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_bloom_hits"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_true_dups"),
        sum(when(col("hit") && !col("is_dup"), 1L).otherwise(0L)).as("n_false_pos"))
      .crossJoin(broadcast(nBase)).crossJoin(broadcast(nBits))
      .select(col("n_base_distinct"), col("n_incr"), col("n_bloom_hits"),
        col("n_true_dups"), col("n_false_pos"), col("n_bits_set"))
  }

  val all: Seq[QueryDef] = Seq(dedupMinhash, dedupSimhash, dedupSimhashNear, dedupEmbed,
    dedupMinhashRecall, dedupMinhashClusters, dedupCdcChunks, dedupBloomIncremental)
}
