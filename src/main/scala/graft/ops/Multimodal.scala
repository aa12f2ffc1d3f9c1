package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (NORTH-STAR surface): opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted via a
  * partition-iterator transform — the Scala analog of a Pandas-UDF
  * `mapInPandas` stage.
  *
  * The actual image/audio decode is STUBBED (no codec libraries in this
  * environment): `decodeStub` derives deterministic fake
  * width/height/format/features from the payload bytes. Everything around
  * it — the binary column, the schema, the per-partition batch iteration,
  * the downstream relational joins — is real and is what matters at
  * scale: payloads stay opaque byte arrays end-to-end (no row-by-row JVM
  * object churn), decode parallelism is partition-level, and metadata
  * lands in ordinary columns Catalyst can prune and filter on.
  */
object Multimodal {

  /** Attach a deterministic synthetic binary payload per document (md5 of
    * the text, as 16 raw bytes) — the stand-in for a real image/audio
    * blob column read from storage. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), unhex(md5(col("text"))).as("payload"))

  /** Decoded-media metadata row. */
  case class MediaMeta(doc_id: Long, width: Int, height: Int, fmt: String, feat0: Double)

  /** Partition-iterator decode stub: real decoders (JPEG/PNG/audio frames)
    * would run here, batched per partition; the fake derives metadata from
    * the payload bytes deterministically. ??? → replace with codec calls.
    */
  def decodeStub(payloads: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          val w = 64 + (b(0) & 0x7f)
          val h = 64 + (b(1) & 0x7f)
          val fmt = (b(2) & 0xff) % 3 match {
            case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
          }
          // fake feature: first payload byte scaled to [0,1), 4dp
          val feat0 = math.round(((b(3) & 0xff) / 256.0) * 10000.0) / 10000.0
          MediaMeta(id, w, h, fmt, feat0)
        }
      }.toDF()
  }

  val multimodalDecode = QueryDef(
    "multimodal_decode",
    // Oracle: the payload is unhex(md5(text)), so byte k of the blob IS
    // hex chars 2k+1..2k+2 of md5(text) — DuckDB recomputes the stub's
    // byte arithmetic from the hex string (md5 is bit-identical across
    // engines). b % 128 == b & 0x7f and b % 3 match the stub's masks
    // because the hex parse yields the UNSIGNED byte value (the Scala
    // side masks its signed bytes with & 0xff / & 0x7f for the same
    // reason). feat0: k/256.0 is an exact binary double, and both
    // engines round half away from zero for positives, so round(·, 4)
    // equals the stub's math.round(x * 10000) / 10000. The mapPartitions
    // iterator stays the Spark-side decode surface — the oracle checks
    // its OUTPUT, proving the plumbing end-to-end.
    """WITH b AS (
      |  SELECT doc_id, lang,
      |    CAST('0x' || substr(md5(text), 1, 2) AS INTEGER) AS b0,
      |    CAST('0x' || substr(md5(text), 3, 2) AS INTEGER) AS b1,
      |    CAST('0x' || substr(md5(text), 5, 2) AS INTEGER) AS b2,
      |    CAST('0x' || substr(md5(text), 7, 2) AS INTEGER) AS b3
      |  FROM documents
      |)
      |SELECT doc_id, lang,
      |  64 + (b0 % 128) AS width,
      |  64 + (b1 % 128) AS height,
      |  CASE b2 % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS fmt,
      |  round(b3 / 256.0, 4) AS feat0
      |FROM b ORDER BY doc_id LIMIT 200""".stripMargin) { (s, d) =>
    implicit val spark: SparkSession = s
    val docs = Tables.documents(s, d)
    decodeStub(withPayload(docs))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("width"), col("height"),
        col("fmt"), col("feat0"))
      .orderBy("doc_id")
      .limit(200)
  }

  val all: Seq[QueryDef] = Seq(multimodalDecode)
}
