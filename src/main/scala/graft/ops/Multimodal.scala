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

  val multimodalDecode = QueryDef.noOracle("multimodal_decode") { (s, d) =>
    // No oracle: the decode stub's byte arithmetic is not worth mirroring
    // in SQL — covered by MultimodalSpec (schema + determinism + planted
    // values). Joined back to documents to prove the metadata is a
    // first-class relational column.
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
