package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.ops.Multimodal

/** Plumbing checks for the multimodal binary-column path: schema shape,
  * determinism of the decode stub, partition-level batching. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq((1L, "hello world", "en"), (2L, "more text", "en"))
    .toDF("doc_id", "text", "lang")

  test("payload column is BinaryType with 16-byte md5 payloads") {
    val p = Multimodal.withPayload(docs)
    assert(p.schema("payload").dataType == BinaryType)
    val lens = p.select("payload").as[Array[Byte]].collect().map(_.length).toSet
    assert(lens == Set(16))
  }

  test("decode stub is deterministic and emits typed metadata columns") {
    implicit val s = spark
    val once = Multimodal.decodeStub(Multimodal.withPayload(docs))
    assert(once.schema.fieldNames.toSeq ==
      Seq("doc_id", "width", "height", "fmt", "feat0"))
    assert(once.schema("width").dataType == IntegerType)
    assert(once.schema("fmt").dataType == StringType)
    val a = once.orderBy("doc_id").collect().toSeq
    val b = Multimodal.decodeStub(Multimodal.withPayload(docs))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    a.foreach { r =>
      val (w, h) = (r.getInt(1), r.getInt(2))
      assert(w >= 64 && w < 192 && h >= 64 && h < 192)
      assert(Set("jpeg", "png", "webp").contains(r.getString(3)))
    }
  }

  test("decode runs per-partition and preserves every row") {
    implicit val s = spark
    val many = (1L to 100L).map(i => (i, s"doc number $i", "en"))
      .toDF("doc_id", "text", "lang").repartition(7)
    val out = Multimodal.decodeStub(Multimodal.withPayload(many))
    assert(out.count() == 100)
    assert(out.select("doc_id").distinct().count() == 100)
  }
}
